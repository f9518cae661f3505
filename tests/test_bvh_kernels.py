"""Packet-BVH Pallas kernels validated in interpreter mode against the
jnp traversal / brute-force paths (ray.rs:114-266 semantics:
near-child-first ordering, any-hit early-out)."""

import numpy as np
import jax.numpy as jnp

import pytest

from strolle_tpu.bvh.builder import build_bvh_numpy
from strolle_tpu.ops.hit import surface_at
from strolle_tpu.ops.pallas.bvh_kernels import (
    bvh_trace_anyhit_pallas,
    bvh_trace_surface_pallas,
    pack_nodes,
)
from strolle_tpu.ops.pallas.trace_kernels import pack_geometry
from strolle_tpu.ops.trace import trace_anyhit_brute, trace_closest_brute
from strolle_tpu.scene.types import Scene, make_lights, make_materials


def _soup_scene(n_tris=900, seed=7):
    """Random triangle soup with a built BVH, geometry in BVH order."""
    rs = np.random.RandomState(seed)
    centers = rs.uniform(-4.0, 4.0, (n_tris, 1, 3)).astype(np.float32)
    verts = centers + rs.uniform(-0.35, 0.35, (n_tris, 3, 3)).astype(
        np.float32
    )
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    normals = np.repeat(n[:, None, :], 3, axis=1)
    uvs = rs.uniform(0, 1, (n_tris, 3, 2)).astype(np.float32)
    mids = rs.randint(0, 3, n_tris).astype(np.int32)

    arrays, order = build_bvh_numpy(verts)
    from strolle_tpu.scene.types import Geometry

    geom = Geometry(
        positions=verts[order],
        normals=normals[order],
        uvs=uvs[order],
        tangents=np.zeros((n_tris, 3, 4), np.float32),
        material_id=mids[order],
    )
    mats = make_materials([{}, {}, {}])
    return Scene(
        geometry=geom,
        materials=mats,
        lights=make_lights([]),
        atlas=None,
        sun_azimuth=jnp.asarray(0.0, jnp.float32),
        sun_altitude=jnp.asarray(-1.0, jnp.float32),
        bvh=arrays,
    )


def _rays(n, seed=0, spread=6.0):
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(-spread, spread, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def _packed(scene):
    rows = pack_geometry(scene.geometry)
    pad = (-rows.shape[0]) % 8
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, 28), rows.dtype)])
    return pack_nodes(scene.bvh), rows


@pytest.fixture(scope="module")
def soup():
    return _soup_scene()


def test_bvh_surface_kernel_matches_brute(soup):
    node_rows, geom_rows = _packed(soup)
    o, d = _rays(600, seed=1)
    out = bvh_trace_surface_pallas(node_rows, geom_rows, o, d, interpret=True)

    ref = trace_closest_brute(soup, o, d)
    surf = surface_at(soup, o, d, ref)
    some = np.asarray(ref.is_some)
    assert (np.asarray(out["hit"]) == some).all()
    assert (np.asarray(out["tri"])[some] == np.asarray(ref.tri)[some]).all()
    assert np.allclose(
        np.asarray(out["t"])[some], np.asarray(ref.t)[some], atol=1e-3
    )
    assert np.allclose(
        np.asarray(out["normal"])[some],
        np.asarray(surf.normal)[some],
        atol=1e-3,
    )
    assert np.allclose(
        np.asarray(out["uv"])[some], np.asarray(surf.uv)[some], atol=1e-3
    )
    assert (
        np.asarray(out["mat_id"])[some]
        == np.asarray(surf.material_id)[some]
    ).all()


def test_bvh_surface_kernel_matches_jnp_traversal(soup):
    from strolle_tpu.bvh.traverse import trace_closest_bvh

    node_rows, geom_rows = _packed(soup)
    o, d = _rays(400, seed=5)
    out = bvh_trace_surface_pallas(node_rows, geom_rows, o, d, interpret=True)
    ref = trace_closest_bvh(soup, o, d)
    some = np.asarray(ref.is_some)
    assert (np.asarray(out["hit"]) == some).all()
    assert (np.asarray(out["tri"])[some] == np.asarray(ref.tri)[some]).all()
    assert np.allclose(
        np.asarray(out["t"])[some], np.asarray(ref.t)[some], atol=1e-3
    )


def test_bvh_anyhit_kernel_matches_brute(soup):
    node_rows, geom_rows = _packed(soup)
    o, d = _rays(600, seed=2)
    t_max = jnp.full((600,), 3.0, jnp.float32)
    ref = trace_anyhit_brute(soup, o, d, t_max)
    occ = bvh_trace_anyhit_pallas(
        node_rows, geom_rows, o, d, t_max, interpret=True
    )
    assert (np.asarray(occ) == np.asarray(ref)).all()


def test_bvh_anyhit_zero_tmax_never_occludes(soup):
    node_rows, geom_rows = _packed(soup)
    o, d = _rays(128, seed=3)
    t_max = jnp.zeros((128,), jnp.float32)
    occ = bvh_trace_anyhit_pallas(
        node_rows, geom_rows, o, d, t_max, interpret=True
    )
    assert not np.asarray(occ).any()
