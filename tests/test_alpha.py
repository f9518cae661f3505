"""Alpha-tested transparency in traversal (ray.rs:212-229 semantics:
a hit on an AlphaMode::Blend material with sampled base-color alpha < 1
does not count — closest-hit skips past it, shadow rays pass through)."""

import numpy as np
import jax.numpy as jnp

from strolle_tpu.ops.trace import trace_anyhit, trace_closest, trace_surface
from strolle_tpu.scene.build import MeshBuilder
from strolle_tpu.scene.types import Scene, make_lights, make_materials


def _two_pane_scene(alpha: float, blend: int) -> Scene:
    """Pane A at z=0 (material 0, alpha configurable), pane B at z=-2
    (material 1, opaque). Camera rays fly along -z."""
    b = MeshBuilder()
    b.add_quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0], 0)
    b.add_quad([-1, -1, -2], [1, -1, -2], [1, 1, -2], [-1, 1, -2], 1)
    mats = [
        {"base_color": [1.0, 1.0, 1.0, alpha], "alpha_blend": blend},
        {"base_color": [0.5, 0.5, 0.5, 1.0]},
    ]
    return Scene(
        geometry=b.build(),
        materials=make_materials(mats),
        lights=make_lights([]),
        atlas=None,
        sun_azimuth=jnp.asarray(0.0, jnp.float32),
        sun_altitude=jnp.asarray(-1.0, jnp.float32),
        has_alpha=bool(blend),
    )


_O = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
_D = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)


def test_opaque_pane_blocks():
    scene = _two_pane_scene(alpha=1.0, blend=0)
    hit = trace_closest(scene, _O, _D)
    assert np.isclose(float(hit.t[0]), 1.0, atol=1e-5)
    assert bool(trace_anyhit(scene, _O, _D, jnp.asarray([10.0]))[0])


def test_transparent_pane_skipped_closest():
    scene = _two_pane_scene(alpha=0.25, blend=1)
    hit = trace_closest(scene, _O, _D)
    # ray skips the alpha pane (z=0) and lands on the opaque one (z=-2)
    assert np.isclose(float(hit.t[0]), 3.0, atol=1e-3)
    surf = trace_surface(scene, _O, _D)
    assert np.allclose(np.asarray(surf.base_color[0, :3]), 0.5, atol=1e-5)


def test_blend_material_with_full_alpha_still_hits():
    scene = _two_pane_scene(alpha=1.0, blend=1)
    hit = trace_closest(scene, _O, _D)
    assert np.isclose(float(hit.t[0]), 1.0, atol=1e-5)


def test_transparent_pane_does_not_occlude():
    scene = _two_pane_scene(alpha=0.25, blend=1)
    # shadow ray stopping before the far pane: only the alpha pane is in
    # range and it doesn't occlude
    assert not bool(trace_anyhit(scene, _O, _D, jnp.asarray([2.0]))[0])
    # longer ray reaches the opaque pane
    assert bool(trace_anyhit(scene, _O, _D, jnp.asarray([10.0]))[0])


def test_miss_behind_transparent():
    b = MeshBuilder()
    b.add_quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0], 0)
    scene = Scene(
        geometry=b.build(),
        materials=make_materials([{"base_color": [1, 1, 1, 0.0], "alpha_blend": 1}]),
        lights=make_lights([]),
        atlas=None,
        sun_azimuth=jnp.asarray(0.0, jnp.float32),
        sun_altitude=jnp.asarray(-1.0, jnp.float32),
        has_alpha=True,
    )
    hit = trace_closest(scene, _O, _D)
    assert not bool(hit.is_some[0])
    assert not bool(trace_anyhit(scene, _O, _D, jnp.asarray([10.0]))[0])


def _alpha_soup_scene(n_tris: int = 3072, alpha_frac: float = 0.25) -> Scene:
    """Random soup with a fraction of triangles on an AlphaMode::Blend
    material (alpha 0.3 -> never occludes, skipped by closest-hit)."""
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.scene.types import Geometry

    rs = np.random.RandomState(23)
    centers = rs.uniform(-3.0, 3.0, (n_tris, 1, 3)).astype(np.float32)
    verts = centers + rs.uniform(-0.4, 0.4, (n_tris, 3, 3)).astype(np.float32)
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    mid = (rs.uniform(0, 1, n_tris) < alpha_frac).astype(np.int32)
    geom = Geometry(
        positions=verts,
        normals=np.repeat(n[:, None, :], 3, axis=1),
        uvs=np.zeros((n_tris, 3, 2), np.float32),
        tangents=np.zeros((n_tris, 3, 4), np.float32),
        material_id=mid,
    )
    mats = [
        {"base_color": [0.8, 0.8, 0.8, 1.0]},
        {"base_color": [1.0, 1.0, 1.0, 0.3], "alpha_blend": 1},
    ]
    return scene_with_bvh(
        Scene(
            geometry=geom,
            materials=make_materials(mats),
            lights=make_lights([]),
            atlas=None,
            sun_azimuth=jnp.asarray(0.0, jnp.float32),
            sun_altitude=jnp.asarray(-1.0, jnp.float32),
            has_alpha=True,
        )
    )


def _soup_rays(n=512, seed=3):
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def test_alpha_big_scene_restart_loop(monkeypatch):
    """Alpha restart loop x the BIG-scene trace path (VERDICT r3: the
    alpha x big-scene combination was never exercised). The brute gate
    is lowered so the soup takes the BVH/stream dispatch; results must
    match the small-scene (brute) alpha semantics exactly."""
    import strolle_tpu.ops.trace as T

    scene = _alpha_soup_scene()
    o, d = _soup_rays()

    ref = T.trace_closest(scene, o, d)  # small path: brute + restarts

    monkeypatch.setattr(T, "BRUTE_FORCE_MAX_TRIS", 512)
    big = T.trace_closest(scene, o, d)  # big path: traversal + restarts
    agree = (np.asarray(ref.tri) == np.asarray(big.tri)).mean()
    assert agree > 0.99, f"tri agreement {agree}"
    m = np.asarray(ref.tri) >= 0
    np.testing.assert_allclose(
        np.asarray(big.t)[m], np.asarray(ref.t)[m], rtol=1e-3, atol=1e-3
    )

    occ_ref = T.trace_anyhit(scene, o, d, jnp.full(o.shape[:-1], 2.0))
    occ_big = T.trace_anyhit(scene, o, d, jnp.full(o.shape[:-1], 2.0))
    assert (np.asarray(occ_ref) == np.asarray(occ_big)).mean() > 0.99


def test_alpha_big_scene_stream_kernel_interpret(monkeypatch):
    """Same combination through the STREAM Pallas kernels (interpret
    mode): the production large-scene path with has_alpha restarts."""
    import strolle_tpu.ops.trace as T

    scene = _alpha_soup_scene(n_tris=1536)
    o, d = _soup_rays(n=256, seed=9)

    ref = T.trace_closest(scene, o, d)

    monkeypatch.setattr(T, "BRUTE_FORCE_MAX_TRIS", 512)
    monkeypatch.setenv("STROLLE_PALLAS_INTERPRET", "1")
    assert T._pallas_available()
    big = T.trace_closest(scene, o, d)
    agree = (np.asarray(ref.tri) == np.asarray(big.tri)).mean()
    assert agree > 0.99, f"tri agreement {agree}"
