"""Cluster-culled brute kernels (ops/pallas/cluster_kernels.py)
validated in interpreter mode against the dense brute-force path, plus
clusterize_bvh invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from strolle_tpu.ops.pallas.cluster_kernels import (
    CLUSTER_TRIS,
    cluster_trace_anyhit_pallas,
    cluster_trace_surface_pallas,
    clusterize_bvh,
    num_clusters,
)
from strolle_tpu.ops.trace import trace_anyhit_brute, trace_closest_brute
from tests.test_bvh_kernels import _packed, _rays, _soup_scene


@pytest.fixture(scope="module")
def soup():
    # >1 cluster: exercise the culling loop, not just the inner loop
    return _soup_scene(n_tris=CLUSTER_TRIS * 3 + 57)


@pytest.fixture(scope="module")
def clustered(soup):
    _, rows = _packed(soup)
    clus = clusterize_bvh(soup.bvh, soup.geometry.num_triangles)
    return clus, rows


def test_clusterize_covers_all_rows(soup, clustered):
    clus, _ = clustered
    t = soup.geometry.num_triangles
    assert clus.shape == (num_clusters(t), 8)
    first = np.asarray(clus[:, 6]).astype(np.int64)
    count = np.asarray(clus[:, 7]).astype(np.int64)
    covered = np.zeros(t, bool)
    for f, c in zip(first, count):
        covered[f : f + c] = True
    assert covered.all(), "every triangle row must belong to a cluster"
    # ranges stay in-bounds
    assert (first >= 0).all() and (first + count <= t).all()


def test_cluster_aabbs_contain_their_triangles(soup, clustered):
    clus, _ = clustered
    pos = np.asarray(soup.geometry.positions)  # BVH order
    for k in range(clus.shape[0]):
        f = int(clus[k, 6])
        c = int(clus[k, 7])
        if c == 0:
            continue
        tri = pos[f : f + c].reshape(-1, 3)
        np.testing.assert_array_less(np.asarray(clus[k, 0:3]) - 1e-4, tri.min(0))
        np.testing.assert_array_less(tri.max(0), np.asarray(clus[k, 3:6]) + 1e-4)


def test_cluster_surface_matches_brute(soup, clustered):
    clus, rows = clustered
    o, d = _rays(700, seed=3)
    ref = trace_closest_brute(soup, o, d)
    out = cluster_trace_surface_pallas(clus, rows, o, d, interpret=True)

    np.testing.assert_array_equal(np.asarray(out["hit"]), np.asarray(ref.tri >= 0))
    m = np.asarray(ref.tri >= 0)
    np.testing.assert_allclose(
        np.asarray(out["t"])[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out["tri"])[m], np.asarray(ref.tri)[m]
    )
    # attribute resolve: material ids follow the winning triangle
    mid = np.asarray(soup.geometry.material_id)[np.asarray(ref.tri)[m]]
    np.testing.assert_array_equal(np.asarray(out["mat_id"])[m], mid)


def test_cluster_surface_normals_unit_and_facing(soup, clustered):
    clus, rows = clustered
    o, d = _rays(300, seed=11)
    out = cluster_trace_surface_pallas(clus, rows, o, d, interpret=True)
    m = np.asarray(out["hit"])
    n = np.asarray(out["normal"])[m]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    # two-sided flip: normal faces against the ray
    dd = np.asarray(d)[m]
    assert ((n * dd).sum(-1) <= 1e-4).all()


def test_cluster_anyhit_matches_brute(soup, clustered):
    clus, rows = clustered
    o, d = _rays(700, seed=5)
    t_max = jnp.full(o.shape[:-1], 4.0, jnp.float32)
    ref = trace_anyhit_brute(soup, o, d, t_max)
    out = cluster_trace_anyhit_pallas(clus, rows, o, d, t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cluster_anyhit_zero_tmax_never_occludes(soup, clustered):
    clus, rows = clustered
    o, d = _rays(100, seed=9)
    out = cluster_trace_anyhit_pallas(
        clus, rows, o, d, jnp.zeros(o.shape[:-1], jnp.float32), interpret=True
    )
    assert not np.asarray(out).any()


def test_trace_surface_dispatches_cluster_path(soup):
    """End-to-end: a big-scene trace through ops.trace on the CPU
    backend (pallas interpret unavailable -> jnp fallback) must agree
    with the cluster kernel output in interpret mode."""
    import strolle_tpu.ops.trace as T

    o, d = _rays(256, seed=13)
    old = T.BRUTE_FORCE_MAX_TRIS
    T.BRUTE_FORCE_MAX_TRIS = 64  # force the big-scene branch
    try:
        surf = T.trace_surface(soup, o, d, use_pallas=False)
    finally:
        T.BRUTE_FORCE_MAX_TRIS = old
    _, rows = _packed(soup)
    clus = clusterize_bvh(soup.bvh, soup.geometry.num_triangles)
    out = cluster_trace_surface_pallas(clus, rows, o, d, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(surf.is_some), np.asarray(out["hit"])
    )
    m = np.asarray(surf.is_some)
    np.testing.assert_allclose(
        np.asarray(surf.depth)[m], np.asarray(out["t"])[m], rtol=1e-4,
        atol=1e-5,
    )
