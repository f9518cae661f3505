"""HBM-streaming cluster kernels (ops/pallas/stream_kernels.py):
interpret-mode equivalence vs brute force, plus conservativeness of
the XLA-side interval culling."""

import numpy as np
import jax.numpy as jnp
import pytest

from strolle_tpu.ops.pallas.cluster_kernels import CLUSTER_TRIS, clusterize_bvh
from strolle_tpu.ops.pallas.stream_kernels import (
    S_TILE,
    _tile,
    cull_lists,
    stream_trace_anyhit_pallas,
    stream_trace_surface_pallas,
)
from strolle_tpu.ops.trace import trace_anyhit_brute, trace_closest_brute
from tests.test_bvh_kernels import _packed, _rays, _soup_scene


@pytest.fixture(scope="module")
def soup():
    return _soup_scene(n_tris=CLUSTER_TRIS * 3 + 57)


@pytest.fixture(scope="module")
def clustered(soup):
    _, rows = _packed(soup)
    clus = clusterize_bvh(
        soup.bvh, soup.geometry.num_triangles,
        jnp.asarray(soup.geometry.positions),
    )
    return clus, rows


def test_cull_lists_conservative(soup, clustered):
    """Every cluster containing some ray's true closest hit must appear
    in that ray's tile list (false negatives would corrupt results)."""
    clus, _ = clustered
    o, d = _rays(S_TILE, seed=21)  # exactly one tile
    _, _, g, comps = _tile(o, d)
    idx, counts, tmins = cull_lists(clus, comps[0:3], comps[3:6], g)
    assert g == 1
    listed = set(np.asarray(idx[0][: int(counts[0])]).tolist())
    # the entered prefix is front-to-back ordered (early termination
    # relies on tmins being sorted ascending over the entered clusters)
    tm = np.asarray(tmins[0][: int(counts[0])])
    assert (np.diff(tm) >= 0).all()

    ref = trace_closest_brute(soup, o, d)
    tri = np.asarray(ref.tri)
    first = np.asarray(clus[:, 6]).astype(np.int64)
    count = np.asarray(clus[:, 7]).astype(np.int64)
    for t in tri[tri >= 0]:
        k = int(np.searchsorted(first, t, side="right") - 1)
        assert first[k] <= t < first[k] + count[k]
        assert k in listed, f"cluster {k} holding hit tri {t} was culled"


def test_cull_lists_do_cull_for_coherent_tiles(soup, clustered):
    """Rays pointing away from the scene must cull every cluster; a
    tight beam must not enter more clusters than a diverging set."""
    clus, _ = clustered
    n = S_TILE
    o = jnp.tile(jnp.asarray([[8.0, 0.1, 0.1]], jnp.float32), (n, 1))
    d_away = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    _, _, g, comps = _tile(o, d_away)
    _, counts, _ = cull_lists(clus, comps[0:3], comps[3:6], g)
    assert int(counts[0]) == 0


def test_stream_surface_matches_brute(soup, clustered):
    clus, rows = clustered
    o, d = _rays(700, seed=3)
    ref = trace_closest_brute(soup, o, d)
    out = stream_trace_surface_pallas(clus, rows, o, d, interpret=True)

    np.testing.assert_array_equal(
        np.asarray(out["hit"]), np.asarray(ref.tri >= 0)
    )
    m = np.asarray(ref.tri >= 0)
    np.testing.assert_allclose(
        np.asarray(out["t"])[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out["tri"])[m], np.asarray(ref.tri)[m]
    )
    np.testing.assert_allclose(
        np.asarray(out["u"])[m], np.asarray(ref.u)[m], rtol=1e-3, atol=1e-5
    )


def test_stream_anyhit_matches_brute(soup, clustered):
    clus, rows = clustered
    o, d = _rays(700, seed=5)
    t_max = jnp.full(o.shape[:-1], 4.0, jnp.float32)
    ref = trace_anyhit_brute(soup, o, d, t_max)
    out = stream_trace_anyhit_pallas(clus, rows, o, d, t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stream_anyhit_zero_tmax(soup, clustered):
    clus, rows = clustered
    o, d = _rays(64, seed=9)
    out = stream_trace_anyhit_pallas(
        clus, rows, o, d, jnp.zeros(o.shape[:-1], jnp.float32), interpret=True
    )
    assert not np.asarray(out).any()
