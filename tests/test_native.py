"""Tests for the C++ host runtime (native/strolle_native.cpp).

The native BVH builder must produce a valid tree with the exact layout
contract of the numpy builder (bvh/builder.py), and traversal through
it must agree with brute force. Allocator semantics mirror
strolle/src/utils/allocator.rs (first-fit over the free list in
insertion order, merge on compaction); the atlas allocator mirrors the
guillotine behavior of images.rs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from strolle_tpu import native
from strolle_tpu.bvh.builder import BvhArrays, build_bvh, build_bvh_numpy
from strolle_tpu.bvh.traverse import trace_closest_bvh
from strolle_tpu.ops.trace import trace_closest_brute
from strolle_tpu.scene.cornell import cornell_box

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _soup(t, seed=0):
    rs = np.random.RandomState(seed)
    return (
        rs.uniform(-5, 5, size=(t, 1, 3)) + rs.uniform(-0.4, 0.4, size=(t, 3, 3))
    ).astype(np.float32)


def _check_valid(pos, cmin, cmax, child, count, order):
    t = pos.shape[0]
    assert sorted(order.tolist()) == list(range(t))
    covered = np.zeros(t, bool)
    p2 = pos[order]
    for n in range(child.shape[0]):
        for k in range(2):
            if child[n, k] < 0 and count[n, k] > 0:
                f = -(child[n, k] + 1)
                c = count[n, k]
                assert not covered[f : f + c].any()
                covered[f : f + c] = True
                tr = p2[f : f + c].reshape(-1, 3)
                assert (tr >= cmin[n, k] - 1e-4).all()
                assert (tr <= cmax[n, k] + 1e-4).all()
    assert covered.all()
    assert count.max() <= 8


@pytest.mark.parametrize("t", [1, 2, 7, 64, 1000])
def test_native_build_valid(t):
    pos = _soup(t, seed=t)
    out = native.bvh_build(pos)
    assert out is not None
    cmin, cmax, child, count, order, depth = out
    _check_valid(pos, cmin, cmax, child, count, order)
    assert depth >= 2


def test_native_traversal_matches_brute():
    scene = cornell_box()
    pos = np.asarray(scene.geometry.positions)
    arrays, order = build_bvh(pos, backend="native")
    geom = scene.geometry
    o = jnp.asarray(order)
    geom = geom.replace(
        positions=geom.positions[o],
        normals=geom.normals[o],
        uvs=geom.uvs[o],
        tangents=geom.tangents[o],
        material_id=geom.material_id[o],
    )
    scene = scene.replace(geometry=geom, bvh=arrays)

    rs = np.random.RandomState(3)
    ro = jnp.asarray(rs.uniform(-2, 2, size=(256, 3)).astype(np.float32))
    rd = rs.normal(size=(256, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)

    brute = trace_closest_brute(scene, ro, rd)
    bvh = trace_closest_bvh(scene, ro, rd)
    np.testing.assert_array_equal(np.asarray(brute.tri), np.asarray(bvh.tri))
    np.testing.assert_allclose(
        np.asarray(brute.t), np.asarray(bvh.t), rtol=1e-5, atol=1e-5
    )


def test_native_sah_quality_close_to_numpy():
    """The native tree's SAH cost should be within 2x of the numpy
    builder's (same algorithm, different tie-breaking)."""
    from strolle_tpu.bvh.builder import sah_cost

    pos = _soup(2000, seed=9)
    nat, _ = build_bvh(pos, backend="native")
    ref, _ = build_bvh_numpy(pos)
    assert sah_cost(nat) < 2.0 * sah_cost(ref) + 1e-6


def test_refit_contains_moved_triangles():
    pos = _soup(500, seed=4)
    out = native.bvh_build(pos)
    cmin, cmax, child, count, order, _ = out
    moved = pos[order] * 1.1 + np.float32([0.3, -1.0, 0.7])
    assert native.bvh_refit(moved, cmin, cmax, child, count)
    _check_valid(
        moved, cmin, cmax, child, count, np.arange(len(moved), dtype=np.int64)
    )


def test_range_allocator():
    a = native.RangeAllocator()
    assert a.take(1) is None  # empty
    a.give(0, 100)
    assert a.take(30) == 0
    assert a.take(30) == 30
    a.give(0, 30)
    # first fit scans free ranges in insertion order (allocator.rs)
    assert a.take(10) == 60
    assert a.take(50) is None  # 30 recycled + 30 tail, not contiguous
    a.give(30, 30)
    # compaction merges 0..30 + 30..60 into 0..60
    assert a.take(50) == 0
    assert a.num_free_ranges() >= 1


def test_atlas_allocator_disjoint():
    at = native.AtlasAllocator(256, 256)
    rects = []
    rs = np.random.RandomState(0)
    grid = np.zeros((256, 256), np.int32)
    for i in range(40):
        w, h = rs.randint(8, 48, size=2)
        r = at.alloc(int(w), int(h))
        if r is None:
            continue
        x, y = r
        assert x + w <= 256 and y + h <= 256
        grid[y : y + h, x : x + w] += 1
        rects.append((x, y, int(w), int(h)))
    assert len(rects) > 20
    assert grid.max() == 1  # no overlap


def test_atlas_full():
    at = native.AtlasAllocator(64, 64)
    assert at.alloc(65, 1) is None
    assert at.alloc(64, 64) == (0, 0)
    assert at.alloc(1, 1) is None


def test_transform_triangles_matches_numpy():
    rs = np.random.RandomState(1)
    p = rs.uniform(-1, 1, (64, 3, 3)).astype(np.float32)
    n = rs.normal(size=(64, 3, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    m = np.eye(4, dtype=np.float32)
    # nonuniform scale + rotation + translation
    th = 0.7
    rot = np.asarray(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    m[:3, :3] = rot @ np.diag([2.0, 0.5, 1.0]).astype(np.float32)
    m[:3, 3] = [1, -2, 3]
    p2, n2 = native.transform_triangles(p, n, m)
    exp_p = p @ m[:3, :3].T + m[:3, 3]
    nm = np.linalg.inv(m[:3, :3]).T
    exp_n = n @ nm.T
    exp_n /= np.linalg.norm(exp_n, axis=-1, keepdims=True)
    np.testing.assert_allclose(p2, exp_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(n2, exp_n, rtol=1e-4, atol=1e-4)


def test_build_bvh_dispatcher_returns_bvharrays():
    pos = _soup(100)
    arrays, order = build_bvh(pos)
    assert isinstance(arrays, BvhArrays)
    assert arrays.child.shape[0] == arrays.child_min.shape[0]


def test_incremental_build_reuses_subtrees():
    """Subtree-hash ghost reuse (builder.rs:204-279): rebuilding after a
    partial change copies unchanged subtrees, and the reused tree is
    exactly as valid as a fresh one."""
    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rs = np.random.RandomState(11)
    # big static cluster near the origin + a small far-away cluster
    stat = rs.uniform(-2, 2, (600, 1, 3)).astype(np.float32) + rs.uniform(
        -0.2, 0.2, (600, 3, 3)
    ).astype(np.float32)
    dyn0 = (rs.uniform(-0.5, 0.5, (24, 3, 3)) + [20, 0, 0]).astype(np.float32)
    dyn1 = (rs.uniform(-0.5, 0.5, (24, 3, 3)) + [20, 3, 0]).astype(np.float32)

    ctx = native.BvhContext()
    out0 = ctx.build(np.concatenate([stat, dyn0]))
    assert out0 is not None
    assert ctx.last_reused == 0  # first build: nothing to reuse

    pos1 = np.concatenate([stat, dyn1])
    out1 = ctx.build(pos1)
    assert out1 is not None
    assert ctx.last_reused > 50, ctx.last_reused  # static cluster copied

    # the reused tree must be valid: every leaf box contains its tris
    cmin, cmax, child, count, order, _ = out1
    reordered = pos1[order]
    _check_valid(reordered, cmin, cmax, child, count,
                 np.arange(len(reordered), dtype=np.int64))

    # and identical trace results vs a context-free fresh build
    from strolle_tpu.bvh.builder import BvhArrays
    from strolle_tpu.bvh.traverse import trace_closest_bvh
    from strolle_tpu.scene.types import Scene, make_lights, make_materials
    from strolle_tpu.scene.types import Geometry
    import jax.numpy as jnp

    def scene_of(arrs, ordr):
        geom = Geometry(
            positions=pos1[ordr],
            normals=np.zeros_like(pos1),
            uvs=np.zeros((len(pos1), 3, 2), np.float32),
            tangents=np.zeros((len(pos1), 3, 4), np.float32),
            material_id=np.zeros(len(pos1), np.int32),
        )
        return Scene(
            geometry=geom, materials=make_materials([{}]),
            lights=make_lights([]), atlas=None,
            sun_azimuth=jnp.asarray(0.0, jnp.float32),
            sun_altitude=jnp.asarray(-1.0, jnp.float32),
            bvh=BvhArrays(
                child_min=arrs[0], child_max=arrs[1], child=arrs[2],
                child_count=arrs[3], max_depth=max(arrs[5], 48),
            ),
        )

    fresh = native.bvh_build(pos1)
    sc_inc = scene_of(out1, order)
    sc_fresh = scene_of(fresh, fresh[4])

    rs2 = np.random.RandomState(3)
    o = jnp.asarray(rs2.uniform(-3, 3, (128, 3)).astype(np.float32))
    d = rs2.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    h_inc = trace_closest_bvh(sc_inc, o, d)
    h_fresh = trace_closest_bvh(sc_fresh, o, d)
    ti = np.where(np.isfinite(np.asarray(h_inc.t)), np.asarray(h_inc.t), 1e30)
    tf = np.where(
        np.isfinite(np.asarray(h_fresh.t)), np.asarray(h_fresh.t), 1e30
    )
    assert np.allclose(ti, tf, atol=1e-4)
