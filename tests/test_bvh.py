import numpy as np
import jax.numpy as jnp

from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.bvh.builder import build_bvh
from strolle_tpu.bvh.traverse import trace_anyhit_bvh, trace_closest_bvh
from strolle_tpu.ops.trace import trace_anyhit_brute, trace_closest_brute
from strolle_tpu.scene.cornell import cornell_box


def _random_rays(n, seed=0, spread=3.0):
    rs = np.random.RandomState(seed)
    o = rs.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_build_shapes_and_partition():
    scene = cornell_box()
    arrays, order = build_bvh(np.asarray(scene.geometry.positions))
    t = scene.geometry.num_triangles
    # order is a permutation
    assert sorted(order.tolist()) == list(range(t))
    # every triangle appears in exactly one leaf range
    child = np.asarray(arrays.child)
    count = np.asarray(arrays.child_count)
    covered = np.zeros(t, bool)
    for n in range(arrays.num_nodes):
        for k in range(2):
            if child[n, k] < 0:
                first = -(child[n, k] + 1)
                cnt = count[n, k]
                assert not covered[first : first + cnt].any()
                covered[first : first + cnt] = True
    assert covered.all()


def test_child_bounds_contain_triangles():
    scene = cornell_box()
    arrays, order = build_bvh(np.asarray(scene.geometry.positions))
    pos = np.asarray(scene.geometry.positions)[order]
    child = np.asarray(arrays.child)
    count = np.asarray(arrays.child_count)
    cmin = np.asarray(arrays.child_min)
    cmax = np.asarray(arrays.child_max)
    for n in range(arrays.num_nodes):
        for k in range(2):
            if child[n, k] < 0 and count[n, k] > 0:
                first = -(child[n, k] + 1)
                tris = pos[first : first + count[n, k]]
                assert (tris.reshape(-1, 3) >= cmin[n, k] - 1e-4).all()
                assert (tris.reshape(-1, 3) <= cmax[n, k] + 1e-4).all()


def test_bvh_matches_brute_force_closest():
    scene = scene_with_bvh(cornell_box())
    o, d = _random_rays(512)
    brute = trace_closest_brute(scene, o, d)
    bvh = trace_closest_bvh(scene, o, d)
    bt, vt = np.asarray(brute.t), np.asarray(bvh.t)
    # identical hit distances (same triangles modulo reordering)
    assert np.allclose(
        np.where(np.isfinite(bt), bt, 1e30),
        np.where(np.isfinite(vt), vt, 1e30),
        atol=1e-4,
    )
    assert (np.asarray(brute.is_some) == np.asarray(bvh.is_some)).all()


def test_bvh_matches_brute_force_anyhit():
    scene = scene_with_bvh(cornell_box())
    o, d = _random_rays(512, seed=3)
    t_max = jnp.full((512,), 1.5, jnp.float32)
    brute = np.asarray(trace_anyhit_brute(scene, o, d, t_max))
    bvh = np.asarray(trace_anyhit_bvh(scene, o, d, t_max))
    assert (brute == bvh).all()


def test_single_triangle_scene():
    pos = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    arrays, order = build_bvh(pos)
    assert order.tolist() == [0]
    from strolle_tpu.bvh.builder import BvhArrays  # noqa: F401

    o = jnp.asarray([[0.2, 0.2, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])

    class _S:  # minimal scene shim
        bvh = arrays
        class geometry:
            positions = jnp.asarray(pos)

    hit = trace_closest_bvh(_S, o, d)
    assert bool(hit.is_some[0])
    assert np.isclose(float(hit.t[0]), 1.0, atol=1e-6)
