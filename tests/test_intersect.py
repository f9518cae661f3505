import numpy as np
import jax.numpy as jnp

from strolle_tpu.ops import intersect as ix
from strolle_tpu.ops.trace import trace_anyhit_brute, trace_closest_brute
from strolle_tpu.ops.hit import surface_at
from strolle_tpu.scene.cornell import cornell_box


def test_ray_triangle_basic():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    o = jnp.asarray([0.25, 0.25, 1.0])
    d = jnp.asarray([0.0, 0.0, -1.0])
    t, u, v, det = ix.ray_triangle(o, d, v0, v1, v2)
    assert np.isclose(float(t), 1.0, atol=1e-6)
    assert np.isclose(float(u), 0.25, atol=1e-6)
    assert np.isclose(float(v), 0.25, atol=1e-6)


def test_ray_triangle_miss_and_backface():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    # outside the triangle
    t, *_ = ix.ray_triangle(
        jnp.asarray([0.9, 0.9, 1.0]), jnp.asarray([0.0, 0.0, -1.0]), v0, v1, v2
    )
    assert np.isinf(float(t))
    # behind the origin
    t, *_ = ix.ray_triangle(
        jnp.asarray([0.25, 0.25, -1.0]), jnp.asarray([0.0, 0.0, -1.0]), v0, v1, v2
    )
    assert np.isinf(float(t))
    # backface still hits (two-sided, det < 0)
    t, u, v, det = ix.ray_triangle(
        jnp.asarray([0.25, 0.25, -1.0]), jnp.asarray([0.0, 0.0, 1.0]), v0, v1, v2
    )
    assert np.isclose(float(t), 1.0, atol=1e-6)
    assert float(det) < 0


def test_ray_aabb():
    o = jnp.asarray([0.0, 0.0, -5.0])
    d = jnp.asarray([0.0, 0.0, 1.0])
    inv = ix.safe_inv_dir(d)
    t = ix.ray_aabb(o, inv, jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]), jnp.inf)
    assert np.isclose(float(t), 4.0, atol=1e-6)
    # miss
    t = ix.ray_aabb(
        jnp.asarray([5.0, 0.0, -5.0]), inv,
        jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]), jnp.inf,
    )
    assert np.isinf(float(t))
    # origin inside
    t = ix.ray_aabb(
        jnp.asarray([0.0, 0.0, 0.0]), inv,
        jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]), jnp.inf,
    )
    assert np.isfinite(float(t))


def test_ray_sphere():
    t = ix.ray_sphere(
        jnp.asarray([0.0, 0.0, -5.0]), jnp.asarray([0.0, 0.0, 1.0]),
        jnp.zeros(3), 1.0,
    )
    assert np.isclose(float(t), 4.0, atol=1e-5)
    # inside -> far intersection
    t = ix.ray_sphere(
        jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0]), jnp.zeros(3), 1.0
    )
    assert np.isclose(float(t), 1.0, atol=1e-5)


def test_cornell_closest_hits():
    scene = cornell_box()
    # straight down the middle: should hit the back wall at z=-1
    o = jnp.asarray([[0.0, 1.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = trace_closest_brute(scene, o, d)
    assert bool(hit.is_some[0])
    assert np.isclose(float(hit.t[0]), 4.0, atol=1e-4)
    surf = surface_at(scene, o, d, hit)
    # back wall is white, normal +z
    assert np.allclose(np.asarray(surf.normal[0]), [0, 0, 1], atol=1e-5)
    assert np.allclose(np.asarray(surf.base_color[0, :3]), 0.73, atol=1e-5)

    # toward left wall: red (above the tall box, which tops out at y=1.2)
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    o = jnp.asarray([[0.0, 1.7, 0.0]])
    hit = trace_closest_brute(scene, o, d)
    surf = surface_at(scene, o, d, hit)
    assert np.allclose(np.asarray(surf.base_color[0, :3]), [0.61, 0.06, 0.06], atol=1e-5)


def test_cornell_anyhit_shadow():
    scene = cornell_box()
    # from light position toward the floor behind the tall box: occluded
    o = jnp.asarray([[-0.37, 1.85, -0.35]])
    target = jnp.asarray([[-0.37, 0.0, -0.35]])
    d = (target - o) / np.linalg.norm(np.asarray(target - o), axis=-1, keepdims=True)
    occ = trace_anyhit_brute(scene, o, jnp.asarray(d), jnp.asarray([1.84]))
    assert bool(occ[0])  # tall box blocks
    # clear line of sight: light to point just below it
    occ = trace_anyhit_brute(
        scene,
        jnp.asarray([[0.0, 1.85, 0.0]]),
        jnp.asarray([[0.0, -1.0, 0.0]]),
        jnp.asarray([1.80]),
    )
    assert not bool(occ[0])
