"""Ray-triangle and ray-box intersection primitives.

Semantics follow the reference kernels (Möller-Trumbore with
interpolated, det-sign-flipped normals — strolle-gpu/src/triangle.rs:
64-113; Tavian slab AABB test — ray.rs:273-302; sphere intersection —
ray.rs:304-321) re-expressed as batched jnp over SoA arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as vm

F32_EPS = 1.1920929e-07
F32_MAX = 3.4028235e38


def ray_triangle(o, d, v0, v1, v2):
    """Möller-Trumbore. All inputs broadcastable [..., 3].

    Returns (t, u, v, det): hit is valid where
    ``(u in [0,1]) & (v >= 0) & (u+v <= 1) & (t > 0) & (|det| >= eps)``.
    Invalid lanes get t = +inf. ``det`` is returned so callers can apply
    the reference's normal flip `copysign(1, inv_det)`.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = vm.cross(d, e2)
    det = vm.dot(e1, pvec)
    inv_det = jnp.where(jnp.abs(det) < F32_EPS, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    tvec = o - v0
    u = vm.dot(tvec, pvec) * inv_det
    qvec = vm.cross(tvec, e1)
    v = vm.dot(d, qvec) * inv_det
    t = vm.dot(e2, qvec) * inv_det
    valid = (
        (jnp.abs(det) >= F32_EPS)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    t = jnp.where(valid, t, jnp.inf)
    return t, u, v, det


def ray_aabb(o, inv_d, bb_min, bb_max, t_max):
    """Tavian slab test (ray.rs:273-302). Returns entry distance or
    +inf on miss; broadcastable [..., 3] inputs."""
    t0 = (bb_min - o) * inv_d
    t1 = (bb_max - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_max)
    return jnp.where(hit, t_near, jnp.inf)


def ray_sphere(o, d, center, radius):
    """Returns smallest positive t, or +inf (ray.rs:304-321)."""
    oc = o - center
    b = vm.dot(oc, d)
    c = vm.dot(oc, oc) - radius * radius
    disc = b * b - c
    # double-where: d sqrt(0) = inf would leak NaN backward through the
    # miss-lane where() below (tangent-sphere rays are routine)
    pos = disc > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > 0.0, t0, t1)
    return jnp.where((disc >= 0.0) & (t > 0.0), t, jnp.inf)


def safe_inv_dir(d):
    """1/d with signed-zero handling for slab tests."""
    tiny = 1e-20
    return 1.0 / jnp.where(jnp.abs(d) < tiny, jnp.where(d >= 0, tiny, -tiny), d)
