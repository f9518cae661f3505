"""Counter-based white noise, bit-compatible with the reference renderer.

The reference threads a mutable 32-bit PCG state through every kernel
(/root/reference/strolle-gpu/src/noise/white.rs) and *stores that state
inside GI reservoir samples* so validation frames can replay the exact
random walk. We reproduce that contract functionally: the state is a
uint32 array (one lane per pixel/ray), every sampler returns
``(new_state, value)``, and states can be persisted in FrameState
pytrees for replay.

All helpers operate on arbitrary-shape uint32 state arrays and
vectorize over them.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as vm

_U32 = jnp.uint32
_MAX_U32_F = 4294967295.0


def wnoise_new(seed, x, y) -> jnp.ndarray:
    """Per-pixel stream seeding (white.rs:15-19): seed ^ 48619x ^ 95461y."""
    seed = jnp.asarray(seed, _U32)
    x = jnp.asarray(x, _U32)
    y = jnp.asarray(y, _U32)
    return seed ^ (_U32(48619) * x) ^ (_U32(95461) * y)


def next_u32(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """PCG-hash step (white.rs:35-42). Returns (state', uniform u32)."""
    state = state * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return state, (word >> _U32(22)) ^ word


def next_f32(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform sample in [0, 1]."""
    state, word = next_u32(state)
    return state, word.astype(jnp.float32) / _MAX_U32_F


def sample_circle(state):
    """Uniform point on the unit circle [..., 2]."""
    state, u = next_f32(state)
    angle = u * (2.0 * jnp.pi)
    return state, jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def sample_disk(state):
    """Uniform point inside the unit disk [..., 2]."""
    state, u = next_f32(state)
    radius = jnp.sqrt(u)
    state, circ = sample_circle(state)
    return state, circ * radius[..., None]


def sample_sphere(state):
    """Point on/in the unit sphere, reproducing white.rs:60-75 exactly
    (including its sqrt(u) radial factor)."""
    state, u0 = next_f32(state)
    state, u1 = next_f32(state)
    state, u2 = next_f32(state)
    phi = u0 * (2.0 * jnp.pi)
    # cos(acos(2u-1)) == 2u-1 and sin(acos(x)) == sqrt(1-x^2): evaluate
    # the reference's acos/sin/cos chain algebraically (transcendentals
    # are the VPU's slowest ops; this is numerically identical).
    cos_theta = jnp.clip(u1 * 2.0 - 1.0, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    r = jnp.sqrt(u2)
    return state, jnp.stack(
        [
            r * sin_theta * jnp.cos(phi),
            r * sin_theta * jnp.sin(phi),
            r * cos_theta,
        ],
        axis=-1,
    )


def sample_hemisphere(state, normal):
    """Hemisphere sample around ``normal`` [..., 3] (white.rs:78-88):
    cos_theta drawn uniformly (the reference pairs this with pdf=1/pi)."""
    state, cos_theta = next_f32(state)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    state, u = next_f32(state)
    phi = 2.0 * jnp.pi * u
    t, b = vm.any_orthonormal_pair(normal)
    d = (
        t * jnp.cos(phi)[..., None] + b * jnp.sin(phi)[..., None]
    ) * sin_theta[..., None] + normal * cos_theta[..., None]
    return state, d
