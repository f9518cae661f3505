"""Vector math over trailing-axis-3 arrays.

All helpers operate on arrays whose last axis is the vector dimension
(``[..., 3]`` / ``[..., 2]``), so they vectorize over any batch of
pixels/rays/triangles. Semantics re-derived from the reference's shared
GPU library (/root/reference/strolle-gpu/src/utils.rs and
normal.rs) but expressed as pure jnp — no bit packing, no Vec4 layouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = jnp.finfo(jnp.float32).eps


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis, keeps no dims."""
    return jnp.sum(a * b, axis=-1)


def dotk(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product, keepdims=True (for broadcasting back)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(a: jnp.ndarray) -> jnp.ndarray:
    """NaN-safe under autodiff: d sqrt(0) = inf, and the double-where
    keeps the zero-vector branch's cotangent at exactly 0 (degenerate
    geometry — empty reservoirs, padded lights — must not poison scene
    gradients)."""
    n2 = dot(a, a)
    pos = n2 > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, n2, 1.0)), 0.0)


def length_squared(a: jnp.ndarray) -> jnp.ndarray:
    return dot(a, a)


def normalize(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize: zero vectors stay zero-ish instead of producing
    NaN (guards autodiff through degenerate geometry)."""
    n2 = dotk(a, a)
    return a * jax.lax.rsqrt(jnp.maximum(n2, eps))


def saturate(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 1.0)


def sqr(x: jnp.ndarray) -> jnp.ndarray:
    return x * x


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return a + (b - a) * t


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect incident vector ``i`` about normal ``n`` (GLSL convention)."""
    return i - 2.0 * dotk(i, n) * n


def copysign1(x: jnp.ndarray) -> jnp.ndarray:
    """+1.0 where x >= 0 else -1.0 (sign that never returns 0)."""
    return jnp.where(x >= 0.0, 1.0, -1.0)


def luma(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 relative luminance (reference: vec3_ext.rs `luma`)."""
    return (
        rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722
    )


def perc_luma(rgb: jnp.ndarray) -> jnp.ndarray:
    """Perceptual luminance = sqrt(luma) (reference: `perc_luma`).
    Double-where keeps black-radiance gradients finite (d sqrt(0) = inf)."""
    l = luma(rgb)
    pos = l > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, l, 1.0)), 0.0)


def with_luma(rgb: jnp.ndarray, new_luma: jnp.ndarray) -> jnp.ndarray:
    old = luma(rgb)
    scale = jnp.where(old > 0.0, new_luma / jnp.maximum(old, 1e-20), 0.0)
    return rgb * scale[..., None]


def any_orthonormal_pair(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branch-free orthonormal basis around unit vector ``n``.

    Pixar's method (Duff et al., "Building an Orthonormal Basis,
    Revisited", JCGT 2017) — same contract as glam's
    ``any_orthonormal_pair`` used throughout the reference kernels.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    bt = jnp.stack(
        [b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]],
        axis=-1,
    )
    return t, bt


def octahedral_encode(n: jnp.ndarray) -> jnp.ndarray:
    """Unit vector [...,3] -> octahedral [...,2] in [-1,1].

    Mirrors the reference's Normal::encode (normal.rs:8-20).
    """
    s = jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    v = n / jnp.maximum(s, 1e-20)
    xy = v[..., :2]
    flipped = (1.0 - jnp.abs(xy[..., ::-1])) * jnp.where(xy >= 0.0, 1.0, -1.0)
    return jnp.where(v[..., 2:3] >= 0.0, xy, flipped)


def octahedral_decode(e: jnp.ndarray) -> jnp.ndarray:
    """Octahedral [...,2] -> unit vector [...,3] (normal.rs:22-35)."""
    x, y = e[..., 0], e[..., 1]
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    t = jnp.maximum(-z, 0.0)
    x = x - jnp.where(x >= 0.0, t, -t)
    y = y - jnp.where(y >= 0.0, t, -t)
    v = jnp.stack([x, y, z], axis=-1)
    return normalize(v)
