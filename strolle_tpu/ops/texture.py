"""Texture-atlas sampling (bilinear, UV-repeat).

Reimplements Material::sample_atlas semantics
(strolle-gpu/src/material.rs:75-103): an all-zero atlas rect means
"untextured — use the multiplier"; otherwise sample the atlas at
``rect.xy + wrap(uv) * rect.zw`` and multiply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.types import Scene


def _wrap(t: jnp.ndarray) -> jnp.ndarray:
    """UV repeat-wrap matching material.rs:82-88."""
    pos = jnp.mod(t, 1.0)
    neg = 1.0 - jnp.mod(-t, 1.0)
    return jnp.where(t > 0.0, pos, neg)


def _packed_corner_matrix(image: jnp.ndarray) -> jnp.ndarray:
    """[A*A, 4] u32 rows: the texel and its clamp-shifted x+1 / y+1 /
    x+1,y+1 neighbors, each RGBA8-packed into one u32.

    The reference's atlas IS rgba8 (strolle/src/images.rs srgb-u8
    texture), so quantizing the f32 working copy back to 8 bits per
    channel is faithful, and it makes the bilinear fetch a C=4 u32 take
    instead of a C=16 f32 one — measured at 800x608 over a 2048^2
    atlas (random indices, marginal in-program cost): 10.0 ms for the
    f32[A*A, 16] take vs 5.5 ms for the u32[A*A, 4] take INCLUDING the
    unpack + blend arithmetic. Gather cost on this chip scales with
    bytes touched per row once the table exceeds the on-chip working
    set (ops/gather.py).

    Construction is in-program from the f32 image (pure bandwidth,
    CSE'd across the channel samples of one program).
    """
    h, w = image.shape[0], image.shape[1]
    q = jnp.round(jnp.clip(image, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    p = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)
    sx = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    sy = jnp.concatenate([p[1:], p[-1:]], axis=0)
    sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
    return jnp.stack([p, sx, sy, sxy], axis=-1).reshape(h * w, 4)


def _unpack_rgba8(u: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [((u >> s) & 0xFF).astype(jnp.float32) for s in (0, 8, 16, 24)],
        axis=-1,
    ) * (1.0 / 255.0)


def sample_atlas_bilinear(image: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch from atlas image [A, A, 4] at normalized uv [..., 2].

    ONE row-batched take of the RGBA8-packed corner matrix
    (_packed_corner_matrix), indexed at the floor corner — four
    per-corner 2-D indexing fetches would cost ~5 ms EACH at 800x608
    (ops/gather.py). Gradients flow through the blend weights (uv);
    the texel table itself is u8-quantized and detached — nothing in
    the framework differentiates w.r.t. atlas texels (the reference's
    atlas is u8 to begin with).
    """
    h, w = image.shape[0], image.shape[1]
    mat = jax.lax.stop_gradient(_packed_corner_matrix(image))

    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    g = jnp.take(mat, (y0 * w + x0).reshape(-1), axis=0, mode="clip").reshape(
        x0.shape + (4,)
    )
    c00, c10, c01, c11 = (_unpack_rgba8(g[..., i]) for i in range(4))
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_material_channel(
    scene: Scene,
    multiplier: jnp.ndarray,  # f32[..., 4]
    rect: jnp.ndarray,  # f32[..., 4]  atlas rect [x, y, w, h]
    uv: jnp.ndarray,  # f32[..., 2]
    enabled: bool = True,
) -> jnp.ndarray:
    """multiplier if rect == 0 else multiplier * atlas(rect.xy + wrap(uv)*rect.zw).

    ``enabled=False`` (from Materials.tex_channels, static) skips the
    atlas gather entirely for channels no material textures."""
    if scene.atlas is None or not enabled:
        return multiplier
    textured = jnp.any(rect != 0.0, axis=-1, keepdims=True)
    wuv = _wrap(uv)
    auv = rect[..., 0:2] + wuv * rect[..., 2:4]
    texel = sample_atlas_bilinear(scene.atlas.image, auv)
    return jnp.where(textured, multiplier * texel, multiplier)
