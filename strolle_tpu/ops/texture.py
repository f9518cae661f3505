"""Texture-atlas sampling (bilinear, UV-repeat).

Reimplements Material::sample_atlas semantics
(strolle-gpu/src/material.rs:75-103): an all-zero atlas rect means
"untextured — use the multiplier"; otherwise sample the atlas at
``rect.xy + wrap(uv) * rect.zw`` and multiply.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.types import Scene


def _wrap(t: jnp.ndarray) -> jnp.ndarray:
    """UV repeat-wrap matching material.rs:82-88."""
    pos = jnp.mod(t, 1.0)
    neg = 1.0 - jnp.mod(-t, 1.0)
    return jnp.where(t > 0.0, pos, neg)


def sample_atlas_bilinear(image: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch from atlas image [A, A, 4] at normalized uv [..., 2].

    ONE row-batched take of the atlas packed with its clamp-shifted
    x+1 / y+1 / x+1,y+1 variants (16 channels), indexed at the floor
    corner — four per-corner 2-D indexing fetches cost ~5 ms EACH at
    800x608 while one multi-channel take costs ~5 ms total
    (ops/gather.py). The variant matrix is built from the same operand
    every call, so XLA CSEs it across the per-channel samples of one
    program.
    """
    h, w = image.shape[0], image.shape[1]
    sx = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
    sy = jnp.concatenate([image[1:], image[-1:]], axis=0)
    sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
    mat = jnp.concatenate([image, sx, sy, sxy], axis=-1).reshape(h * w, 16)

    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    g = jnp.take(mat, (y0 * w + x0).reshape(-1), axis=0, mode="clip").reshape(
        x0.shape + (16,)
    )
    c00, c10, c01, c11 = (g[..., i * 4 : (i + 1) * 4] for i in range(4))
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
