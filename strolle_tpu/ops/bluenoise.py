"""Blue-noise sampling (strolle-gpu/src/noise/blue.rs).

The reference ships a 256x256 RGBA blue-noise PNG
(strolle/assets/blue-noise.png, momentsingraphics.de) and reads it at
``(pixel + (71, 11) * frame) % 256``. We generate a spectrally-shaped
blue-noise table once at import (high-pass-filtered white noise via
repeated void-and-cluster-style swaps would be ideal; a fast
FFT-based high-pass gives a close approximation) and cache it to
assets/blue_noise.npy so renders are reproducible.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

SIZE = 256
_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
    "blue_noise.npy",
)


def _generate_channel(rs: np.random.RandomState) -> np.ndarray:
    """Rank-ordered high-pass-filtered noise: take white noise, high-pass
    it in Fourier space, then rank-remap to a uniform [0,1) histogram.
    This preserves uniformity (required for unbiased sampling) while
    pushing energy into high frequencies (blue spectrum)."""
    white = rs.rand(SIZE, SIZE)
    f = np.fft.fft2(white)
    fy = np.fft.fftfreq(SIZE)[:, None]
    fx = np.fft.fftfreq(SIZE)[None, :]
    dist = np.sqrt(fx * fx + fy * fy)
    hp = dist / (dist.max() + 1e-9)
    shaped = np.real(np.fft.ifft2(f * hp))
    order = np.argsort(shaped, axis=None)
    ranked = np.empty(SIZE * SIZE)
    ranked[order] = (np.arange(SIZE * SIZE) + 0.5) / (SIZE * SIZE)
    return ranked.reshape(SIZE, SIZE).astype(np.float32)


def _load_or_generate() -> np.ndarray:
    if os.path.exists(_CACHE):
        return np.load(_CACHE)
    rs = np.random.RandomState(0x5713)
    tex = np.stack([_generate_channel(rs) for _ in range(4)], axis=-1)
    os.makedirs(os.path.dirname(_CACHE), exist_ok=True)
    np.save(_CACHE, tex)
    return tex


_tex_np = None


def texture() -> jnp.ndarray:
    """The [256, 256, 4] blue-noise table as a device array.

    The cache holds the NUMPY array: caching the jnp conversion would
    capture a tracer when first touched inside a jit trace.
    """
    global _tex_np
    if _tex_np is None:
        _tex_np = _load_or_generate()
    return jnp.asarray(_tex_np)


def sample_pair(grid_xy: jnp.ndarray, frame):
    """Returns (first [..., 2], second [..., 2]) blue-noise samples for
    integer pixel coords, with the per-frame (71, 11) offset scroll."""
    tex = texture()
    frame = jnp.asarray(frame, jnp.int32)
    u = (grid_xy[..., 0] + 71 * frame) % SIZE
    v = (grid_xy[..., 1] + 11 * frame) % SIZE
    texel = tex[v, u]
    return texel[..., 0:2], texel[..., 2:4]


def sample_pair_screen(h: int, w: int, frame):
    """`sample_pair` for the whole screen (pixel (x, y) = (col, row)).

    The identity-grid fetch is a roll of the 256x256 table + tiling —
    ~0.06 ms instead of ~12 ms for the equivalent full-screen gather.
    Returns four [h, w] planes (x1, y1, x2, y2).
    """
    tex = texture()
    frame = jnp.asarray(frame, jnp.int32)
    rolled = jnp.roll(
        tex, shift=(-(11 * frame) % SIZE, -(71 * frame) % SIZE), axis=(0, 1)
    )
    reps_y = -(-h // SIZE)
    reps_x = -(-w // SIZE)
    tiled = jnp.tile(rolled, (reps_y, reps_x, 1))[:h, :w]
    return tiled[..., 0], tiled[..., 1], tiled[..., 2], tiled[..., 3]
