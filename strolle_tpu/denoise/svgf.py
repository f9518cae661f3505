"""SVGF-style denoiser: temporal accumulation + variance + a-trous.

Re-derivation of strolle-shaders/src/frame_denoising.rs as batched
array ops. Channel layout and schedule follow the reference exactly:

* temporal reproject with history clamp 16; the confidence written by
  the resolving passes rides in the sample's alpha and resets history
  when 0 (reproject kernel, :41-77),
* variance from temporal moments when history >= 4, else a 5x5
  weighted spatial estimate x4 (:101-216),
* 5 a-trous iterations (3x3 taps, strides 1,2,4,8,16, strength 1..5,
  blue-noise jittered), with the FIRST iteration's output fed back as
  next frame's temporal color history (passes/frame_denoising.rs
  ping-pong: wavelet_0 writes prev_colors),
* edge-stopping weight = exp(-|sqrt-luma diff| * sigma_l) * depth
  leeway * normal^64 (:219-392).

Applied to the DI-diffuse and GI-diffuse channels only; specular is
not denoised (README.md:40).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import bluenoise, math as vm
from ..ops.hit import Surface
from ..restir.primary import Reprojection, bilinear_reproject
from ..utils.pytree import pytree_dataclass

HISTORY_CLAMP = 16.0
VARIANCE_MIN_HISTORY = 4.0
WAVELET_PASSES = 5

#: luma-sigma ramps (lerp(a, b, sqrt(var))) per channel kind
LUMA_SIGMA = {"di": (2.5, 0.5), "gi": (1.0, 0.0)}


@pytree_dataclass
class DenoiserState:
    """Temporal history for one denoised channel."""

    prev_color: jnp.ndarray  # f32[H, W, 3] post-first-wavelet colors
    prev_moments: jnp.ndarray  # f32[H, W, 3] (history, m1, m2)

    @staticmethod
    def empty(shape) -> "DenoiserState":
        return DenoiserState(
            prev_color=jnp.zeros(shape + (3,), jnp.float32),
            prev_moments=jnp.zeros(shape + (3,), jnp.float32),
        )


def _sample_weight(
    center_luma,
    center_depth,
    center_normal,
    sample_luma,
    sample_depth,
    sample_normal,
    luma_sigma,
    depth_sigma,
):
    """frame_denoising.rs sample_weight (:355-392)."""
    luma_w = jnp.abs(jnp.sqrt(jnp.maximum(center_luma, 0.0)) - jnp.sqrt(jnp.maximum(sample_luma, 0.0))) * luma_sigma
    leeway = center_depth * depth_sigma
    diff = jnp.abs(sample_depth - center_depth)
    depth_w = jnp.where(
        diff >= leeway, 0.0, 1.0 - diff / jnp.maximum(leeway, 1e-20)
    )
    # normal_dot^64 via 6 squarings (float pow lowers to exp/log on VPU)
    normal_w = jnp.maximum(vm.dot(sample_normal, center_normal), 0.0)
    for _ in range(6):
        normal_w = normal_w * normal_w
    return jnp.exp(-luma_w) * depth_w * normal_w


def _shift(arr, dy, dx):
    """Shift with edge clamp replaced by zero-fill + valid mask."""
    h, w = arr.shape[0], arr.shape[1]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    shifted = arr[ys][:, xs]
    valid_y = (jnp.arange(h) + dy >= 0) & (jnp.arange(h) + dy < h)
    valid_x = (jnp.arange(w) + dx >= 0) & (jnp.arange(w) + dx < w)
    valid = valid_y[:, None] & valid_x[None, :]
    return shifted, valid


def temporal_reproject(
    samples: jnp.ndarray,  # f32[H, W, 4] rgb + confidence
    surf: Surface,
    reproj: Reprojection,
    state: DenoiserState,
):
    """Returns (color [H,W,3], moments [H,W,3])."""
    sky = ~surf.is_some
    sample_rgb = samples[..., :3]
    sample_luma = vm.luma(sample_rgb)

    prev_color = bilinear_reproject(reproj, state.prev_color)
    prev_moments = bilinear_reproject(reproj, state.prev_moments)

    use_hist = reproj.is_some & (samples[..., 3] > 0.0) & ~sky
    history = jnp.minimum(prev_moments[..., 0] + 1.0, HISTORY_CLAMP)
    alpha = 1.0 / jnp.maximum(history, 1.0)

    color = vm.lerp(prev_color, sample_rgb, alpha[..., None])
    m1 = vm.lerp(prev_moments[..., 1], sample_luma, alpha)
    m2 = vm.lerp(prev_moments[..., 2], sample_luma * sample_luma, alpha)
    moments = jnp.stack([history, m1, m2], axis=-1)

    reset = jnp.stack(
        [jnp.ones_like(history), sample_luma, sample_luma * sample_luma],
        axis=-1,
    )
    color = jnp.where(use_hist[..., None], color, sample_rgb)
    moments = jnp.where(use_hist[..., None], moments, reset)
    # sky: passthrough color, moments untouched (kernel early-out)
    moments = jnp.where(sky[..., None], state.prev_moments, moments)
    return color, moments


def estimate_variance(color, moments, surf: Surface):
    """Returns variance [H, W] (alpha channel of the wavelet input)."""
    sky = ~surf.is_some
    luma = vm.luma(color)

    var_temporal = moments[..., 2] - vm.sqr(moments[..., 1])

    # 5x5 weighted spatial fallback for young pixels
    sum_l = jnp.zeros_like(luma)
    sum_l2 = jnp.zeros_like(luma)
    sum_w = jnp.zeros_like(luma)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            s_luma_full, valid = _shift(luma, dy, dx)
            s_depth, _ = _shift(surf.depth, dy, dx)
            s_normal, _ = _shift(surf.normal, dy, dx)
            s_sky, _ = _shift(sky, dy, dx)
            w = _sample_weight(
                luma, surf.depth, surf.normal,
                s_luma_full, s_depth, s_normal,
                1.0, 0.2,
            )
            w = jnp.where(valid & ~s_sky, w, 0.0)
            sum_l = sum_l + s_luma_full * w
            sum_l2 = sum_l2 + s_luma_full * s_luma_full * w
            sum_w = sum_w + w
    m1 = sum_l / jnp.maximum(sum_w, 1e-20)
    m2 = sum_l2 / jnp.maximum(sum_w, 1e-20)
    var_spatial = jnp.abs(m2 - m1 * m1) * 4.0

    var = jnp.where(
        moments[..., 0] >= VARIANCE_MIN_HISTORY, var_temporal, var_spatial
    )
    return jnp.where(sky, 0.0, jnp.maximum(var, 0.0))


def _wavelet(color, var, surf, stride, strength, jitter, sigma_ab):
    """One a-trous iteration: 3x3 taps at `stride`, blue-noise jitter."""
    sky = ~surf.is_some
    center_luma = vm.luma(color)
    a, b = sigma_ab
    # The reference lerps on the raw sqrt(var) (frame_denoising.rs:263,
    # :266); above var=1 that extrapolates the sigma NEGATIVE and
    # exp(-luma_w) can overflow to inf (NaN after normalization). Our
    # sky radiance is EXPOSURE-scaled so high variances are routine —
    # saturate the ramp so sigma stays in [b, a].
    luma_sigma = vm.lerp(
        jnp.float32(a),
        jnp.float32(b),
        vm.saturate(jnp.sqrt(jnp.maximum(var, 0.0))),
    )
    depth_sigma = 0.33 / strength

    sum_w = jnp.ones_like(var)
    sum_c = color
    sum_v = var
    jx = jitter[..., 0]
    jy = jitter[..., 1]

    h, w = var.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]

    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            if oy == 0 and ox == 0:
                continue
            py = ys + jy + oy * stride
            px = xs + jx + ox * stride
            inb = (py >= 0) & (py < h) & (px >= 0) & (px < w)
            cy = jnp.clip(py, 0, h - 1)
            cx = jnp.clip(px, 0, w - 1)
            s_color = color[cy, cx]
            s_var = var[cy, cx]
            s_luma = vm.luma(s_color)
            s_depth = surf.depth[cy, cx]
            s_normal = surf.normal[cy, cx]
            s_sky = sky[cy, cx]
            wgt = _sample_weight(
                center_luma, surf.depth, surf.normal,
                s_luma, s_depth, s_normal,
                luma_sigma, depth_sigma,
            )
            wgt = jnp.where(inb & ~s_sky & (wgt > 0.0), wgt, 0.0)
            sum_w = sum_w + wgt
            sum_c = sum_c + wgt[..., None] * s_color
            sum_v = sum_v + wgt * wgt * s_var

    out_c = sum_c / sum_w[..., None]
    out_v = sum_v / (sum_w * sum_w)
    out_c = jnp.where(sky[..., None], color, out_c)
    out_v = jnp.where(sky, var, out_v)
    return out_c, out_v


def denoise_channel(
    samples: jnp.ndarray,  # f32[H, W, 4] rgb + confidence
    surf: Surface,
    reproj: Reprojection,
    state: DenoiserState,
    frame,
    kind: str = "di",
):
    """Full SVGF chain for one channel. Returns (rgb, new state)."""
    color, moments = temporal_reproject(samples, surf, reproj, state)
    var = estimate_variance(color, moments, surf)

    from ..camera import screen_grid  # local import to avoid cycle

    h, w = var.shape
    grid = jnp.stack(
        jnp.meshgrid(jnp.arange(w), jnp.arange(h), indexing="xy"), axis=-1
    )
    _, bn2 = bluenoise.sample_pair(grid, frame)

    sigma_ab = LUMA_SIGMA[kind]
    new_prev_color = None
    for nth in range(WAVELET_PASSES):
        stride = 2**nth
        strength = float(1 + nth)
        jitter = ((bn2 - 0.5) * (stride - 1.0) * 0.5).astype(jnp.int32)
        color, var = _wavelet(
            color, var, surf, stride, strength, jitter, sigma_ab
        )
        if nth == 0:
            # first-iteration feedback becomes next frame's history
            new_prev_color = color

    new_state = DenoiserState(prev_color=new_prev_color, prev_moments=moments)
    return color, new_state
