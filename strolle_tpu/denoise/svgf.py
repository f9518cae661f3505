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

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import bluenoise, gather, math as vm
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


def _grad_safe_sqrt(x):
    """sqrt(max(x, 0)) whose gradient is 0 (not inf) at x == 0.

    d/dx sqrt(x) = 1/(2 sqrt(x)) diverges at zero; unlit pixels have
    luma exactly 0, so autodiff through the edge-stopping weights (the
    variance spatial fallback is NOT weight-frozen, unlike the wavelet
    VJP) turned scene-parameter gradients NaN. The double-where keeps
    the untaken branch's derivative finite."""
    x = jnp.maximum(x, 0.0)
    safe = jnp.sqrt(jnp.maximum(x, 1e-12))
    return jnp.where(x > 0.0, safe, 0.0)


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
    luma_w = jnp.abs(
        _grad_safe_sqrt(center_luma) - _grad_safe_sqrt(sample_luma)
    ) * luma_sigma
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
    """shifted[y, x] = arr[clamp(y + dy), clamp(x + dx)] plus the
    in-bounds mask. Expressed as an edge pad + static slice: index-array
    gathers here (arr[ys][:, xs]) lower to the slow scalar-core gather
    path when fused into the filter arithmetic, while pad+slice stays a
    layout-native copy the fusion absorbs."""
    h, w = arr.shape[0], arr.shape[1]
    py0, py1 = max(-dy, 0), max(dy, 0)
    px0, px1 = max(-dx, 0), max(dx, 0)
    pad = ((py0, py1), (px0, px1)) + ((0, 0),) * (arr.ndim - 2)
    padded = jnp.pad(arr, pad, mode="edge")
    shifted = jax.lax.slice(
        padded,
        (py0 + dy, px0 + dx) + (0,) * (arr.ndim - 2),
        (py0 + dy + h, px0 + dx + w) + padded.shape[2:],
    )
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    valid = (yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w)
    return shifted, valid


def temporal_reproject(
    samples: jnp.ndarray,  # f32[H, W, 4] rgb + confidence
    surf: Surface,
    reproj: Reprojection,
    state: DenoiserState,
    history_clamp: float = HISTORY_CLAMP,
    prev_fetched: jnp.ndarray | None = None,  # prefetched [H,W,6]
):
    """Returns (color [H,W,3], moments [H,W,3])."""
    sky = ~surf.is_some
    sample_rgb = samples[..., :3]
    sample_luma = vm.luma(sample_rgb)

    # one bilinear fetch for color + moments (the take cost is flat in
    # the channel count, ops/gather.py); denoise_pair prefetches both
    # channels' state in a single take
    prev = (
        bilinear_reproject(
            reproj,
            jnp.concatenate([state.prev_color, state.prev_moments], axis=-1),
        )
        if prev_fetched is None
        else prev_fetched
    )
    prev_color, prev_moments = prev[..., :3], prev[..., 3:]

    use_hist = reproj.is_some & (samples[..., 3] > 0.0) & ~sky
    history = jnp.minimum(prev_moments[..., 0] + 1.0, history_clamp)
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


def estimate_variance(color, moments, surf: Surface,
                      min_history: float = VARIANCE_MIN_HISTORY):
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
    # double-where: sum_w == 0 (sky-surrounded pixels) must yield a
    # ZERO gradient, not a 1/1e-20-scaled one — the 1e20 cotangents
    # overflowed to inf/NaN in the backward pass (light/vertex grads)
    ok = sum_w > 1e-10
    den = jnp.where(ok, sum_w, 1.0)
    m1 = jnp.where(ok, sum_l / den, 0.0)
    m2 = jnp.where(ok, sum_l2 / den, 0.0)
    var_spatial = jnp.abs(m2 - m1 * m1) * 4.0

    var = jnp.where(
        moments[..., 0] >= min_history, var_temporal, var_spatial
    )
    return jnp.where(sky, 0.0, jnp.maximum(var, 0.0))


def _jitter_shift(arr, jy, jx, radius):
    """Per-pixel shift by small integer offsets |j| <= radius.

    Selects among statically shifted copies (pad+slice) — per-pixel
    gathers and take_along_axis both draw pathological TPU layouts in
    this computation, while static shifts + selects stay on the VPU.
    Edge behavior is clamp (matches the clip the gather version used).
    """

    def axis_pass(a, j, axis):
        out = a
        for d in range(-radius, radius + 1):
            if d == 0:
                continue
            dy, dx = (d, 0) if axis == 0 else (0, d)
            shifted, _ = _shift(a, dy, dx)
            m = j == d
            out = jnp.where(m if a.ndim == 2 else m[..., None], shifted, out)
        return out

    return axis_pass(axis_pass(arr, jy, 0), jx, 1)


def _wavelet_impl(
    stride, strength, radius, sigma_ab,
    c_lin, c_w, var, depth, normal, skyf, jyf, jxf,
):
    """One a-trous iteration: 3x3 taps at `stride`, blue-noise jitter.

    The reference jitters each tap position by the CENTER pixel's
    blue-noise offset (frame_denoising.rs:300-306). Expressing that as
    per-tap gathers makes XLA pick pathological layouts (185 ms/pass at
    800x608); instead we jitter the sampled FIELDS once per pass (each
    tap's offset is then evaluated at the tap's own pixel rather than
    the center — an equally valid dither of the same magnitude) and
    read the 8 taps as static shifts, which lower to pad+slice.

    ``c_lin`` is the color the filter is APPLIED to; ``c_w`` is the
    color the edge-stopping weights are computed from. The two are the
    same array in the forward pass; the custom VJP re-applies the
    filter to cotangents with ``c_w`` frozen (BASELINE.md custom-VJP
    requirement; SURVEY.md §7.5), so the backward pass is the exact
    adjoint of the frozen-weight linear operator.
    """
    sky = skyf > 0.5
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
    center_luma = vm.luma(c_w)

    sum_w = jnp.ones_like(var)
    sum_c = c_lin
    sum_v = var

    fields = (c_lin, c_w, var, depth, normal, skyf)
    if radius > 0:
        jy = jyf.astype(jnp.int32)
        jx = jxf.astype(jnp.int32)
        fields = tuple(_jitter_shift(f, jy, jx, radius) for f in fields)
    j_lin, j_w, j_var, j_depth, j_normal, j_skyf = fields

    for oy in (-1, 0, 1):
        for ox in (-1, 0, 1):
            if oy == 0 and ox == 0:
                continue
            dy = oy * stride
            dx = ox * stride
            s_lin, inb = _shift(j_lin, dy, dx)
            s_w, _ = _shift(j_w, dy, dx)
            s_var, _ = _shift(j_var, dy, dx)
            s_depth, _ = _shift(j_depth, dy, dx)
            s_normal, _ = _shift(j_normal, dy, dx)
            s_skyf, _ = _shift(j_skyf, dy, dx)
            s_luma = vm.luma(s_w)
            wgt = _sample_weight(
                center_luma, depth, normal,
                s_luma, s_depth, s_normal,
                luma_sigma, depth_sigma,
            )
            wgt = jnp.where(inb & (s_skyf < 0.5) & (wgt > 0.0), wgt, 0.0)
            sum_w = sum_w + wgt
            sum_c = sum_c + wgt[..., None] * s_lin
            sum_v = sum_v + wgt * wgt * s_var

    out_c = sum_c / sum_w[..., None]
    out_v = sum_v / (sum_w * sum_w)
    out_c = jnp.where(sky[..., None], c_lin, out_c)
    out_v = jnp.where(sky, var, out_v)
    return out_c, out_v


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _wavelet_core(stride, strength, radius, sigma_ab,
                  color, var, depth, normal, skyf, jyf, jxf):
    """A-trous iteration with the BASELINE-required custom VJP: the
    backward pass freezes the edge-stopping weights (computed from the
    primal color/variance/geometry) and pushes the color cotangent
    through the exact adjoint of the remaining linear filter. Variance,
    geometry, and jitter receive zero cotangent — gradients follow the
    filtered radiance only, never the weight nonlinearities (cheaper
    and far stabler than autodiff through exp/|.|/pow, SURVEY.md §7.5)."""
    return _wavelet_impl(
        stride, strength, radius, sigma_ab,
        color, color, var, depth, normal, skyf, jyf, jxf,
    )


def _wavelet_core_fwd(stride, strength, radius, sigma_ab,
                      color, var, depth, normal, skyf, jyf, jxf):
    out = _wavelet_core(
        stride, strength, radius, sigma_ab,
        color, var, depth, normal, skyf, jyf, jxf,
    )
    return out, (color, var, depth, normal, skyf, jyf, jxf)


def _wavelet_core_bwd(stride, strength, radius, sigma_ab, saved, g):
    color, var, depth, normal, skyf, jyf, jxf = saved
    g_c, _g_v = g  # the variance chain is detached by design

    def lin(c):
        return _wavelet_impl(
            stride, strength, radius, sigma_ab,
            c, color, var, depth, normal, skyf, jyf, jxf,
        )[0]

    _, vjp = jax.vjp(lin, color)
    (g_color,) = vjp(g_c)
    zeros = (
        jnp.zeros_like(var), jnp.zeros_like(depth), jnp.zeros_like(normal),
        jnp.zeros_like(skyf), jnp.zeros_like(jyf), jnp.zeros_like(jxf),
    )
    return (g_color,) + zeros


_wavelet_core.defvjp(_wavelet_core_fwd, _wavelet_core_bwd)


def _wavelet(color, var, surf, stride, strength, jitter_yx, sigma_ab):
    """See _wavelet_impl; this wrapper adapts pytree inputs to the
    custom-VJP core (jitter passed as f32 so zero cotangents exist)."""
    skyf = (~surf.is_some).astype(jnp.float32)
    if jitter_yx is None:
        radius = 0
        jyf = jxf = jnp.zeros_like(var)
    else:
        jy, jx, radius = jitter_yx
        jyf = jy.astype(jnp.float32)
        jxf = jx.astype(jnp.float32)
    return _wavelet_core(
        stride, strength, radius, sigma_ab,
        color, var, surf.depth, surf.normal, skyf, jyf, jxf,
    )


def denoise_pair(
    di_samples, gi_samples, surf, reproj, di_state, gi_state, frame,
    tuning=None,
):
    """SVGF on the DI-diffuse + GI-diffuse channels with ONE shared
    bilinear history fetch (both channels reproject at the same
    coordinates and the take cost is flat in the channel count).
    Returns (di_rgb, di_state'), (gi_rgb, gi_state')."""
    prev = bilinear_reproject(
        reproj,
        jnp.concatenate(
            [di_state.prev_color, di_state.prev_moments,
             gi_state.prev_color, gi_state.prev_moments],
            axis=-1,
        ),
    )
    di = denoise_channel(
        di_samples, surf, reproj, di_state, frame, kind="di", tuning=tuning,
        prev_fetched=prev[..., 0:6],
    )
    gi = denoise_channel(
        gi_samples, surf, reproj, gi_state, frame, kind="gi", tuning=tuning,
        prev_fetched=prev[..., 6:12],
    )
    return di, gi


def denoise_channel(
    samples: jnp.ndarray,  # f32[H, W, 4] rgb + confidence
    surf: Surface,
    reproj: Reprojection,
    state: DenoiserState,
    frame,
    kind: str = "di",
    tuning=None,
    prev_fetched=None,
):
    """Full SVGF chain for one channel. Returns (rgb, new state)."""
    from ..config import DEFAULT_TUNING

    tuning = tuning or DEFAULT_TUNING
    color, moments = temporal_reproject(
        samples, surf, reproj, state, tuning.svgf_history_clamp,
        prev_fetched=prev_fetched,
    )
    var = estimate_variance(color, moments, surf,
                            tuning.svgf_variance_min_history)

    h, w = var.shape
    _, _, bn_x, bn_y = bluenoise.sample_pair_screen(h, w, frame)
    bn_x = bn_x - 0.5
    bn_y = bn_y - 0.5

    sigma_ab = LUMA_SIGMA[kind]
    new_prev_color = None
    for nth in range(tuning.svgf_wavelet_passes):
        stride = 2**nth
        strength = float(1 + nth)
        amp = (stride - 1.0) * 0.5
        radius = int(amp * 0.5)  # max |int(bn * amp)| with |bn| < 0.5
        if radius == 0:
            # the int cast truncates sub-pixel jitter to 0: the first
            # three strides are unjittered (as in the reference).
            jitter_yx = None
        else:
            jitter_yx = (
                (bn_y * amp).astype(jnp.int32),
                (bn_x * amp).astype(jnp.int32),
                radius,
            )
        color, var = _wavelet(
            color, var, surf, stride, strength, jitter_yx, sigma_ab
        )
        if nth == 0:
            # first-iteration feedback becomes next frame's history
            new_prev_color = color

    new_state = DenoiserState(prev_color=new_prev_color, prev_moments=moments)
    return color, new_state
