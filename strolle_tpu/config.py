"""Pipeline tuning knobs (SURVEY.md §5.6).

The reference hard-codes every algorithmic constant in its shaders —
DI candidate count 16 (strolle-gpu/src/reservoir/ephemeral.rs:24-28),
temporal M-clamps 64/128 (di_temporal_resampling.rs:69,
gi_temporal_resampling.rs:68), w-clamp 5
(gi_temporal_resampling.rs:154), spatial samples 8 within radius
128 px (di_spatial_resampling.rs:55-99), Jacobian reject/clamp 10/3
(gi_spatial_resampling.rs:102-112), sky-sample probability 0.25
(gi_sampling_b.rs:123-127), denoiser history clamp 16 and variance
min-history 4 (frame_denoising.rs:56,122), 5 wavelet passes
(passes/frame_denoising.rs:83-108). Here they are one frozen,
hashable dataclass: the defaults reproduce the reference exactly, and
any field can be overridden per render via
``RenderConfig(tuning=Tuning(...))`` — the Tuning instance is a static
jit argument, so each distinct tuning traces its own stage programs
(XLA constant-folds the knobs; there is no runtime cost over the
hard-coded form).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Tuning:
    # --- ReSTIR DI ------------------------------------------------------
    #: RIS candidates per pixel (ephemeral.rs:24-28)
    di_candidates: int = 16
    #: temporal history length clamp (di_temporal_resampling.rs:69)
    di_temporal_m_clamp: float = 64.0
    #: neighbor tries per spatial pass (di_spatial_resampling.rs:55-99)
    di_spatial_samples: int = 8
    #: starting spatial search radius, px (di_spatial_resampling.rs:62)
    di_spatial_radius: float = 128.0

    # --- ReSTIR GI ------------------------------------------------------
    #: temporal history length clamp (gi_temporal_resampling.rs:68)
    gi_temporal_m_clamp: float = 128.0
    #: anti-firefly contribution-weight clamp (gi_temporal_resampling.rs:154)
    gi_w_clamp: float = 5.0
    #: reconnection-Jacobian rejection bound (gi_spatial_resampling.rs:104)
    gi_jacobian_reject: float = 10.0
    #: reconnection-Jacobian clamp after acceptance (:111)
    gi_jacobian_clamp: float = 3.0
    #: neighbor tries per spatial pass (gi_spatial_resampling.rs)
    gi_spatial_samples: int = 8
    #: starting spatial search radius, px
    gi_spatial_radius: float = 128.0
    #: radiance-shift fraction that invalidates a replayed sample
    #: (gi_temporal_resampling.rs:80-101)
    gi_validation_threshold: float = 0.33
    #: probability of sampling the sky instead of RIS lights at the
    #: secondary vertex when the sun is up (gi_sampling_b.rs:123-127)
    sky_sample_prob: float = 0.25

    # --- SVGF denoiser --------------------------------------------------
    #: temporal accumulation history cap (frame_denoising.rs:56)
    svgf_history_clamp: float = 16.0
    #: frames of history before temporal variance is trusted (:122)
    svgf_variance_min_history: float = 4.0
    #: à-trous iterations, strides 1,2,4,... (passes/frame_denoising.rs:83-108)
    svgf_wavelet_passes: int = 5


#: Reference-exact defaults; module-level so stage functions can use it
#: as their default argument without re-allocating.
DEFAULT_TUNING = Tuning()
