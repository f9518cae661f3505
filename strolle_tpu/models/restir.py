"""The real-time ReSTIR render pipeline — flagship model.

Functional analogue of CameraController::render
(strolle/src/camera_controller.rs:87-174): one jitted `render_frame`
step that threads a RenderState pytree (the reference's per-camera
buffers: prev surface/camera, reservoir history, denoiser state,
frame counter) through the stage functions:

    atmosphere (cached LUTs)            [stage 5, optional here]
    primary_pass  (ray-cast G-buffer + velocity)
    frame_reprojection
    DI: sampling -> temporal -> spatial -> resolving
    GI: reprojection -> sampling -> temporal -> spatial -> preview -> resolve
    SVGF denoise (DI diffuse + GI diffuse)
    composition
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera, screen_grid
from ..config import DEFAULT_TUNING, Tuning
from ..denoise.svgf import DenoiserState, denoise_channel
from ..ops import bluenoise, rng
from ..ops.hit import Surface
from ..restir import di as di_mod
from ..restir import gi as gi_mod
from ..restir.gi import GiReservoirs
from ..restir.primary import (
    Reprojection,
    build_reprojection_map,
    primary_pass,
)
from ..restir.reservoir import DiReservoirs
from ..scene.types import Scene
from ..sky.atmosphere import sample_sky, sun_direction
from ..utils.pytree import pytree_dataclass


@dataclass(frozen=True)
class RenderConfig:
    """Static pipeline configuration (the CameraMode analogue,
    strolle/src/camera.rs:83-168, plus the hard-coded constants of
    SURVEY.md §5.6 worth overriding)."""

    mode: str = "image"  # image|di_diffuse|di_specular|gi_diffuse|
    #                      gi_specular|reference|bvh_heatmap
    denoise: bool = True
    needs_di: bool = True
    needs_gi: bool = True
    include_sky: bool = False  # evaluate atmosphere for miss pixels
    # Force the jnp trace path so jax.grad flows end-to-end (the fused
    # Pallas surface kernel has no VJP). Gradients take the custom-VJP
    # semantics of restir.reservoir.resampling_weight and
    # denoise.svgf._wavelet_core: resampling statistics and a-trous
    # weights are detached; radiance is differentiated straight-through.
    differentiable: bool = False
    #: Algorithmic knobs (SURVEY.md §5.6); defaults are reference-exact.
    #: Hashable + static under jit: each distinct Tuning traces its own
    #: stage programs, so knobs cost nothing at runtime.
    tuning: Tuning = DEFAULT_TUNING


@pytree_dataclass
class RenderState:
    """Temporal state carried frame-to-frame (the per-camera buffers of
    camera_controller/buffers.rs that outlive one frame)."""

    frame: jnp.ndarray  # i32[]
    prev_camera: Camera
    prev_surface: Surface  # [H, W]
    di_prev: DiReservoirs  # di[0]: resolved reservoirs
    gi_prev: GiReservoirs  # gi[0]: resolved reservoirs
    di_diff_denoiser: DenoiserState
    gi_diff_denoiser: DenoiserState


def _empty_surface(h: int, w: int) -> Surface:
    z = jnp.zeros((h, w), jnp.float32)
    z3 = jnp.zeros((h, w, 3), jnp.float32)
    return Surface(
        point=z3,
        dir=z3,
        normal=z3,
        uv=jnp.zeros((h, w, 2), jnp.float32),
        tri=jnp.full((h, w), -1, jnp.int32),
        material_id=jnp.zeros((h, w), jnp.int32),
        base_color=jnp.zeros((h, w, 4), jnp.float32),
        emissive=z3,
        metallic=z,
        roughness=z,
        reflectance=z,
        depth=z,
        is_some=jnp.zeros((h, w), bool),
    )


def init_state(camera: Camera) -> RenderState:
    h, w = camera.height, camera.width
    return RenderState(
        frame=jnp.asarray(0, jnp.int32),
        prev_camera=camera,
        prev_surface=_empty_surface(h, w),
        di_prev=DiReservoirs.empty((h, w)),
        gi_prev=GiReservoirs.empty((h, w)),
        di_diff_denoiser=DenoiserState.empty((h, w)),
        gi_diff_denoiser=DenoiserState.empty((h, w)),
    )


def derive_seed(seed, k: int):
    """Per-pass seed (the reference rolls a fresh random seed per pass,
    camera_controller.rs:189-194; we derive deterministically)."""
    mix = jnp.uint32((0x9E3779B9 * (k + 1)) & 0xFFFFFFFF)
    s, _ = rng.next_u32(jnp.asarray(seed, jnp.uint32) + mix)
    return s


def render_frame(
    scene: Scene,
    camera: Camera,
    state: RenderState,
    seed,
    config: RenderConfig = RenderConfig(),
    luts=None,
    mesh=None,
):
    """Renders one frame; returns (channels dict, new state).

    ``mesh``: optional jax.sharding.Mesh — when given, every ray-trace
    inside the stage programs runs under shard_map with pixel rows
    sharded over the mesh (ops.trace.trace_rows_sharded), so the fused
    Pallas kernels execute per shard on real multi-chip hardware. The
    cross-pixel stages (reprojection, spatial resampling, SVGF) stay
    GSPMD-partitioned and remain bit-identical to the single-device
    render (tests/test_sharding.py).

    ``luts``: optional AtmosphereLuts (sky/atmosphere.luts_for) — used
    for miss-pixel radiance and GI sky sampling. When omitted they are
    fetched from the sun-altitude-keyed host cache, mirroring the
    reference's LUT regeneration policy (passes/atmosphere.rs:76-112).
    Evaluating the atmosphere analytically per pixel instead is never
    acceptable inside the frame program: the inlined 16x8-step march
    inflates the executable ~100x (compile time and program bloat; the
    round-4 claim that such a dispatch also permanently degraded the
    process no longer reproduces — tests/test_runtime_protocol.py).

    Dispatch granularity (round 5): `render_frame` builds the frame
    from per-stage jitted programs (prelude / DI / GI / SVGF /
    composition — incremental compiles, per-stage profiling with
    pbench.py), but the production loop should call
    `render_frame_fused`, which traces the SAME code as ONE program.
    Round 1-4 ran per-stage out of necessity — the per-field gather
    expression of that era collapsed XLA's operand staging in large
    programs (a monolithic frame then cost seconds); with row-batched
    gathers (ops/gather.py) the fused program compiles fine and saves
    ~7 ms of tunnel overhead per stage boundary (measured
    staged-vs-fused delta, mbench.py vs rbench.py).

    Note (round 1 -> 2 behavior change): the GI pipeline now always
    receives LUTs when the sky is needed — `include_sky=False` no
    longer selects the analytic GI sky path, so default-config GI
    radiance shifted numerically vs round 1 (this matches upstream's
    LUT policy; regenerate any golden images)."""
    if luts is None and (config.include_sky or config.needs_gi):
        alt = scene.sun_altitude
        if not isinstance(alt, jax.core.Tracer):
            from ..sky.atmosphere import luts_for

            luts = luts_for(float(alt))
        else:
            import warnings

            warnings.warn(
                "render_frame traced with a Tracer sun_altitude and no "
                "luts: the analytic sky march would be inlined into the "
                "frame program (~100x program bloat). Pass "
                "luts=luts_for(alt) explicitly.",
                stacklevel=2,
            )

    use_pallas = False if config.differentiable else None
    frame = state.frame
    surf, reproj, sky, bn_first, bn_second = _stage_prelude(
        scene, camera, state.prev_camera, state.prev_surface, frame, luts,
        config.include_sky, use_pallas, mesh,
    )

    h, w = camera.height, camera.width
    zeros4 = jnp.zeros((h, w, 4), jnp.float32)
    di_diff, di_spec = zeros4, zeros4
    gi_diff, gi_spec = zeros4, zeros4
    di_prev = state.di_prev
    gi_prev = state.gi_prev

    # DI temporal and GI reprojection both gather their history at the
    # SAME reprojected coordinates; when both run, share ONE
    # row-batched take (a take's cost is flat in the field count but
    # ~5 ms each at 800x608 — ops/gather.py)
    di_pre = gi_pre = None
    if config.needs_di and config.needs_gi:
        di_rhs, gi_rep, rhs_surf = _stage_history(
            camera, reproj, state.di_prev, state.gi_prev,
            state.prev_surface,
        )
        di_pre = (di_rhs, rhs_surf)
        gi_pre = (gi_rep, rhs_surf)

    if config.needs_di:
        di_diff, di_spec, di_prev = _stage_di(
            scene, camera, surf, state.prev_surface, reproj,
            state.di_prev, seed, frame, bn_first, sky, config.tuning,
            mesh, use_pallas, di_pre,
        )
    if config.needs_gi:
        gi_diff, gi_spec, gi_prev = _stage_gi(
            scene, camera, surf, state.prev_surface, reproj,
            state.gi_prev, seed, frame, bn_second, luts, use_pallas,
            config.tuning, mesh, gi_pre,
        )

    # --- denoising (SVGF on the diffuse channels; spec is not denoised,
    # README.md:40) -----------------------------------------------------
    di_den = state.di_diff_denoiser
    gi_den = state.gi_diff_denoiser
    if config.denoise and config.needs_di and config.needs_gi:
        # both channels denoise in one program with a shared history
        # fetch (denoise.svgf.denoise_pair)
        (di_diff_rgb, di_den), (gi_diff_rgb, gi_den) = _stage_denoise_pair(
            di_diff, gi_diff, surf, reproj, state.di_diff_denoiser,
            state.gi_diff_denoiser, frame, config.tuning,
        )
    else:
        if config.denoise and config.needs_di:
            di_diff_rgb, di_den = _stage_denoise(
                di_diff, surf, reproj, state.di_diff_denoiser, frame, "di",
                config.tuning,
            )
        else:
            di_diff_rgb = di_diff[..., :3]
        if config.denoise and config.needs_gi:
            gi_diff_rgb, gi_den = _stage_denoise(
                gi_diff, surf, reproj, state.gi_diff_denoiser, frame, "gi",
                config.tuning,
            )
        else:
            gi_diff_rgb = gi_diff[..., :3]

    channels = _stage_compose(surf, di_diff_rgb, gi_diff_rgb, di_spec, gi_spec)

    new_state = RenderState(
        frame=frame + 1,
        prev_camera=camera,
        prev_surface=surf,
        di_prev=di_prev,
        gi_prev=gi_prev,
        di_diff_denoiser=di_den,
        gi_diff_denoiser=gi_den,
    )
    return channels, new_state


@partial(jax.jit, static_argnames=("include_sky", "use_pallas", "mesh"))
def _stage_prelude(
    scene, camera, prev_camera, prev_surface, frame, luts, include_sky,
    use_pallas=None, mesh=None,
):
    """G-buffer + reprojection map + miss-pixel sky + blue noise."""
    from ..ops.trace import trace_rows_sharded

    h, w = camera.height, camera.width
    with trace_rows_sharded(mesh):
        surf, velocity = primary_pass(scene, camera, prev_camera, use_pallas)
    reproj = build_reprojection_map(camera, surf, prev_surface, velocity)

    if include_sky:
        from ..camera import pixel_rays

        sun = sun_direction(scene.sun_azimuth, scene.sun_altitude)
        _, prim_d = pixel_rays(camera, screen_grid(camera))
        if luts is not None:
            from ..sky.atmosphere import sample_atmosphere

            sky = sample_atmosphere(luts, sun, prim_d)
        else:
            sky = sample_sky(sun, prim_d)
    else:
        sky = jnp.zeros((h, w, 3), jnp.float32)

    bn1x, bn1y, bn2x, bn2y = bluenoise.sample_pair_screen(h, w, frame)
    bn_first = jnp.stack([bn1x, bn1y], axis=-1)
    bn_second = jnp.stack([bn2x, bn2y], axis=-1)
    return surf, reproj, sky, bn_first, bn_second


@jax.jit
def _stage_history(camera, reproj, di_prev, gi_prev, prev_surface):
    """The shared history fetch: one take at the reprojected coords
    serves DI temporal, GI reprojection, and the prev-surface taps."""
    from ..ops import gather

    rpx, rpy = reproj.prev_xy_round
    rx = jnp.clip(rpx, 0, camera.width - 1)
    ry = jnp.clip(rpy, 0, camera.height - 1)
    return gather.gather_tree((di_prev, gi_prev, prev_surface), ry, rx)


@partial(jax.jit, static_argnames=("tuning", "mesh", "use_pallas"))
def _stage_di(
    scene, camera, surf, prev_surface, reproj, di_prev, seed, frame,
    bn_first, sky, tuning=DEFAULT_TUNING, mesh=None, use_pallas=None,
    prefetched=None,
):
    """The four DI passes as one program."""
    from ..ops.trace import trace_rows_sharded

    with trace_rows_sharded(mesh):
        a = di_mod.di_sampling(
            scene, camera, surf, derive_seed(seed, 0), bn_first, tuning
        )
        b = di_mod.di_temporal(
            scene, camera, surf, prev_surface, reproj, a, di_prev,
            derive_seed(seed, 1), tuning, prefetched,
        )
        c = di_mod.di_spatial(
            scene, camera, surf, b, derive_seed(seed, 2), frame, tuning,
            use_pallas,
        )
        return di_mod.di_resolving(scene, camera, surf, c, sky)


@partial(jax.jit, static_argnames=("use_pallas", "tuning", "mesh"))
def _stage_gi(
    scene, camera, surf, prev_surface, reproj, gi_prev, seed, frame,
    bn_second, luts, use_pallas=None, tuning=DEFAULT_TUNING, mesh=None,
    prefetched=None,
):
    from ..ops.trace import trace_rows_sharded

    with trace_rows_sharded(mesh):
        return gi_mod.gi_pipeline(
            scene, camera, surf, prev_surface, reproj, gi_prev, seed, frame,
            bn_second, luts, use_pallas, tuning, prefetched,
        )


@partial(jax.jit, static_argnames=("kind", "tuning"))
def _stage_denoise(samples, surf, reproj, den_state, frame, kind,
                   tuning=DEFAULT_TUNING):
    return denoise_channel(
        samples, surf, reproj, den_state, frame, kind=kind, tuning=tuning
    )


@partial(jax.jit, static_argnames=("tuning",))
def _stage_denoise_pair(di_samples, gi_samples, surf, reproj, di_state,
                        gi_state, frame, tuning=DEFAULT_TUNING):
    from ..denoise.svgf import denoise_pair

    return denoise_pair(
        di_samples, gi_samples, surf, reproj, di_state, gi_state, frame,
        tuning=tuning,
    )


@partial(jax.jit, static_argnames=("config", "mesh"))
def render_frame_fused(
    scene, camera, state, seed, config=RenderConfig(), luts=None, mesh=None
):
    """`render_frame` compiled as ONE program.

    The per-stage dispatch split exists for incremental compilation and
    profiling; on the tunneled TPU runtime each extra dispatch costs
    ~7 ms of enqueue overhead, so the production frame loop should use
    this fused entry (measured round 5: 170 -> 130 ms/frame on Cornell
    before the other fixes landed). First compile is slow (minutes) but
    lands in the persistent compilation cache.

    ``luts`` must be passed explicitly when the sky/GI is active —
    inside jit the sun altitude is a tracer, so the host-side LUT cache
    in render_frame cannot key on it (it would fall back to inlining
    the analytic sky march; see render_frame's docstring).
    """
    return render_frame(scene, camera, state, seed, config, luts, mesh)


@jax.jit
def _stage_compose(surf, di_diff_rgb, gi_diff_rgb, di_spec, gi_spec):
    """frame_composition.rs:38-79."""
    albedo = surf.base_color[..., :3]
    image = jnp.where(
        surf.is_some[..., None],
        surf.emissive
        + (di_diff_rgb + gi_diff_rgb) * albedo
        + di_spec[..., :3]
        + gi_spec[..., :3],
        di_diff_rgb,
    )
    return {
        "image": image,
        "di_diffuse": di_diff_rgb,
        "di_specular": di_spec[..., :3],
        "gi_diffuse": gi_diff_rgb,
        "gi_specular": gi_spec[..., :3],
        "albedo": albedo,
        "depth": surf.depth,
    }
