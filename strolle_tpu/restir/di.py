"""ReSTIR DI: initial candidates, temporal reuse, spatial reuse, resolve.

Stage-for-stage re-derivation of the reference DI pipeline
(strolle-shaders/src/di_{sampling,temporal_resampling,
spatial_resampling,resolving}.rs) with the reservoir-slot wiring of
SURVEY.md §3.3 expressed as dataflow:

    sampling               -> A   (fresh candidates, m = 1)
    temporal(prev=di0, A)  -> B
    spatial(B)             -> C   (checkerboarded half; other half = B)
    resolving(C)           -> di0' + demodulated diffuse/specular

Each stage is a pure [H, W]-batched function; there are no scratch
textures or pick/trace/sample kernel splits — the ray batches the
reference stages exist to build are just intermediate arrays here.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..camera import Camera, contain_xy, screen_xy
from ..ops import brdf, gather, math as vm, rng
from ..ops.hit import Surface
from ..ops.lights import (
    gather_light,
    radiance,
    shadow_ray_bnoise,
)
from ..ops.trace import trace_anyhit
from ..config import DEFAULT_TUNING, Tuning
from ..scene.types import LIGHT_NONE, Scene
from . import reservoir as rsv
from .mis import mis_eval
from .primary import Reprojection

#: DI temporal history clamp (di_temporal_resampling.rs:69).
DI_TEMPORAL_M_CLAMP = 64.0
#: RIS candidate count (ephemeral.rs:24-28).
DI_CANDIDATES = 16
#: Spatial search tries / initial radius (di_spatial_resampling.rs:55-99).
DI_SPATIAL_SAMPLES = 8
DI_SPATIAL_RADIUS = 128.0


def _white(surf: Surface) -> Surface:
    return surf.replace(base_color=jnp.ones_like(surf.base_color))


def di_sample_pdf(scene: Scene, light_id, light_point, surf: Surface, prev=False):
    """DiSample::pdf (reservoir/di.rs:96-117): luma of the light's
    radiance at the hit with white albedo; zero for dead lights or
    points outside the light sphere."""
    light = gather_light(scene.lights, light_id, prev=prev)
    rad = radiance(light, _white(surf))
    ok = (light.kind != LIGHT_NONE) & (
        vm.length(light.pos - light_point) <= light.radius
    )
    return jnp.where(ok & surf.is_some, vm.luma(rad.sum), 0.0)


def sample_shadow_ray(light_point, hit_point):
    """DiSample::ray (di.rs:119-123): from the stored light point toward
    the hit. Returns (origin, dir, length)."""
    d = hit_point - light_point
    length = vm.length(d)
    return light_point, d / jnp.maximum(length, 1e-20)[..., None], length


def _candidate_pdf_planes(scene: Scene, surf: Surface) -> jnp.ndarray:
    """perc_luma(Light::radiance) for EVERY light row at every pixel,
    as one batched [H, W, L] eval.

    The RIS loop below draws up to 16 candidates; evaluating the
    radiance formula per draw costs ~1 ms per iteration at 800x608
    (abench.py round 5: di_candidates 4 -> 1 saved 3.1 ms/frame on
    Cornell — per-iteration program overhead, not FLOPs). Evaluating
    all L <= capacity rows ONCE as a light-major broadcast and turning
    each draw into a one-hot select over L resident planes removes the
    per-draw radiance eval entirely; values are bitwise identical
    (the one-hot row fetch is exact, and f(row) then select equals
    select then f(row))."""
    from ..ops.lights import LightGather, _light_table

    table = _light_table(scene.lights, prev=False)  # [L, 13]
    lig = LightGather(
        pos=table[:, None, None, 0:3],
        radius=table[:, None, None, 3],
        color=table[:, None, None, 4:7],
        range=table[:, None, None, 7],
        kind=table[:, None, None, 8].astype(jnp.int32),
        spot_dir=table[:, None, None, 9:12],
        spot_angle=table[:, None, None, 12],
    )
    white = _white(surf)
    bsurf = white.replace(
        point=white.point[None],
        normal=white.normal[None],
        dir=white.dir[None],
        base_color=white.base_color[None],
        metallic=white.metallic[None],
        roughness=white.roughness[None],
        reflectance=white.reflectance[None],
    )
    rad = radiance(lig, bsurf)  # [L, H, W, 3] (brdf terms are dead code)
    return jnp.moveaxis(vm.perc_luma(rad.radiance), 0, -1)  # [H, W, L]


def di_sampling(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    seed,
    bnoise_sample,  # f32[H, W, 2] blue-noise pair for the shadow ray
    tuning: Tuning = DEFAULT_TUNING,
) -> rsv.DiReservoirs:
    """Initial candidate generation (di_sampling.rs): RIS over up to 16
    uniform light picks, then one blue-noise shadow ray; occluded
    candidates keep their sample but get w = 0."""
    shape = surf.depth.shape
    xs, ys = screen_xy(camera)
    state = rng.wnoise_new(seed, xs, ys)

    lcount = scene.lights.count
    max_samples = jnp.minimum(lcount, tuning.di_candidates)
    sample_ipdf = lcount.astype(jnp.float32)

    eph = rsv.DiReservoirs.empty(shape)
    eph_pdf = jnp.zeros(shape, jnp.float32)

    cap = scene.lights.capacity
    pdf_all = _candidate_pdf_planes(scene, surf)  # [H, W, cap]
    lane = jnp.arange(cap, dtype=jnp.int32)

    # candidates beyond the light-buffer capacity are statically dead
    # (max_samples <= capacity), so don't trace them
    for nth in range(min(tuning.di_candidates, cap)):
        state, word = rng.next_u32(state)
        light_id = (word % jnp.maximum(lcount, 1).astype(jnp.uint32)).astype(
            jnp.int32
        )
        cand_pdf = jnp.sum(
            jnp.where(light_id[..., None] == lane, pdf_all, 0.0), axis=-1
        )
        cand = eph.replace(light_id=light_id, pdf=cand_pdf)
        enabled = (nth < max_samples) & surf.is_some
        state, eph, accepted = rsv.update(
            state, eph, cand, cand_pdf * sample_ipdf, enabled
        )
        eph_pdf = jnp.where(accepted, cand_pdf, eph_pdf)

    eph = rsv.norm_avg(eph, eph_pdf)

    # one shadow ray for the winning light (blue-noise disk sample)
    light = gather_light(scene.lights, eph.light_id)
    sr_o, sr_d, sr_len = shadow_ray_bnoise(bnoise_sample, light, surf.point)
    occluded = trace_anyhit(scene, sr_o, sr_d, sr_len)

    valid = (eph.m > 0.0) & surf.is_some
    return rsv.DiReservoirs(
        m=jnp.where(valid, 1.0, 0.0),
        w=jnp.where(valid & ~occluded, eph.w, 0.0),
        pdf=jnp.zeros(shape, jnp.float32),
        confidence=jnp.zeros(shape, jnp.float32),
        light_id=jnp.where(valid, eph.light_id, 0),
        light_point=jnp.where(valid[..., None], sr_o, 0.0),
        is_occluded=occluded & valid,
    )


def di_temporal(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    prev_surf: Surface,
    reproj: Reprojection,
    curr: rsv.DiReservoirs,
    prev: rsv.DiReservoirs,
    seed,
    tuning: Tuning = DEFAULT_TUNING,
    prefetched=None,
) -> rsv.DiReservoirs:
    """Temporal merge with reprojected history
    (di_temporal_resampling.rs): M clamp 64, light kill/remap handling,
    defensive pairwise MIS, norm_mis.

    ``prefetched``: optional (rhs, rhs_surf) already gathered at the
    reprojected position (models.restir fetch_history shares ONE
    row-batched take between the DI and GI temporal paths — they index
    the same coordinates)."""
    xs, ys = screen_xy(camera)
    state = rng.wnoise_new(seed, xs, ys)
    shape = surf.depth.shape

    lhs = curr.replace(
        pdf=jnp.where(
            ~curr.is_empty,
            di_sample_pdf(scene, curr.light_id, curr.light_point, surf),
            curr.pdf,
        )
    )

    # fetch history + prev surface at the reprojected position in ONE
    # row-batched take (ops/gather.py: per-take cost is flat in the
    # field count, so the two trees share the gather)
    has_rep = reproj.is_some
    if prefetched is not None:
        rhs, rhs_surf = prefetched
    else:
        rpx, rpy = reproj.prev_xy_round
        rx = jnp.clip(rpx, 0, camera.width - 1)
        ry = jnp.clip(rpy, 0, camera.height - 1)
        rhs, rhs_surf = gather.gather_tree((prev, prev_surf), ry, rx)
    rhs = rsv.select(has_rep, rhs, rsv.DiReservoirs.empty(shape))
    rhs = rsv.clamp_m(rhs, tuning.di_temporal_m_clamp)

    # light slot lifecycle (lights.rs kill/remap protocol)
    lid = jnp.clip(rhs.light_id, 0, scene.lights.capacity - 1)
    killed = (scene.lights.killed[lid] != 0) & ~rhs.is_empty
    remapped = scene.lights.remap[lid]
    rhs = rhs.replace(
        w=jnp.where(killed, 0.0, rhs.w),
        light_id=jnp.where(
            (remapped >= 0) & ~killed & ~rhs.is_empty, remapped, rhs.light_id
        ),
    )

    lhs_rhs_pdf = jnp.where(
        (lhs.m > 0.0) & rhs_surf.is_some,
        di_sample_pdf(scene, lhs.light_id, lhs.light_point, rhs_surf, prev=True),
        0.0,
    )
    rhs_lhs_pdf = jnp.where(
        (rhs.m > 0.0) & ~killed,
        di_sample_pdf(scene, rhs.light_id, rhs.light_point, surf),
        0.0,
    )

    mis = mis_eval(
        lhs_m=lhs.m,
        rhs_m=rhs.m,
        rhs_jacobian=jnp.ones(shape, jnp.float32),
        lhs_lhs_pdf=lhs.pdf,
        lhs_rhs_pdf=lhs_rhs_pdf,
        rhs_lhs_pdf=rhs_lhs_pdf,
        rhs_rhs_pdf=rhs.pdf,
    )

    main = rsv.DiReservoirs.empty(shape)
    main_pdf = jnp.zeros(shape, jnp.float32)
    state, main, acc = rsv.update(
        state, main, lhs, mis.lhs_mis * mis.lhs_pdf * lhs.w
    )
    main_pdf = jnp.where(acc, mis.lhs_pdf, main_pdf)
    state, main, acc = rsv.update(
        state, main, rhs, mis.rhs_mis * mis.rhs_pdf * rhs.w
    )
    main_pdf = jnp.where(acc, mis.rhs_pdf, main_pdf)

    main = main.replace(
        m=lhs.m + mis.m,
        pdf=main_pdf,
        confidence=jnp.where(killed, 0.0, 1.0),
    )
    main = rsv.norm_mis(main, main_pdf)
    # pixels with no primary hit keep an empty reservoir
    return rsv.select(surf.is_some, main, rsv.DiReservoirs.empty(shape))


def _gather_surface(surf: Surface, y, x) -> Surface:
    return gather.gather_tree(surf, y, x)


def checkerboard_active(camera: Camera, frame) -> jnp.ndarray:
    """Mask of pixels processed by the spatial pass this frame
    (resolve_checkerboard_alt coverage, utils.rs:33-43): x parity equals
    (frame/2 + 1 + y) % 2."""
    xs, ys = screen_xy(camera)
    parity = (jnp.asarray(frame, jnp.int32) // 2 + 1 + ys) % 2
    return (xs % 2) == parity


def _probe_kernel_enabled(use_pallas) -> bool:
    """The fused Pallas probe runs on TPU (or interpret mode), outside
    any shard_map trace context (a pallas_call cannot be GSPMD-
    partitioned over a screen-sharded mesh) and outside the
    differentiable path (the probe's discrete decisions carry no
    gradient, but the jnp loop keeps jac/weight tangents flowing)."""
    import os

    from ..ops.trace import _TRACE_MESH, _pallas_available

    return (
        os.environ.get("STROLLE_PROBE_KERNEL", "0") == "1"
        and use_pallas is not False
        and _pallas_available()
        and _TRACE_MESH.get() is None
    )


def _draw_probe_tables(seed_u, tries, radii, n_var, margin):
    """The per-try shared offset tables, concatenated [tries * V] —
    exactly the draws the jnp probe loop makes."""
    from ..ops import offsets as shoff

    dys, dxs = [], []
    for nth in range(tries):
        dy, dx = shoff.draw_offset_table(
            seed_u ^ jnp.uint32((0x9E3779B9 * (nth + 1)) & 0xFFFFFFFF),
            radii, n_var, margin=margin,
        )
        dys.append(dy)
        dxs.append(dx)
    return jnp.concatenate(dys), jnp.concatenate(dxs)


def di_spatial(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    res: rsv.DiReservoirs,
    seed,
    frame,
    tuning: Tuning = DEFAULT_TUNING,
    use_pallas: bool | None = None,
) -> rsv.DiReservoirs:
    """Checkerboarded spatial reuse (di_spatial_resampling.rs): pick one
    similar neighbor in <= 8 tries (radius 128 px halving to >= 5 on
    rejection, depth within 33%, normal dot >= 0.33), trace both
    cross-visibility rays, merge with visibility-weighted MIS. The
    non-active checkerboard half passes through unchanged.

    Neighbor probing uses the shared-offset reformulation
    (ops/offsets.py): per try, each pixel picks a fresh shared disk
    offset at its adaptive radius level. On TPU the whole probe loop
    runs as ONE Pallas stencil kernel over halo'd VMEM windows
    (ops/pallas/probe_kernels.py, bit-compatible with the jnp loop);
    elsewhere the gate fetches are shifted selects in XLA."""
    from ..ops import offsets as shoff

    h, w = surf.depth.shape
    xs, ys = screen_xy(camera)
    state = rng.wnoise_new(seed, xs, ys)
    shape = (h, w)
    active = checkerboard_active(camera, frame)

    lhs = res

    radii = shoff.radius_levels(tuning.di_spatial_radius)
    n_lvls = len(radii)
    n_var = 2
    margin = shoff.probe_margin(tuning.di_spatial_radius, h, w)
    seed = jnp.asarray(seed, jnp.uint32)

    if _probe_kernel_enabled(use_pallas):
        from ..ops.trace import _interpret
        from ..ops.pallas.probe_kernels import probe_spatial_pallas

        dy_tab, dx_tab = _draw_probe_tables(
            seed, tuning.di_spatial_samples, radii, n_var, margin
        )
        stack = jnp.stack(
            [
                surf.depth,
                surf.normal[..., 0],
                surf.normal[..., 1],
                surf.normal[..., 2],
                surf.is_some.astype(jnp.float32),
                res.m,
            ],
            axis=0,
        )
        oy, ox, done = probe_spatial_pallas(
            stack, dy_tab, dx_tab, seed,
            mode="di", tries=tuning.di_spatial_samples, n_var=n_var,
            n_lvls=n_lvls, margin=margin, depth_tol=0.33, normal_min=0.33,
            interpret=_interpret(),
        )
        cx, cy = contain_xy(camera, xs + ox, ys + oy)
        rhs_x = jnp.where(done, cx, 0)
        rhs_y = jnp.where(done, cy, 0)
        # the kernel consumed one word per try from the per-pixel
        # stream; advance the XLA-side state identically so the merge
        # RNG below stays bit-equal with the jnp path
        for _ in range(tuning.di_spatial_samples):
            state, _ = rng.next_u32(state)
    else:
        done = jnp.zeros(shape, bool)
        rhs_x = jnp.zeros(shape, jnp.int32)
        rhs_y = jnp.zeros(shape, jnp.int32)
        # is_some and the m > 0 test ride ONE gate plane (0 = sky,
        # 1 = surface with empty reservoir, 2 = surface + m > 0): the
        # probe cost is planes x variants, and m's VALUE is never used
        gate = jnp.where(
            surf.is_some, jnp.where(res.m > 0.0, 2.0, 1.0), 0.0
        )
        probe = shoff.SharedOffsetTaps(
            (surf.depth, surf.normal, gate), margin=margin
        )
        level = jnp.zeros(shape, jnp.int32)
        for nth in range(tuning.di_spatial_samples):
            dy, dx = shoff.draw_offset_table(
                seed ^ jnp.uint32((0x9E3779B9 * (nth + 1)) & 0xFFFFFFFF),
                radii, n_var, margin=margin,
            )
            state, word = rng.next_u32(state)
            sel = level * n_var + (word % jnp.uint32(n_var)).astype(jnp.int32)
            # by try nth the level walk has descended <= nth levels, so
            # only the first n_var*(nth+1) table entries are reachable
            kmax = n_var * (nth + 1)
            c_depth, c_normal, c_gate = probe.take(dy, dx, sel, kmax=kmax)
            oy, ox = probe.offset_of(dy, dx, sel, kmax=kmax)
            cx, cy = contain_xy(camera, xs + ox, ys + oy)
            same = (cx == xs) & (cy == ys)
            depth_bad = jnp.abs(c_depth - surf.depth) > 0.33 * surf.depth
            normal_bad = vm.dot(c_normal, surf.normal) < 0.33
            gate_fail = (c_gate < 1.0) | depth_bad | normal_bad
            shrink = ~done & ~same & gate_fail
            level = jnp.where(shrink, jnp.minimum(level + 1, n_lvls - 1), level)
            accept = ~done & ~same & ~gate_fail & (c_gate >= 2.0)
            rhs_x = jnp.where(accept, cx, rhs_x)
            rhs_y = jnp.where(accept, cy, rhs_y)
            done = done | accept

    found = done & active & surf.is_some
    rhs, rhs_surf = gather.gather_tree((res, surf), rhs_y, rhs_x)
    rhs = rsv.select(found, rhs, rsv.DiReservoirs.empty(shape))

    lhs_rhs_pdf = jnp.where(
        found, di_sample_pdf(scene, lhs.light_id, lhs.light_point, rhs_surf), 0.0
    )
    rhs_lhs_pdf = jnp.where(
        found, di_sample_pdf(scene, rhs.light_id, rhs.light_point, surf), 0.0
    )

    # cross-visibility rays (the reference's pick->trace scratch round-trip)
    a_o, a_d, a_len = sample_shadow_ray(lhs.light_point, rhs_surf.point)
    b_o, b_d, b_len = sample_shadow_ray(rhs.light_point, surf.point)
    a_len = jnp.where(found & (lhs_rhs_pdf > 0.0), a_len, 0.0)
    b_len = jnp.where(found & (rhs_lhs_pdf > 0.0), b_len, 0.0)
    from ..ops import checkerboard as cb

    if cb.compaction_pays(scene, w):
        # ``found`` lives on one checkerboard half (checkerboard_active
        # parity), so both candidate rays pack into ONE full-width
        # anyhit pass (ops/checkerboard.paired_anyhit): half the trace
        parity = cb.row_parity(
            jnp.asarray(frame, jnp.int32) // 2 + 1, h
        )
        a_occ, b_occ = cb.paired_anyhit(
            trace_anyhit, scene, parity,
            (a_o, a_d, a_len), (b_o, b_d, b_len),
        )
    else:
        a_occ = trace_anyhit(scene, a_o, a_d, a_len)
        b_occ = trace_anyhit(scene, b_o, b_d, b_len)
    lhs_rhs_vis = jnp.where(a_occ, 0.0, 1.0)
    rhs_lhs_vis = jnp.where(b_occ, 0.0, 1.0)

    mis = mis_eval(
        lhs_m=lhs.m,
        rhs_m=rhs.m,
        rhs_jacobian=jnp.ones(shape, jnp.float32),
        lhs_lhs_pdf=lhs.pdf,
        lhs_rhs_pdf=lhs_rhs_pdf * lhs_rhs_vis,
        rhs_lhs_pdf=rhs_lhs_pdf * rhs_lhs_vis,
        rhs_rhs_pdf=rhs.pdf,
    )

    main = rsv.DiReservoirs.empty(shape)
    main_pdf = jnp.zeros(shape, jnp.float32)
    state, main, acc = rsv.update(
        state, main, lhs, mis.lhs_mis * mis.lhs_pdf * lhs.w
    )
    main_pdf = jnp.where(acc, mis.lhs_pdf, main_pdf)
    state, main, acc = rsv.update(
        state, main, rhs, mis.rhs_mis * mis.rhs_pdf * rhs.w
    )
    main_pdf = jnp.where(acc, mis.rhs_pdf, main_pdf)
    # NOTE: the reference sets the merged sample's occlusion flag from
    # the *lhs@rhs* visibility here (di_spatial_resampling.rs:270-276);
    # replicated as-is.
    main = main.replace(
        is_occluded=jnp.where(acc, lhs_rhs_vis == 0.0, main.is_occluded)
    )

    main = main.replace(m=lhs.m + mis.m, pdf=main_pdf)
    main = rsv.norm_mis(main, main_pdf)

    return rsv.select(found, main, lhs)


def di_resolving(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    res: rsv.DiReservoirs,
    sky_radiance: jnp.ndarray,  # f32[H, W, 3] atmosphere for miss pixels
):
    """Final DI shade (di_resolving.rs): re-trace the winning shadow
    ray, derive temporal confidence (0 where the occlusion flag
    flipped), output demodulated diffuse + specular with confidence in
    alpha, and persist the reservoir as next frame's history."""
    sr_o, sr_d, sr_len = sample_shadow_ray(res.light_point, surf.point)
    sr_len = jnp.where(surf.is_some, sr_len, 0.0)
    is_occluded = trace_anyhit(scene, sr_o, sr_d, sr_len)

    confidence = jnp.where(
        res.is_occluded == is_occluded, res.confidence, 0.0
    )
    out_res = res.replace(
        confidence=jnp.where(surf.is_some, 1.0, res.confidence),
        is_occluded=jnp.where(surf.is_some, is_occluded, res.is_occluded),
    )

    light = gather_light(scene.lights, res.light_id)
    rad = radiance(light, surf)
    lit = surf.is_some & ~is_occluded
    rad_rgb = jnp.where(lit[..., None], rad.radiance * res.w[..., None], 0.0)
    spec_brdf = jnp.where(lit[..., None], rad.spec_brdf, 0.0)

    # sky pixels: atmosphere radiance with diff_brdf = 1 (resolving.rs:93-101)
    rad_rgb = jnp.where(surf.is_some[..., None], rad_rgb, sky_radiance)
    confidence = jnp.where(surf.is_some, confidence, 1.0)

    diff_brdf = (1.0 - surf.metallic) / jnp.pi
    diff = rad_rgb * diff_brdf[..., None]
    spec = rad_rgb * spec_brdf

    diff_out = jnp.concatenate([diff, confidence[..., None]], axis=-1)
    spec_out = jnp.concatenate([spec, confidence[..., None]], axis=-1)
    return diff_out, spec_out, out_res
