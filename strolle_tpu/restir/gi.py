"""ReSTIR GI: one-bounce indirect lighting with reservoir reuse.

Stage-for-stage re-derivation of the reference GI pipeline
(strolle-shaders/src/gi_*.rs) with the gi[0..3] slot rotation of
SURVEY.md §3.3 expressed as dataflow:

    reproject(gi0)                  -> rep      (gi[2])
    sampling a+b (rep)              -> cand     (gi[1], covered pixels)
    temporal(cand, rep)             -> t        (gi[1])
    [odd tracing frames] spatial(t) -> s        (gi[2]); source = s|t
    preview1(source, r=128)         -> p1       (gi[3])
    preview2(p1, r=64)              -> p2       (gi[0])
    resolve: shade from p2, persist `source` as next frame's history

Temporal amortization follows frame.rs:20-26: frames 0-3 of each
6-frame cycle trace new BRDF rays on a checkerboard half; frames 4-5
replay stored reservoir rays (RNG state is carried inside the sample)
and validate radiance, overwriting stale samples in place
(gi_temporal_resampling.rs:80-101 bias-control strategy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..camera import Camera, contain_xy, screen_xy
from ..ops import brdf, gather, math as vm, rng
from ..ops.hit import Surface
from ..ops.lights import gather_light, radiance, shadow_ray_wnoise
from ..ops.trace import trace_anyhit, trace_surface
from ..config import DEFAULT_TUNING, Tuning
from ..scene.types import Scene
from ..sky.atmosphere import SUN_DISTANCE, sample_sky, sun_direction
from ..utils.pytree import pytree_dataclass
from .mis import mis_eval
from .primary import Reprojection

GI_TEMPORAL_M_CLAMP = 128.0
GI_W_CLAMP = 5.0
GI_JACOBIAN_REJECT = 10.0
GI_JACOBIAN_CLAMP = 3.0
GI_SPATIAL_SAMPLES = 8
GI_SPATIAL_RADIUS = 128.0
GI_VALIDATION_THRESHOLD = 0.33
SKY_SAMPLE_PROB = 0.25


def is_gi_tracing(frame) -> jnp.ndarray:
    """frame.rs:20-26: 6-frame cycle, frames 0-3 trace, 4-5 validate."""
    return (jnp.asarray(frame, jnp.int32) % 6) < 4


@pytree_dataclass
class GiReservoirs:
    """Per-pixel GI reservoirs (reservoir/gi.rs GiReservoir+GiSample)."""

    m: jnp.ndarray  # f32[...]
    w: jnp.ndarray  # f32[...]
    pdf: jnp.ndarray  # f32[...]
    confidence: jnp.ndarray  # f32[...]
    rng: jnp.ndarray  # u32[...]  stored RNG state for replay
    radiance: jnp.ndarray  # f32[..., 3]
    v1_point: jnp.ndarray  # f32[..., 3]
    v2_point: jnp.ndarray  # f32[..., 3]
    v2_normal: jnp.ndarray  # f32[..., 3]

    @property
    def is_empty(self) -> jnp.ndarray:
        return self.m == 0.0

    @property
    def exists(self) -> jnp.ndarray:
        """GiSample::exists: v2_point != 0."""
        return jnp.any(self.v2_point != 0.0, axis=-1)

    @staticmethod
    def empty(shape) -> "GiReservoirs":
        z = jnp.zeros(shape, jnp.float32)
        z3 = jnp.zeros(shape + (3,), jnp.float32)
        return GiReservoirs(
            m=z, w=z, pdf=z, confidence=z,
            rng=jnp.zeros(shape, jnp.uint32),
            radiance=z3, v1_point=z3, v2_point=z3, v2_normal=z3,
        )

    def gather(self, y, x) -> "GiReservoirs":
        return gather.gather_tree(self, y, x)


def select(mask, a: GiReservoirs, b: GiReservoirs) -> GiReservoirs:
    def sel(x, y):
        m = mask[..., None] if x.ndim > mask.ndim else mask
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


_SAMPLE_FIELDS = ("pdf", "rng", "radiance", "v1_point", "v2_point", "v2_normal")


def _select_sample(mask, cand: GiReservoirs, res: GiReservoirs) -> GiReservoirs:
    updates = {}
    for f in _SAMPLE_FIELDS:
        a = getattr(cand, f)
        b = getattr(res, f)
        m = mask[..., None] if a.ndim > mask.ndim else mask
        updates[f] = jnp.where(m, a, b)
    return res.replace(**updates)


def update(state, res: GiReservoirs, cand: GiReservoirs, weight, enabled=None):
    weight = jnp.asarray(weight, jnp.float32)
    if enabled is None:
        enabled = jnp.ones(weight.shape, bool)
    m = res.m + 1.0
    w = res.w + weight
    state, u = rng.next_f32(state)
    accept = (u * w < weight) & enabled
    out = res.replace(
        m=jnp.where(enabled, m, res.m), w=jnp.where(enabled, w, res.w)
    )
    out = _select_sample(accept, cand, out)
    return state, out, accept


def merge(state, res: GiReservoirs, rhs: GiReservoirs, pdf, enabled=None):
    ok = rhs.m > 0.0
    if enabled is not None:
        ok = ok & enabled
    res2 = res.replace(m=jnp.where(ok, res.m + rhs.m - 1.0, res.m))
    return update(state, res2, rhs, rhs.w * rhs.m * pdf, ok)


def _norm(res: GiReservoirs, pdf, denom_extra) -> GiReservoirs:
    from .reservoir import resampling_weight

    num = jnp.ones_like(res.w)
    denom_extra = jnp.broadcast_to(
        jnp.asarray(denom_extra, jnp.float32), res.w.shape
    )
    return res.replace(w=resampling_weight(res.w, pdf, num, denom_extra))


def norm_mis(res, pdf):
    return _norm(res, pdf, 1.0)


def norm_avg(res, pdf):
    return _norm(res, pdf, res.m)


def clamp_w(res, mx=GI_W_CLAMP):
    return res.replace(w=jnp.minimum(res.w, mx))


# ---------------------------------------------------------------------------
# sample math (GiSample methods)
# ---------------------------------------------------------------------------


def sample_dir(res: GiReservoirs, point):
    return vm.normalize(res.v2_point - point)


def sample_cosine(res: GiReservoirs, surf: Surface):
    return jnp.maximum(vm.dot(sample_dir(res, surf.point), surf.normal), 0.0)


def sample_pdf(res: GiReservoirs, surf: Surface):
    """GiSample::pdf (gi.rs:98-112): luma(radiance) * cosine *
    (diffuse + specular brdf luma) with white albedo."""
    white = jnp.ones_like(surf.base_color)
    d = sample_dir(res, surf.point)
    diff = vm.luma(brdf.diffuse_eval(white, surf.metallic))
    spec = vm.luma(
        brdf.specular_eval(
            white, surf.metallic, surf.roughness, surf.reflectance,
            surf.normal, d, -surf.dir,
        )
    )
    pdf = vm.luma(res.radiance) * sample_cosine(res, surf) * (diff + spec)
    return jnp.where(res.exists & surf.is_some, pdf, 0.0)


def sample_ray(res: GiReservoirs, hit_point):
    """GiSample::ray: reconnection ray from the surface toward v2, with
    the -0.01 length backoff. Returns (origin, dir, length)."""
    d = res.v2_point - hit_point
    dist = vm.length(d)
    return (
        hit_point,
        d / jnp.maximum(dist, 1e-20)[..., None],
        jnp.maximum(dist - 0.01, 0.0),
    )


def _jacobian_partial(p, v2_point, v2_normal):
    vec = p - v2_point
    dist = vm.length(vec)
    cos = vm.saturate(
        vm.dot(v2_normal, vec / jnp.maximum(dist, 1e-20)[..., None])
    )
    return dist, cos


def jacobian_old_parts(v1_point, v2_point, v2_normal):
    """(od, oc) — the candidate-side half of the reconnection Jacobian.
    Pure functions of the candidate's own fields, so spatial probes can
    precompute them per pixel and probe TWO planes instead of
    v1_point's three (probing precomputed values commutes bitwise with
    computing on probed values)."""
    return _jacobian_partial(v1_point, v2_point, v2_normal)


def jacobian_apply(od, oc, v2_point, v2_normal, exists, new_hit_point):
    """Finish the Jacobian given precomputed (od, oc); bitwise equal to
    sample_jacobian on the reassembled candidate."""
    nd, nc = _jacobian_partial(new_hit_point, v2_point, v2_normal)
    x = nc * od * od
    y = oc * nd * nd
    j = jnp.where(y == 0.0, 0.0, x / jnp.where(y == 0.0, 1.0, y))
    return jnp.where(exists, j, 1.0)


def sample_jacobian(res: GiReservoirs, new_hit_point):
    """Reconnection-shift Jacobian (gi.rs:135-159)."""
    od, oc = jacobian_old_parts(res.v1_point, res.v2_point, res.v2_normal)
    return jacobian_apply(
        od, oc, res.v2_point, res.v2_normal, res.exists, new_hit_point
    )


# ---------------------------------------------------------------------------
# checkerboard coverage (utils.rs:33-43 + frame.rs schedule)
# ---------------------------------------------------------------------------


def got_checkerboard_at(xs, ys, f):
    """got_checkerboard_at(pos, f): x parity == (f + y) % 2."""
    f = jnp.asarray(f, jnp.int32)
    return (xs % 2) == ((f + ys) % 2)


def gi_coverage(xs, ys, frame):
    """Pixels traced by gi_sampling this frame (gi_sampling_a.rs:27-33)."""
    frame = jnp.asarray(frame, jnp.int32)
    return jnp.where(
        is_gi_tracing(frame),
        got_checkerboard_at(xs, ys, frame // 2),
        got_checkerboard_at(xs, ys, frame),
    )


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


def gi_reproject(
    camera: Camera, surf: Surface, reproj: Reprojection,
    gi_prev: GiReservoirs, prev_surf: Surface | None = None,
    prefetched=None,
):
    """gi_reprojection.rs: gather the previous reservoir at the
    reprojected position; confidence := 1, v1 := current hit point.

    When ``prev_surf`` is given it rides the same row-batched take (the
    temporal pass needs the prev-frame surface at the SAME index, and
    the take cost is flat in the field count — ops/gather.py); returns
    (rep, reprojected prev_surf or None). ``prefetched``: optional
    (rep_raw, rhs_surf) from models.restir fetch_history (the DI
    temporal pass gathers at the same coordinates; one take serves
    both)."""
    shape = surf.depth.shape
    if prefetched is not None:
        rep, rhs_surf = prefetched
    elif prev_surf is not None:
        rpx, rpy = reproj.prev_xy_round
        rx = jnp.clip(rpx, 0, camera.width - 1)
        ry = jnp.clip(rpy, 0, camera.height - 1)
        rep, rhs_surf = gather.gather_tree((gi_prev, prev_surf), ry, rx)
    else:
        rpx, rpy = reproj.prev_xy_round
        rx = jnp.clip(rpx, 0, camera.width - 1)
        ry = jnp.clip(rpy, 0, camera.height - 1)
        rep, rhs_surf = gi_prev.gather(ry, rx), None
    rep = select(reproj.is_some, rep, GiReservoirs.empty(shape))
    rep = rep.replace(
        confidence=jnp.ones(shape, jnp.float32),
        v1_point=surf.point,
    )
    return select(surf.is_some, rep, GiReservoirs.empty(shape)), rhs_surf


def _sky(luts, sun, d):
    if luts is not None:
        from ..sky.atmosphere import sample_atmosphere

        return sample_atmosphere(luts, sun, d)
    return sample_sky(sun, d)


def gi_sampling(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    rep: GiReservoirs,
    seed_a,
    seed_b,
    frame,
    luts=None,
    use_pallas: bool | None = None,
    tuning: Tuning = DEFAULT_TUNING,
) -> GiReservoirs:
    """gi_sampling_a + gi_sampling_b fused: trace the bounce ray (fresh
    BRDF sample on tracing frames; replayed reservoir ray on validation
    frames), then shade the secondary vertex with sky-vs-RIS light
    selection and one shadow ray. Covered pixels only; others empty."""
    shape = surf.depth.shape
    xs, ys = screen_xy(camera)
    tracing = is_gi_tracing(frame)
    covered = gi_coverage(xs, ys, frame)

    # --- part A: the bounce ray ---------------------------------------
    state_a = rng.wnoise_new(seed_a, xs, ys)
    state_a, brdf_dir, brdf_pdf, _brdf_rad = brdf.layered_sample(
        state_a,
        surf.base_color,
        surf.metallic,
        surf.roughness,
        surf.reflectance,
        surf.normal,
        -surf.dir,
    )
    replay_dir = sample_dir(rep, rep.v1_point)
    gi_dir = jnp.where(tracing, brdf_dir, replay_dir)
    gi_pdf = jnp.where(tracing, brdf_pdf, 1.0)
    gi_origin = jnp.where(tracing, surf.point, rep.v1_point)
    # lanes that produce no ray: uncovered; miss pixels when tracing;
    # empty reservoirs when validating
    active = covered & jnp.where(tracing, surf.is_some, ~rep.is_empty)

    # ``covered`` is one checkerboard half: compact the bounce rays to
    # [H, W/2] so the trace (and its in-kernel surface/atlas resolve)
    # costs half — the reference halves its dispatch the same way
    # (passes/gi_sampling.rs:72-77). Inactive lanes' results are
    # zeros/miss, exactly what the downstream `active` masks discard.
    from ..ops import checkerboard as cb

    cb_parity = None
    if cb.compaction_pays(scene, shape[1]):
        f_eff = jnp.where(
            is_gi_tracing(frame),
            jnp.asarray(frame, jnp.int32) // 2,
            jnp.asarray(frame, jnp.int32),
        )
        cb_parity = cb.row_parity(f_eff, shape[0])
        gi_surf_half = trace_surface(
            scene,
            cb.compact(cb_parity, gi_origin),
            cb.compact(cb_parity, gi_dir),
            regularize=True,
            use_pallas=use_pallas,
        )
        gi_surf = cb.expand_tree(cb_parity, gi_surf_half, 0)
    else:
        gi_surf = trace_surface(
            scene, gi_origin, gi_dir, regularize=True, use_pallas=use_pallas
        )

    # --- part B: shade the secondary vertex ---------------------------
    state_fresh = rng.wnoise_new(seed_b, xs, ys)
    state = jnp.where(tracing, state_fresh, rep.rng)
    rng0 = state  # stored in the sample for validation replay

    sun = sun_direction(scene.sun_azimuth, scene.sun_altitude)
    lcount = scene.lights.count
    atmosphere_pdf = jnp.where(
        scene.sun_altitude <= -1.0, 0.0, tuning.sky_sample_prob
    )

    state, u_sky = rng.next_f32(state)
    pick_sky = (lcount == 0) | (u_sky < atmosphere_pdf)

    # sky branch: hemisphere sample around the secondary normal
    sky_state, sky_dir = rng.sample_hemisphere(state, gi_surf.normal)
    sky_rad = _sky(luts, sun, sky_dir) * vm.dotk(gi_surf.normal, sky_dir)

    # light branch: ephemeral RIS over the lights at the secondary hit
    eph_state = state
    eph_m = jnp.zeros(shape, jnp.float32)
    eph_w = jnp.zeros(shape, jnp.float32)
    eph_pdf = jnp.zeros(shape, jnp.float32)
    eph_light = jnp.zeros(shape, jnp.int32)
    eph_rad = jnp.zeros(shape + (3,), jnp.float32)
    eph_spec = jnp.zeros(shape + (3,), jnp.float32)
    max_samples = jnp.minimum(lcount, tuning.di_candidates)
    ipdf = lcount.astype(jnp.float32)
    # statically dead beyond capacity (see di_sampling)
    for nth in range(min(tuning.di_candidates, scene.lights.capacity)):
        eph_state, word = rng.next_u32(eph_state)
        lid = (word % jnp.maximum(lcount, 1).astype(jnp.uint32)).astype(jnp.int32)
        lg = gather_light(scene.lights, lid)
        lr = radiance(lg, gi_surf)
        cpdf = vm.perc_luma(lr.radiance)
        enabled = nth < max_samples
        m = eph_m + 1.0
        w = eph_w + cpdf * ipdf
        eph_state, uu = rng.next_f32(eph_state)
        accept = (uu * w < cpdf * ipdf) & enabled
        eph_m = jnp.where(enabled, m, eph_m)
        eph_w = jnp.where(enabled, w, eph_w)
        eph_pdf = jnp.where(accept, cpdf, eph_pdf)
        eph_light = jnp.where(accept, lid, eph_light)
        eph_rad = jnp.where(accept[..., None], lr.radiance, eph_rad)
        eph_spec = jnp.where(accept[..., None], lr.spec_brdf, eph_spec)
    # norm_avg
    denom = eph_pdf * eph_m
    eph_w = jnp.where(denom == 0.0, 0.0, eph_w / jnp.where(denom == 0.0, 1.0, denom))

    light_ok = eph_w > 0.0
    light_pdf_l = jnp.where(
        light_ok, (1.0 / jnp.where(light_ok, eph_w, 1.0)) * (1.0 - atmosphere_pdf), 1.0
    )
    light_rad_l = jnp.where(
        light_ok[..., None], eph_rad * (1.0 + eph_spec), 0.0
    )

    # select branch (both consumed from the same base state; pick results)
    light_id = jnp.where(pick_sky, -1, jnp.where(light_ok, eph_light, 0))
    light_pdf = jnp.where(pick_sky, atmosphere_pdf, light_pdf_l)
    light_rad = jnp.where(pick_sky[..., None], sky_rad, light_rad_l)
    state = jnp.where(pick_sky, sky_state, eph_state)

    # secondary miss -> the bounce ray points at the sky directly
    miss = ~gi_surf.is_some
    light_id = jnp.where(miss, -1, light_id)
    light_pdf = jnp.where(miss, 1.0, light_pdf)
    light_rad = jnp.where(miss[..., None], _sky(luts, sun, gi_dir), light_rad)
    # The NEE/RIS sampling pdf is a sampling statistic: detached, like
    # the resampling weights (reservoir.resampling_weight) — gradients
    # follow the sampled radiance straight-through.
    light_pdf = jax.lax.stop_gradient(light_pdf)

    # shadow ray at the secondary vertex
    lg = gather_light(scene.lights, jnp.maximum(light_id, 0))
    state, w_o, w_d, w_len = shadow_ray_wnoise(state, lg, gi_surf.point)
    sky_o, sky_d = gi_surf.point, sky_dir
    sr_o = jnp.where((light_id < 0)[..., None], sky_o, w_o)
    sr_d = jnp.where((light_id < 0)[..., None], sky_d, w_d)
    sr_len = jnp.where(light_id < 0, jnp.inf, w_len)
    sr_len = jnp.where(miss | ~active | (light_pdf <= 0.0), 0.0, sr_len)
    if cb_parity is not None:
        # inactive lanes have sr_len == 0 (masked just above), so the
        # compacted half-width occlusion pass is exact
        occ_half = trace_anyhit(
            scene,
            cb.compact(cb_parity, sr_o),
            cb.compact(cb_parity, sr_d),
            cb.compact(cb_parity, sr_len),
        )
        occluded = cb.expand(cb_parity, occ_half, False)
    else:
        occluded = trace_anyhit(scene, sr_o, sr_d, sr_len)
    vis = jnp.where(occluded, 0.0, 1.0)

    rad = jnp.where(
        (light_pdf > 0.0)[..., None],
        light_rad * (vis / jnp.maximum(light_pdf, 1e-20))[..., None],
        0.0,
    )
    rad = jnp.where(
        gi_surf.is_some[..., None],
        rad * gi_surf.base_color[..., :3] / jnp.pi + gi_surf.emissive,
        rad,
    )

    # --- assemble the candidate reservoir -----------------------------
    v1 = jnp.where(tracing, surf.point, rep.v1_point)
    v2 = jnp.where(
        gi_surf.is_some[..., None], gi_surf.point, v1 + gi_dir * SUN_DISTANCE
    )
    v2n = jnp.where(gi_surf.is_some[..., None], gi_surf.normal, -gi_dir)

    valid = active & (gi_pdf > 0.0)
    cand = GiReservoirs(
        m=jnp.where(valid, 1.0, 0.0),
        w=jnp.where(valid, 1.0 / jnp.maximum(gi_pdf, 1e-20), 0.0),
        pdf=jnp.zeros(shape, jnp.float32),
        confidence=jnp.zeros(shape, jnp.float32),
        rng=rng0,
        radiance=jnp.where(valid[..., None], rad, 0.0),
        v1_point=jnp.where(valid[..., None], v1, 0.0),
        v2_point=jnp.where(valid[..., None], v2, 0.0),
        v2_normal=jnp.where(valid[..., None], v2n, 0.0),
    )
    cand = cand.replace(pdf=jnp.where(valid, sample_pdf(cand, surf), 0.0))
    return cand


def gi_temporal(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    prev_surf: Surface,
    reproj: Reprojection,
    cand: GiReservoirs,
    rep: GiReservoirs,
    seed,
    frame,
    tuning: Tuning = DEFAULT_TUNING,
    rhs_surf: Surface | None = None,
) -> GiReservoirs:
    """gi_temporal_resampling.rs: MIS merge on tracing frames;
    merge-only + sample validation on validation frames."""
    shape = surf.depth.shape
    xs, ys = screen_xy(camera)
    state = rng.wnoise_new(seed, xs, ys)
    tracing = is_gi_tracing(frame)
    frame = jnp.asarray(frame, jnp.int32)

    got_sample = jnp.where(
        tracing,
        ((frame % 2) == 0) & got_checkerboard_at(xs, ys, frame // 2),
        got_checkerboard_at(xs, ys, frame),
    )
    lhs = select(got_sample, cand, GiReservoirs.empty(shape))

    rhs = select(reproj.is_some, rep, GiReservoirs.empty(shape))
    rhs = rhs.replace(
        confidence=jnp.ones(shape, jnp.float32),
        m=jnp.minimum(rhs.m, tuning.gi_temporal_m_clamp),
    )

    # validation: compare replayed radiance against history
    validate = (
        ~tracing & ~lhs.is_empty & ~rhs.is_empty & rhs.exists & reproj.is_some
    )
    moved = (
        vm.length(lhs.radiance - rhs.radiance) > tuning.gi_validation_threshold
    )
    rhs = rhs.replace(
        confidence=jnp.where(validate & moved, 0.0, rhs.confidence),
        radiance=jnp.where(validate[..., None], lhs.radiance, rhs.radiance),
        v2_point=jnp.where(validate[..., None], lhs.v2_point, rhs.v2_point),
        v2_normal=jnp.where(validate[..., None], lhs.v2_normal, rhs.v2_normal),
    )

    # prev-frame surface at the reprojected position, for cross-pdfs
    # (prefetched by gi_reproject's shared take when available)
    if rhs_surf is None:
        rpx, rpy = reproj.prev_xy_round
        rx = jnp.clip(rpx, 0, camera.width - 1)
        ry = jnp.clip(rpy, 0, camera.height - 1)
        rhs_surf = gather.gather_tree(prev_surf, ry, rx)

    # --- tracing path: pairwise MIS -----------------------------------
    lhs_rhs_pdf = jnp.where(
        (lhs.m > 0.0) & rhs_surf.is_some, sample_pdf(lhs, rhs_surf), 0.0
    )
    rhs_lhs_pdf = jnp.where(rhs.m > 0.0, sample_pdf(rhs, surf), 0.0)
    mis = mis_eval(
        lhs_m=lhs.m,
        rhs_m=rhs.m,
        rhs_jacobian=jnp.ones(shape, jnp.float32),
        lhs_lhs_pdf=lhs.pdf,
        lhs_rhs_pdf=lhs_rhs_pdf,
        rhs_lhs_pdf=rhs_lhs_pdf,
        rhs_rhs_pdf=rhs.pdf,
    )
    mt = GiReservoirs.empty(shape)
    mt_pdf = jnp.zeros(shape, jnp.float32)
    state_t = state
    state_t, mt, acc = update(state_t, mt, lhs, mis.lhs_mis * mis.lhs_pdf * lhs.w)
    mt_pdf = jnp.where(acc, mis.lhs_pdf, mt_pdf)
    state_t, mt, acc = update(state_t, mt, rhs, mis.rhs_mis * mis.rhs_pdf * rhs.w)
    mt_pdf = jnp.where(acc, mis.rhs_pdf, mt_pdf)
    mt = mt.replace(m=lhs.m + mis.m, confidence=jnp.ones(shape, jnp.float32))
    mt = norm_mis(mt, mt_pdf)

    # --- validation path: merge-only ----------------------------------
    mv = GiReservoirs.empty(shape)
    mv_pdf = jnp.zeros(shape, jnp.float32)
    state_v = state
    state_v, mv, acc = merge(state_v, mv, rhs, rhs.pdf)
    mv_pdf = jnp.where(acc, rhs.pdf, mv_pdf)
    mv = mv.replace(confidence=rhs.confidence)
    mv = norm_avg(mv, mv_pdf)

    main = select(tracing & jnp.ones(shape, bool), mt, mv)
    main_pdf = jnp.where(tracing, mt_pdf, mv_pdf)
    main = main.replace(pdf=main_pdf, v1_point=surf.point)
    main = clamp_w(main, tuning.gi_w_clamp)
    return select(surf.is_some, main, GiReservoirs.empty(shape))


def gi_spatial(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    res: GiReservoirs,
    seed,
    frame,
    tuning: Tuning = DEFAULT_TUNING,
    use_pallas: bool | None = None,
) -> GiReservoirs:
    """gi_spatial_resampling.rs: like DI spatial plus the reconnection
    Jacobian (reject outside [1/10, 10], clamp to [1/3, 3]) applied to
    both the MIS and the merge weight. Checkerboarded. On TPU the probe
    loop (gates + Jacobian walk) runs as one Pallas stencil kernel
    (ops/pallas/probe_kernels.py; see di_spatial)."""
    from .di import _draw_probe_tables, _probe_kernel_enabled, checkerboard_active

    shape = surf.depth.shape
    xs, ys = screen_xy(camera)
    state = rng.wnoise_new(seed, xs, ys)
    active = checkerboard_active(camera, frame)

    lhs = res

    # shared-offset probing (ops/offsets.py; see di_spatial)
    from ..ops import offsets as shoff

    h, w = shape
    radii = shoff.radius_levels(tuning.gi_spatial_radius)
    n_lvls = len(radii)
    n_var = 2
    margin = shoff.probe_margin(tuning.gi_spatial_radius, h, w)
    seed_u = jnp.asarray(seed, jnp.uint32)

    if _probe_kernel_enabled(use_pallas):
        from ..ops.trace import _interpret
        from ..ops.pallas.probe_kernels import probe_spatial_pallas

        dy_tab, dx_tab = _draw_probe_tables(
            seed_u, tuning.gi_spatial_samples, radii, n_var, margin
        )
        stack = jnp.stack(
            [
                surf.depth,
                surf.normal[..., 0], surf.normal[..., 1], surf.normal[..., 2],
                surf.is_some.astype(jnp.float32),
                res.m,
                res.v1_point[..., 0], res.v1_point[..., 1], res.v1_point[..., 2],
                res.v2_point[..., 0], res.v2_point[..., 1], res.v2_point[..., 2],
                res.v2_normal[..., 0], res.v2_normal[..., 1], res.v2_normal[..., 2],
                surf.point[..., 0], surf.point[..., 1], surf.point[..., 2],
            ],
            axis=0,
        )
        oy, ox, done, rhs_jac = probe_spatial_pallas(
            stack, dy_tab, dx_tab, seed_u,
            mode="gi", tries=tuning.gi_spatial_samples, n_var=n_var,
            n_lvls=n_lvls, margin=margin, depth_tol=0.33, normal_min=0.33,
            jac_reject=tuning.gi_jacobian_reject,
            jac_clamp=tuning.gi_jacobian_clamp,
            interpret=_interpret(),
        )
        cx, cy = contain_xy(camera, xs + ox, ys + oy)
        rhs_x = jnp.where(done, cx, 0)
        rhs_y = jnp.where(done, cy, 0)
        for _ in range(tuning.gi_spatial_samples):
            state, _ = rng.next_u32(state)
    else:
        done = jnp.zeros(shape, bool)
        rhs_x = jnp.zeros(shape, jnp.int32)
        rhs_y = jnp.zeros(shape, jnp.int32)
        rhs_jac = jnp.zeros(shape, jnp.float32)
        # is_some + (m > 0) fold into one gate plane (see di_spatial)
        gate = jnp.where(
            surf.is_some, jnp.where(res.m > 0.0, 2.0, 1.0), 0.0
        )
        # v1_point enters the probe only through the Jacobian's
        # candidate-side terms — probe those precomputed (2 planes for
        # v1's 3; bitwise-commuting, see gi_preview)
        p_od, p_oc = jacobian_old_parts(
            res.v1_point, res.v2_point, res.v2_normal
        )
        probe = shoff.SharedOffsetTaps(
            (surf.depth, surf.normal, gate,
             p_od, p_oc, res.v2_point, res.v2_normal),
            margin=margin,
        )
        level = jnp.zeros(shape, jnp.int32)
        for nth in range(tuning.gi_spatial_samples):
            dy, dx = shoff.draw_offset_table(
                seed_u ^ jnp.uint32((0x9E3779B9 * (nth + 1)) & 0xFFFFFFFF),
                radii, n_var, margin=margin,
            )
            state, word = rng.next_u32(state)
            sel = level * n_var + (word % jnp.uint32(n_var)).astype(jnp.int32)
            kmax = n_var * (nth + 1)  # reachable levels by try nth
            c_depth, c_normal, c_gate, c_od, c_oc, c_v2, c_v2n = probe.take(
                dy, dx, sel, kmax=kmax
            )
            oy, ox = probe.offset_of(dy, dx, sel, kmax=kmax)
            cx, cy = contain_xy(camera, xs + ox, ys + oy)
            same = (cx == xs) & (cy == ys)
            depth_bad = jnp.abs(c_depth - surf.depth) > 0.33 * surf.depth
            normal_bad = vm.dot(c_normal, surf.normal) < 0.33
            gate_fail = (c_gate < 1.0) | depth_bad | normal_bad
            shrink = ~done & ~same & gate_fail
            level = jnp.where(shrink, jnp.minimum(level + 1, n_lvls - 1), level)

            c_exists = jnp.any(c_v2 != 0.0, axis=-1)
            jac = jacobian_apply(c_od, c_oc, c_v2, c_v2n, c_exists, surf.point)
            jac_ok = (
                jac >= 1.0 / tuning.gi_jacobian_reject
            ) & (jac <= tuning.gi_jacobian_reject)
            accept = ~done & ~same & ~gate_fail & (c_gate >= 2.0) & jac_ok
            rhs_x = jnp.where(accept, cx, rhs_x)
            rhs_y = jnp.where(accept, cy, rhs_y)
            rhs_jac = jnp.where(
                accept,
                jnp.clip(
                    jac, 1.0 / tuning.gi_jacobian_clamp, tuning.gi_jacobian_clamp
                ),
                rhs_jac
            )
            done = done | accept

    found = done & active & surf.is_some & ~lhs.is_empty
    rhs, rhs_surf = gather.gather_tree((res, surf), rhs_y, rhs_x)
    rhs = select(found, rhs, GiReservoirs.empty(shape))

    lhs_rhs_pdf = jnp.where(found, sample_pdf(lhs, rhs_surf), 0.0)
    rhs_lhs_pdf = jnp.where(found, sample_pdf(rhs, surf), 0.0)

    # cross-visibility reconnection rays
    a_o, a_d, a_len = sample_ray(lhs, rhs_surf.point)
    b_o, b_d, b_len = sample_ray(rhs, surf.point)
    a_len = jnp.where(found & (lhs_rhs_pdf > 0.0), a_len, 0.0)
    b_len = jnp.where(found & (rhs_lhs_pdf > 0.0), b_len, 0.0)
    from ..ops import checkerboard as cb

    if cb.compaction_pays(scene, shape[1]):
        # one packed half-width-pair pass (see di_spatial)
        parity = cb.row_parity(
            jnp.asarray(frame, jnp.int32) // 2 + 1, shape[0]
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
        rhs_jacobian=rhs_jac,
        lhs_lhs_pdf=lhs.pdf,
        lhs_rhs_pdf=lhs_rhs_pdf * lhs_rhs_vis,
        rhs_lhs_pdf=rhs_lhs_pdf * rhs_lhs_vis,
        rhs_rhs_pdf=rhs.pdf,
    )

    main = GiReservoirs.empty(shape)
    main_pdf = jnp.zeros(shape, jnp.float32)
    state, main, acc = update(state, main, lhs, mis.lhs_mis * mis.lhs_pdf * lhs.w)
    main_pdf = jnp.where(acc, mis.lhs_pdf, main_pdf)
    state, main, acc = update(
        state, main, rhs, mis.rhs_mis * mis.rhs_pdf * rhs.w * rhs_jac
    )
    main_pdf = jnp.where(acc, mis.rhs_pdf, main_pdf)
    main = main.replace(
        m=lhs.m + mis.m,
        confidence=jnp.ones(shape, jnp.float32),
        pdf=main_pdf,
        v1_point=lhs.v1_point,
    )
    main = norm_mis(main, main_pdf)
    main = clamp_w(main, tuning.gi_w_clamp)

    return select(found, main, lhs)


def gi_preview(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    center: GiReservoirs,
    neighbors: GiReservoirs,
    seed,
    max_radius: float,
    tuning: Tuning = DEFAULT_TUNING,
) -> GiReservoirs:
    """gi_preview_resampling.rs: merge-only spatial pass (no visibility
    rays) with up to ``8 - m`` disk samples, depth gate 25%, normal gate
    0.5, Jacobian-weighted merges, norm_avg."""
    shape = surf.depth.shape
    xs, ys = screen_xy(camera)
    state = rng.wnoise_new(seed, xs, ys)

    main = GiReservoirs.empty(shape)
    main_pdf = jnp.zeros(shape, jnp.float32)
    state, main, acc = merge(state, main, center, center.pdf)
    main_pdf = jnp.where(acc, center.pdf, main_pdf)

    # max_samples = lerp(8, 0, m/8) floored (gi_preview_resampling.rs:61-70)
    max_samples = jnp.floor(
        8.0 * (1.0 - jnp.clip(main.m / 8.0, 0.0, 1.0))
    ).astype(jnp.int32)

    # shared-offset probing (ops/offsets.py): gates + the full candidate
    # tree ride one mirror-padded field stack; each try is a 4-way
    # shifted select instead of a per-pixel gather
    from ..ops import offsets as shoff

    h, w = shape
    n_var = 4
    margin = shoff.probe_margin(max_radius, h, w)
    # The probe cost is planes x variants (ops/gather.py), so only pay
    # for planes the merge actually consumes. Dead after the loop's
    # closing replace(): confidence, pdf, v1_point (all overwritten
    # from center/main_pdf) and rng (never read out of a preview
    # reservoir — history persists `source`, not the previews). The
    # Jacobian's candidate-side terms (od, oc) are pure functions of
    # the candidate, so probing them precomputed (2 planes) commutes
    # bitwise with probing v1 (3 planes) and recomputing.
    nb_od, nb_oc = jacobian_old_parts(
        neighbors.v1_point, neighbors.v2_point, neighbors.v2_normal
    )
    nb_probe = (
        neighbors.m, neighbors.w, neighbors.radiance,
        neighbors.v2_point, neighbors.v2_normal, nb_od, nb_oc,
    )
    probe = shoff.SharedOffsetTaps(
        (surf.depth, surf.normal, surf.is_some, *nb_probe), margin=margin
    )
    seed_u = jnp.asarray(seed, jnp.uint32)

    stopped = jnp.zeros(shape, bool)
    for nth in range(8):
        dy, dx = shoff.draw_offset_table(
            seed_u ^ jnp.uint32((0x9E3779B9 * (nth + 1)) & 0xFFFFFFFF),
            (max_radius,), n_var, margin=margin,
        )
        state, word = rng.next_u32(state)
        sel = (word % jnp.uint32(n_var)).astype(jnp.int32)
        c_depth, c_normal, c_some, *c_nb = probe.take(dy, dx, sel)
        oy, ox = probe.offset_of(dy, dx, sel)
        cx, cy = contain_xy(camera, xs + ox, ys + oy)
        same = (cx == xs) & (cy == ys)
        stopped = stopped | same  # reference bails out entirely here
        in_budget = nth < max_samples
        c_sky = ~c_some
        depth_bad = jnp.abs(c_depth - surf.depth) > 0.25 * surf.depth
        normal_bad = vm.dot(c_normal, surf.normal) < 0.5

        c_m, c_w, c_rad, c_v2, c_v2n, c_od, c_oc = c_nb
        zero = jnp.zeros(shape, jnp.float32)
        cand = GiReservoirs(
            m=c_m, w=c_w, pdf=zero, confidence=zero,
            rng=jnp.zeros(shape, jnp.uint32), radiance=c_rad,
            v1_point=jnp.zeros(shape + (3,), jnp.float32),
            v2_point=c_v2, v2_normal=c_v2n,
        )
        cpdf = sample_pdf(cand, surf)
        jac = jacobian_apply(c_od, c_oc, c_v2, c_v2n, cand.exists, surf.point)
        jac_ok = (
            jac >= 1.0 / tuning.gi_jacobian_reject
        ) & (jac <= tuning.gi_jacobian_reject)
        jac = jnp.clip(
            jac, 1.0 / tuning.gi_jacobian_clamp, tuning.gi_jacobian_clamp
        )

        ok = (
            in_budget
            & ~stopped
            & ~c_sky
            & ~depth_bad
            & ~normal_bad
            & ~cand.is_empty
            & jac_ok
        )
        state, main, acc = merge(state, main, cand, cpdf * jac, ok)
        main_pdf = jnp.where(acc, cpdf, main_pdf)

    main = main.replace(
        confidence=center.confidence,
        pdf=main_pdf,
        v1_point=center.v1_point,
    )
    main = norm_avg(main, main_pdf)
    main = clamp_w(main, tuning.gi_w_clamp)
    return select(surf.is_some, main, GiReservoirs.empty(shape))


def gi_resolve(surf: Surface, res: GiReservoirs):
    """gi_resolving.rs: radiance = w * cosine * sample.radiance,
    demodulated into diffuse/spec with confidence alpha."""
    shape = surf.depth.shape
    cosine = sample_cosine(res, surf)
    rad = res.w[..., None] * cosine[..., None] * res.radiance
    rad = jnp.where(surf.is_some[..., None], rad, 0.0)
    confidence = jnp.where(surf.is_some, res.confidence, 1.0)

    diff_brdf = (1.0 - surf.metallic) / jnp.pi
    d = sample_dir(res, surf.point)
    spec_brdf = brdf.specular_eval(
        surf.base_color, surf.metallic, surf.roughness, surf.reflectance,
        surf.normal, d, -surf.dir,
    )
    diff = rad * diff_brdf[..., None]
    spec = rad * spec_brdf
    diff_out = jnp.concatenate([diff, confidence[..., None]], axis=-1)
    spec_out = jnp.concatenate([spec, confidence[..., None]], axis=-1)
    return diff_out, spec_out


def gi_pipeline(
    scene: Scene,
    camera: Camera,
    surf: Surface,
    prev_surf: Surface,
    reproj: Reprojection,
    gi_prev: GiReservoirs,
    seed,
    frame,
    bnoise_second,
    luts=None,
    use_pallas: bool | None = None,
    tuning: Tuning = DEFAULT_TUNING,
    prefetched=None,
):
    """Full per-frame GI schedule (camera_controller.rs:129-167)."""
    from ..models.restir import derive_seed

    tracing = is_gi_tracing(frame)
    frame_i = jnp.asarray(frame, jnp.int32)

    rep, rep_surf = gi_reproject(
        camera, surf, reproj, gi_prev, prev_surf, prefetched
    )

    # sampling runs on even tracing frames and on all validation frames
    # (gi_sampling.rs schedule); odd tracing frames skip it entirely.
    # The skip is a lax.cond on the scalar schedule so the skipped
    # frames pay nothing — the reference's host frame graph simply does
    # not dispatch the pass (camera_controller.rs:134-161).
    skip_sampling = tracing & ((frame_i % 2) == 1)
    cand = jax.lax.cond(
        skip_sampling,
        lambda: GiReservoirs.empty(surf.depth.shape),
        lambda: gi_sampling(
            scene, camera, surf, rep, derive_seed(seed, 10),
            derive_seed(seed, 11), frame, luts, use_pallas, tuning,
        ),
    )

    t = gi_temporal(
        scene, camera, surf, prev_surf, reproj, cand, rep,
        derive_seed(seed, 12), frame, tuning, rhs_surf=rep_surf,
    )

    # odd tracing frames run the spatial pass; source = spatial|temporal
    use_spatial = tracing & ((frame_i % 2) == 1)
    source = jax.lax.cond(
        use_spatial,
        lambda: gi_spatial(
            scene, camera, surf, t, derive_seed(seed, 13), frame, tuning,
            use_pallas,
        ),
        lambda: t,
    )

    p1 = gi_preview(
        scene, camera, surf, source, source, derive_seed(seed, 14),
        tuning.gi_spatial_radius, tuning,
    )
    p2 = gi_preview(
        scene, camera, surf, p1, p1, derive_seed(seed, 15),
        tuning.gi_spatial_radius / 2.0, tuning,
    )

    diff, spec = gi_resolve(surf, p2)
    return diff, spec, source
