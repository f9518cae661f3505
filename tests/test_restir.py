import numpy as np
import jax.numpy as jnp
import pytest

from strolle_tpu.camera import screen_grid
from strolle_tpu.models.reference import render_reference, init_accumulator, trace_sample
from strolle_tpu.models.restir import RenderConfig, init_state, render_frame
from strolle_tpu.restir import reservoir as rsv
from strolle_tpu.restir.gi import gi_coverage, is_gi_tracing
from strolle_tpu.restir.mis import mis_eval
from strolle_tpu.ops import rng
from strolle_tpu.scene.cornell import cornell_box, cornell_camera


def test_reservoir_update_statistics():
    """Streaming k candidates with equal weights picks ~uniformly."""
    n = 20000
    state = rng.wnoise_new(1, jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0))
    res = rsv.DiReservoirs.empty((n,))
    for k in range(4):
        cand = res.replace(light_id=jnp.full((n,), k, jnp.int32))
        state, res, _ = rsv.update(state, res, cand, jnp.ones(n))
    assert float(res.m[0]) == 4.0
    assert np.allclose(np.asarray(res.w), 4.0)
    counts = np.bincount(np.asarray(res.light_id), minlength=4) / n
    assert np.allclose(counts, 0.25, atol=0.02)


def test_reservoir_merge_m_accounting():
    n = 8
    state = rng.wnoise_new(2, jnp.arange(n, dtype=jnp.uint32), jnp.uint32(0))
    a = rsv.DiReservoirs.empty((n,)).replace(
        m=jnp.full((n,), 3.0), w=jnp.full((n,), 2.0)
    )
    main = rsv.DiReservoirs.empty((n,))
    state, main, _ = rsv.merge(state, main, a, jnp.ones(n))
    # merge adds rhs.m - 1 then update adds 1 -> m == rhs.m
    assert np.allclose(np.asarray(main.m), 3.0)
    # weight = w * m * pdf = 6
    assert np.allclose(np.asarray(main.w), 6.0)
    # merging an empty reservoir is a no-op
    state, main2, _ = rsv.merge(state, main, rsv.DiReservoirs.empty((n,)), jnp.ones(n))
    assert np.allclose(np.asarray(main2.m), np.asarray(main.m))


def test_mis_defensive_weights():
    one = jnp.ones(())
    zero = jnp.zeros(())
    # no neighbor: canonical gets everything
    r = mis_eval(one, zero, one, one, zero, zero, zero)
    assert float(r.lhs_mis) == 1.0
    assert float(r.rhs_mis) == 0.0
    # symmetric case: t = 0.5, lhs gets defensive bonus
    r = mis_eval(one, one, one, one, one, one, one)
    assert float(r.lhs_mis) == pytest.approx(0.75)
    assert float(r.rhs_mis) == pytest.approx(0.25)
    assert float(r.m) == pytest.approx(1.0)


def test_gi_frame_cycle():
    tracing = [bool(is_gi_tracing(f)) for f in range(12)]
    assert tracing == [True] * 4 + [False] * 2 + [True] * 4 + [False] * 2


def test_gi_coverage_half_resolution():
    cam = cornell_camera(16, 16)
    grid = screen_grid(cam)
    xs, ys = grid[..., 0], grid[..., 1]
    for frame in range(8):
        cov = np.asarray(gi_coverage(xs, ys, frame))
        assert cov.mean() == 0.5  # exactly half the pixels
    # consecutive tracing frame pairs (frame//2 key) cover all pixels
    c0 = np.asarray(gi_coverage(xs, ys, 0))
    c2 = np.asarray(gi_coverage(xs, ys, 2))
    assert (c0 | c2).all()


def test_restir_di_matches_direct_lighting_oracle():
    """DI-only ReSTIR (no denoise), temporally averaged, must converge
    to the reference tracer's direct lighting (depth=0: emissive+NEE)."""
    scene = cornell_box()
    cam = cornell_camera(48, 48)

    cfg = RenderConfig(denoise=False, needs_di=True, needs_gi=False)
    state = init_state(cam)
    acc = None
    frames = 60
    for f in range(frames):
        ch, state = render_frame(scene, cam, state, jnp.uint32(13 * f + 1), cfg)
        acc = ch["image"] if acc is None else acc + ch["image"]
    restir = np.asarray(acc) / frames

    ref = np.zeros_like(restir)
    for s in range(60):
        ref += np.asarray(
            trace_sample(scene, cam, jnp.uint32(s), depth=0, include_sky=False)
        )
    ref /= 60

    # interior pixels (skip edges where checkerboard/spatial bias concentrates)
    r = restir[4:-4, 4:-4]
    g = ref[4:-4, 4:-4]
    rel = np.abs(r.mean() - g.mean()) / g.mean()
    assert rel < 0.1, f"mean brightness off by {rel:.3f}"
    # structural agreement
    corr = np.corrcoef(r.flatten(), g.flatten())[0, 1]
    assert corr > 0.95, f"correlation {corr:.3f}"


def test_full_pipeline_no_nans_over_cycle():
    scene = cornell_box()
    cam = cornell_camera(32, 32)
    cfg = RenderConfig(denoise=True, needs_di=True, needs_gi=True)
    state = init_state(cam)
    for f in range(7):  # cover a full 6-frame GI cycle
        ch, state = render_frame(scene, cam, state, jnp.uint32(f + 1), cfg)
        for k, v in ch.items():
            assert bool(jnp.isfinite(v).all()), f"frame {f} channel {k}"


def test_restir_gi_matches_one_bounce_indirect_oracle():
    """GI-only ReSTIR (no denoise), temporally averaged, must converge
    to the reference tracer's one-bounce indirect lighting
    (depth1 - depth0 renders with matched seeds). Catches plumbing
    swaps in the gi[0..3] rotation / 6-frame schedule (SURVEY §7.8.3):
    a wrong source reservoir biases brightness or decorrelates the
    spatial structure."""
    scene = cornell_box()
    # 48x48 matches the DI-oracle test's shape so the per-stage jitted
    # programs (prelude/compose/trace depth-0) are compile-cache hits
    cam = cornell_camera(48, 48)

    cfg = RenderConfig(denoise=False, needs_di=False, needs_gi=True)
    state = init_state(cam)
    acc = None
    frames = 60  # 10 full 6-frame GI cycles
    for f in range(frames):
        ch, state = render_frame(scene, cam, state, jnp.uint32(7 * f + 3), cfg)
        acc = ch["image"] if acc is None else acc + ch["image"]
    restir = np.asarray(acc) / frames

    # subtract the emissive-only composition to isolate indirect light
    cfg0 = RenderConfig(denoise=False, needs_di=False, needs_gi=False)
    ch0, _ = render_frame(scene, cam, init_state(cam), jnp.uint32(1), cfg0)
    restir_ind = restir - np.asarray(ch0["image"])

    d1 = np.zeros_like(restir)
    d0 = np.zeros_like(restir)
    n_ref = 80
    for s in range(n_ref):
        d1 += np.asarray(
            trace_sample(scene, cam, jnp.uint32(s), depth=1, include_sky=False)
        )
        d0 += np.asarray(
            trace_sample(scene, cam, jnp.uint32(s), depth=0, include_sky=False)
        )
    oracle_ind = (d1 - d0) / n_ref

    r = restir_ind[4:-4, 4:-4]
    g = oracle_ind[4:-4, 4:-4]
    rel = np.abs(r.mean() - g.mean()) / g.mean()
    assert rel < 0.1, f"mean indirect brightness off by {rel:.3f}"
    # color-bleed structure: the left half is red-dominant (red wall),
    # the right half green-dominant; per-half per-channel means within
    # 15% of the oracle catch any gi[0..3] source swap
    h, w = r.shape[:2]
    for sl in (np.s_[:, : w // 2], np.s_[:, w // 2 :]):
        rm = r[sl].mean(axis=(0, 1))
        gm = g[sl].mean(axis=(0, 1))
        assert (np.abs(rm - gm) / np.maximum(gm, 1e-3) < 0.15).all(), (rm, gm)
    # ReSTIR's spatial reuse (radius 128 px on a 40 px image) smooths
    # fine-grain structure; compare at 4x downsampling instead
    k = 4
    hh, ww = h // k * k, w // k * k

    def ds(a):
        return a[:hh, :ww].reshape(hh // k, k, ww // k, k, 3).mean(axis=(1, 3))

    corr = np.corrcoef(ds(r).flatten(), ds(g).flatten())[0, 1]
    assert corr > 0.9, f"downsampled correlation {corr:.3f}"
