"""Dungeon-scene oracle coverage (BASELINE.md:20-21 names the dungeon
explicitly): the 8.4k-triangle textured scene exercises the BVH
traversal, atlas sampling, and alpha paths that Cornell never touches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.models.reference import trace_sample
from strolle_tpu.scene.demo import dungeon, dungeon_camera


@pytest.fixture(scope="module")
def dg():
    return scene_with_bvh(dungeon())


def test_dungeon_bvh_matches_brute_force(dg, monkeypatch):
    """A 1-spp render through the BVH traversal must match the same
    render with the acceleration structure stripped (brute force) —
    pixel allclose up to rare triangle-edge rounding flips. The brute
    gate is lowered so the 8.4k-tri dungeon actually takes the BVH path
    (the measured default keeps it on the dense kernel, ops/trace.py)."""
    import strolle_tpu.ops.trace as trace_mod

    cam = dungeon_camera(32, 24)
    monkeypatch.setattr(trace_mod, "BRUTE_FORCE_MAX_TRIS", 1024)
    with_bvh = np.asarray(
        trace_sample(dg, cam, jnp.uint32(5), depth=1, include_sky=False)
    )
    monkeypatch.setattr(trace_mod, "BRUTE_FORCE_MAX_TRIS", 10**9)
    brute = np.asarray(
        trace_sample(
            dg.replace(bvh=None), cam, jnp.uint32(5), depth=1,
            include_sky=False,
        )
    )
    diff = np.abs(with_bvh - brute).max(axis=-1)
    assert (diff <= 1e-3).mean() > 0.99, (diff > 1e-3).mean()
    assert abs(with_bvh.mean() - brute.mean()) < 5e-3


def test_dungeon_accumulation_converges(dg):
    """Accumulated reference render is finite, textured (spatial color
    variation from the atlas), and stable across accumulation."""
    from strolle_tpu.models.reference import init_accumulator, render_reference

    cam = dungeon_camera(32, 24)
    acc = init_accumulator(cam)
    for s in range(8):
        img, acc = render_reference(
            dg, cam, acc, jnp.uint32(s), depth=2, include_sky=False
        )
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.mean() > 1e-3  # lights actually illuminate the level
    # texture variation: per-pixel albedo differs across the image
    assert a.std() > 0.01


def test_dungeon_grad_finite_difference():
    """Gradient allclose on the dungeon (BASELINE.md:20-21): FD check of
    the image loss w.r.t. a light color through the textured scene."""
    from strolle_tpu.models.train import (
        params_from_scene, render_loss,
    )

    scene = scene_with_bvh(dungeon())
    cam = dungeon_camera(16, 12)
    params = params_from_scene(scene)
    target = jnp.zeros((12, 16, 3), jnp.float32)

    def loss(p):
        return render_loss(p, scene, cam, target, jnp.uint32(3), depth=1)

    grads = jax.grad(loss)(params)
    index = (0, 0)  # first light, red channel
    g = float(grads.light_color[index])
    eps = 5e-2
    up = params.replace(light_color=params.light_color.at[index].add(eps))
    dn = params.replace(light_color=params.light_color.at[index].add(-eps))
    fd = (float(loss(up)) - float(loss(dn))) / (2 * eps)
    assert abs(g) > 0
    assert np.isclose(g, fd, rtol=0.05, atol=1e-5), (g, fd)


def test_dungeon_restir_di_matches_direct_lighting_oracle(dg):
    """DI-only ReSTIR on the DUNGEON (textures + alpha + BVH inside the
    resampling loop), temporally averaged, must converge to the
    reference tracer's direct lighting (depth=0: emissive + NEE) —
    BASELINE.md:20-21 names the dungeon alongside Cornell. Catches
    atlas/alpha interactions in DI resampling that the Cornell oracle
    (tests/test_restir.py) cannot see."""
    from strolle_tpu.models.restir import (
        RenderConfig, init_state, render_frame,
    )

    cam = dungeon_camera(48, 32)
    cfg = RenderConfig(denoise=False, needs_di=True, needs_gi=False)
    state = init_state(cam)
    acc = None
    frames = 40
    for f in range(frames):
        ch, state = render_frame(dg, cam, state, jnp.uint32(17 * f + 3), cfg)
        acc = ch["image"] if acc is None else acc + ch["image"]
    restir = np.asarray(acc) / frames

    samples = 40
    ref = np.zeros_like(restir)
    for s in range(samples):
        ref += np.asarray(
            trace_sample(dg, cam, jnp.uint32(s), depth=0, include_sky=False)
        )
    ref /= samples

    r = restir[3:-3, 3:-3]
    g = ref[3:-3, 3:-3]
    rel = abs(r.mean() - g.mean()) / max(g.mean(), 1e-6)
    assert rel < 0.15, f"mean brightness off by {rel:.3f}"
    corr = np.corrcoef(r.flatten(), g.flatten())[0, 1]
    assert corr > 0.9, f"correlation {corr:.3f}"


def test_dungeon_gi_matches_one_bounce_indirect_oracle(dg):
    """GI-only ReSTIR on the DUNGEON (textures x BVH x LUT sky in the
    GI loop), temporally averaged, must converge to the reference
    tracer's one-bounce indirect lighting (depth1 - depth0) — the
    dungeon twin of tests/test_restir.py's Cornell GI oracle
    (VERDICT r4 missing #4). Exercises atlas-sampled albedo at the
    secondary vertex and the sky-vs-RIS light selection with real
    Hillaire LUTs, none of which Cornell touches."""
    from strolle_tpu.models.restir import RenderConfig, init_state, render_frame
    from strolle_tpu.sky.atmosphere import luts_for

    scene = dg.replace(sun_altitude=jnp.asarray(0.35, jnp.float32))
    luts = luts_for(0.35)
    cam = dungeon_camera(40, 24)

    cfg = RenderConfig(denoise=False, needs_di=False, needs_gi=True)
    state = init_state(cam)
    acc = None
    frames = 36  # 6 full 6-frame GI cycles
    for f in range(frames):
        ch, state = render_frame(
            scene, cam, state, jnp.uint32(11 * f + 5), cfg, luts=luts
        )
        acc = ch["image"] if acc is None else acc + ch["image"]
    restir = np.asarray(acc) / frames

    # subtract the emissive-only composition to isolate indirect light
    cfg0 = RenderConfig(denoise=False, needs_di=False, needs_gi=False)
    ch0, _ = render_frame(
        scene, cam, init_state(cam), jnp.uint32(1), cfg0, luts=luts
    )
    restir_ind = restir - np.asarray(ch0["image"])

    d1 = np.zeros_like(restir)
    d0 = np.zeros_like(restir)
    n_ref = 48
    for s in range(n_ref):
        d1 += np.asarray(
            trace_sample(scene, cam, jnp.uint32(s), depth=1,
                         include_sky=True, luts=luts)
        )
        d0 += np.asarray(
            trace_sample(scene, cam, jnp.uint32(s), depth=0,
                         include_sky=True, luts=luts)
        )
    oracle_ind = (d1 - d0) / n_ref

    r = restir_ind[3:-3, 3:-3]
    g = oracle_ind[3:-3, 3:-3]
    assert np.isfinite(r).all() and np.isfinite(g).all()
    rel = np.abs(r.mean() - g.mean()) / g.mean()
    assert rel < 0.15, f"mean indirect brightness off by {rel:.3f}"
    # spatial structure at 4x downsampling (spatial reuse smooths fine
    # grain; the dungeon's textured walls still give strong variation)
    k = 4
    h, w = r.shape[:2]
    hh, ww = h // k * k, w // k * k

    def ds(a):
        return a[:hh, :ww].reshape(hh // k, k, ww // k, k, 3).mean(axis=(1, 3))

    corr = np.corrcoef(ds(r).flatten(), ds(g).flatten())[0, 1]
    assert corr > 0.85, f"downsampled correlation {corr:.3f}"
