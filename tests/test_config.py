"""Tuning knobs (strolle_tpu/config.py, SURVEY.md §5.6): defaults are
reference-exact; overrides actually reach the kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.config import DEFAULT_TUNING, Tuning
from strolle_tpu.models.restir import RenderConfig, init_state, render_frame
from strolle_tpu.scene.cornell import cornell_box, cornell_camera


def test_defaults_match_reference_constants():
    from strolle_tpu.denoise import svgf
    from strolle_tpu.restir import di, gi

    t = DEFAULT_TUNING
    assert t.di_candidates == di.DI_CANDIDATES == 16
    assert t.di_temporal_m_clamp == di.DI_TEMPORAL_M_CLAMP == 64.0
    assert t.di_spatial_samples == di.DI_SPATIAL_SAMPLES == 8
    assert t.di_spatial_radius == di.DI_SPATIAL_RADIUS == 128.0
    assert t.gi_temporal_m_clamp == gi.GI_TEMPORAL_M_CLAMP == 128.0
    assert t.gi_w_clamp == gi.GI_W_CLAMP == 5.0
    assert t.gi_jacobian_reject == gi.GI_JACOBIAN_REJECT == 10.0
    assert t.gi_jacobian_clamp == gi.GI_JACOBIAN_CLAMP == 3.0
    assert t.gi_validation_threshold == gi.GI_VALIDATION_THRESHOLD == 0.33
    assert t.sky_sample_prob == gi.SKY_SAMPLE_PROB == 0.25
    assert t.svgf_history_clamp == svgf.HISTORY_CLAMP == 16.0
    assert t.svgf_variance_min_history == svgf.VARIANCE_MIN_HISTORY == 4.0
    assert t.svgf_wavelet_passes == svgf.WAVELET_PASSES == 5


def test_tuning_is_hashable_and_comparable():
    assert hash(Tuning()) == hash(Tuning())
    assert Tuning() == DEFAULT_TUNING
    assert Tuning(di_candidates=4) != DEFAULT_TUNING
    assert hash(Tuning(di_candidates=4)) != hash(Tuning())


@pytest.fixture(scope="module")
def setup():
    scene = scene_with_bvh(cornell_box())
    cam = cornell_camera(32, 32)
    return scene, cam


def _frame(scene, cam, cfg, frames=2):
    state = init_state(cam)
    for f in range(frames):
        ch, state = render_frame(scene, cam, state, jnp.uint32(f), cfg)
    return np.asarray(ch["image"])


def test_di_spatial_override_changes_sampling(setup):
    # Cornell has a single light, so di_candidates is a no-op there;
    # disabling spatial reuse must change the image on frames where the
    # checkerboarded spatial pass runs (frame >= 1).
    scene, cam = setup
    base = _frame(scene, cam, RenderConfig(needs_gi=False, denoise=False),
                  frames=3)
    low = _frame(
        scene, cam,
        RenderConfig(needs_gi=False, denoise=False,
                     tuning=Tuning(di_spatial_samples=0)),
        frames=3,
    )
    assert base.shape == low.shape
    assert not np.allclose(base, low)
    assert np.isfinite(low).all()


def test_wavelet_passes_override_changes_denoise(setup):
    scene, cam = setup
    base = _frame(scene, cam, RenderConfig(needs_gi=False))
    sharp = _frame(
        scene, cam,
        RenderConfig(needs_gi=False, tuning=Tuning(svgf_wavelet_passes=1)),
    )
    assert not np.allclose(base, sharp)
    assert np.isfinite(sharp).all()


def test_gi_knobs_override_runs_clean(setup):
    scene, cam = setup
    cfg = RenderConfig(
        tuning=Tuning(
            gi_w_clamp=1.0,
            gi_spatial_samples=2,
            gi_temporal_m_clamp=8.0,
            sky_sample_prob=0.0,
        )
    )
    img = _frame(scene, cam, cfg, frames=7)  # spans a full GI cycle
    assert np.isfinite(img).all()
