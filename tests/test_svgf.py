import numpy as np
import jax.numpy as jnp

from strolle_tpu.denoise.svgf import (
    DenoiserState,
    denoise_channel,
    estimate_variance,
    temporal_reproject,
)
from strolle_tpu.models.restir import init_state
from strolle_tpu.restir.primary import Reprojection
from strolle_tpu.scene.cornell import cornell_box, cornell_camera
from strolle_tpu.restir.primary import primary_pass, build_reprojection_map


def _setup(h=32, w=32):
    scene = cornell_box()
    cam = cornell_camera(w, h)
    st = init_state(cam)
    surf, vel = primary_pass(scene, cam, st.prev_camera)
    reproj = build_reprojection_map(cam, surf, st.prev_surface, vel)
    return cam, surf, reproj


def test_constant_signal_is_preserved():
    cam, surf, reproj = _setup()
    h, w = surf.depth.shape
    val = 0.7
    samples = jnp.concatenate(
        [jnp.full((h, w, 3), val), jnp.ones((h, w, 1))], axis=-1
    )
    state = DenoiserState.empty((h, w))
    out, state = denoise_channel(samples, surf, reproj, state, 0)
    hit = np.asarray(surf.is_some)
    o = np.asarray(out)
    assert np.allclose(o[hit], val, atol=1e-3)


def test_variance_decreases_with_history():
    cam, surf, reproj = _setup()
    h, w = surf.depth.shape
    state = DenoiserState.empty((h, w))
    rs = np.random.RandomState(0)
    hist_vars = []
    # accumulate frames with static camera: reprojection valid after f0
    for f in range(8):
        noise = rs.rand(h, w, 3).astype(np.float32)
        samples = jnp.concatenate(
            [jnp.asarray(noise), jnp.ones((h, w, 1))], axis=-1
        )
        color, moments = temporal_reproject(samples, surf, reproj, state)
        var = estimate_variance(color, moments, surf)
        state = DenoiserState(prev_color=color, prev_moments=moments)
        hist_vars.append(float(jnp.mean(var)))
    # after history >= 4 the temporal variance of uniform noise ~ 1/12
    # scaled down by accumulation; it must shrink vs the first frame
    assert hist_vars[-1] < hist_vars[0]


def test_denoise_reduces_noise():
    cam, surf, reproj = _setup()
    h, w = surf.depth.shape
    rs = np.random.RandomState(1)
    base = 0.5
    noise = (base + 0.5 * (rs.rand(h, w, 3) - 0.5)).astype(np.float32)
    samples = jnp.concatenate(
        [jnp.asarray(noise), jnp.ones((h, w, 1))], axis=-1
    )
    state = DenoiserState.empty((h, w))
    out, _ = denoise_channel(samples, surf, reproj, state, 0)
    hit = np.asarray(surf.is_some)
    in_std = np.asarray(samples)[..., :3][hit].std()
    out_std = np.asarray(out)[hit].std()
    assert out_std < in_std * 0.6, (in_std, out_std)


def test_reprojection_confidence_resets_history():
    cam, surf, reproj = _setup()
    h, w = surf.depth.shape
    state = DenoiserState(
        prev_color=jnp.full((h, w, 3), 0.9),
        prev_moments=jnp.tile(jnp.asarray([10.0, 0.9, 0.81]), (h, w, 1)),
    )
    # confidence 0 in alpha -> history ignored
    samples = jnp.concatenate(
        [jnp.full((h, w, 3), 0.1), jnp.zeros((h, w, 1))], axis=-1
    )
    color, moments = temporal_reproject(samples, surf, reproj, state)
    hit = np.asarray(surf.is_some)
    assert np.allclose(np.asarray(color)[hit], 0.1, atol=1e-5)
    assert np.allclose(np.asarray(moments)[..., 0][hit], 1.0)
