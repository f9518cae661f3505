"""Custom-VJP gradients through the realtime ReSTIR+SVGF pipeline
(BASELINE.md:22-23): reservoir resampling statistics detached
(restir.reservoir.resampling_weight), a-trous filter with frozen
weights (denoise.svgf._wavelet_core), radiance straight-through."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strolle_tpu.models.restir import RenderConfig, init_state, render_frame
from strolle_tpu.models.train import params_from_scene
from strolle_tpu.scene.cornell import cornell_box, cornell_camera


# --- unit: resampling_weight custom VJP ------------------------------------


def test_resampling_weight_forward_and_zero_vjp():
    from strolle_tpu.restir.reservoir import resampling_weight

    w = jnp.asarray([2.0, 3.0, 1.0])
    pdf = jnp.asarray([0.5, 0.0, 2.0])
    num = jnp.ones(3)
    den = jnp.asarray([1.0, 1.0, 2.0])
    out = resampling_weight(w, pdf, num, den)
    assert np.allclose(np.asarray(out), [4.0, 0.0, 0.25])

    g = jax.grad(lambda p: jnp.sum(resampling_weight(w, p, num, den)))(pdf)
    assert (np.asarray(g) == 0.0).all()
    g = jax.grad(lambda ww: jnp.sum(resampling_weight(ww, pdf, num, den)))(w)
    assert (np.asarray(g) == 0.0).all()


# --- unit: a-trous custom VJP = exact adjoint of the frozen filter ----------


def _wavelet_fields(seed=0, h=16, w=24):
    rs = np.random.RandomState(seed)
    color = jnp.asarray(rs.rand(h, w, 3).astype(np.float32))
    var = jnp.asarray((rs.rand(h, w) * 0.5).astype(np.float32))
    depth = jnp.asarray((1.0 + rs.rand(h, w)).astype(np.float32))
    n = rs.randn(h, w, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    normal = jnp.asarray(n)
    skyf = jnp.zeros((h, w), jnp.float32)
    jy = jnp.asarray(rs.randint(-2, 3, (h, w)).astype(np.float32))
    jx = jnp.asarray(rs.randint(-2, 3, (h, w)).astype(np.float32))
    return color, var, depth, normal, skyf, jy, jx


@pytest.mark.parametrize("stride,radius", [(1, 0), (4, 2)])
def test_wavelet_vjp_is_frozen_weight_adjoint(stride, radius):
    from strolle_tpu.denoise.svgf import _wavelet_core, _wavelet_impl

    color, var, depth, normal, skyf, jy, jx = _wavelet_fields()
    args = (var, depth, normal, skyf, jy, jx)
    statics = (stride, 2.0, radius, (2.5, 0.5))

    cot = jnp.asarray(
        np.random.RandomState(1).randn(*color.shape).astype(np.float32)
    )

    def loss(c):
        out_c, _ = _wavelet_core(*statics, c, *args)
        return jnp.sum(out_c * cot)

    g = np.asarray(jax.grad(loss)(color))

    # ground truth: FD of the frozen-weight linear operator (weights
    # from the unperturbed color) — the custom VJP's declared semantics
    def frozen(c):
        out_c, _ = _wavelet_impl(*statics, c, color, *args)
        return jnp.sum(out_c * cot)

    rs = np.random.RandomState(2)
    for _ in range(4):
        y, x, ch = rs.randint(16), rs.randint(24), rs.randint(3)
        eps = 1e-2
        up = frozen(color.at[y, x, ch].add(eps))
        dn = frozen(color.at[y, x, ch].add(-eps))
        fd = (float(up) - float(dn)) / (2 * eps)
        assert np.isclose(g[y, x, ch], fd, rtol=0.02, atol=1e-4), (
            (y, x, ch), g[y, x, ch], fd,
        )


def test_wavelet_forward_unchanged_by_custom_vjp():
    """custom_vjp must not alter the primal output."""
    from strolle_tpu.denoise.svgf import _wavelet_core, _wavelet_impl

    color, var, depth, normal, skyf, jy, jx = _wavelet_fields(seed=3)
    statics = (2, 3.0, 0, (1.0, 0.0))
    a_c, a_v = _wavelet_core(*statics, color, var, depth, normal, skyf, jy, jx)
    b_c, b_v = _wavelet_impl(
        *statics, color, color, var, depth, normal, skyf, jy, jx
    )
    assert np.allclose(np.asarray(a_c), np.asarray(b_c))
    assert np.allclose(np.asarray(a_v), np.asarray(b_v))


# --- integration: gradients through render_frame ----------------------------


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box()
    camera = cornell_camera(16, 16)
    params = params_from_scene(scene)
    state = init_state(camera)
    # a couple of warmup frames so reservoirs/history are non-trivial
    cfg = RenderConfig(differentiable=True)
    for f in range(3):
        _, state = render_frame(scene, camera, state, jnp.uint32(f), cfg)
    target = jnp.full((16, 16, 3), 0.25, jnp.float32)
    return scene, camera, params, state, target


def _di_loss(params, setup_vals, denoise=False):
    from strolle_tpu.models.train import restir_render_loss

    scene, camera, _, state, target = setup_vals
    cfg = RenderConfig(
        differentiable=True, needs_gi=False, denoise=denoise
    )
    return restir_render_loss(
        params, scene, camera, state, target, jnp.uint32(9), cfg
    )


def _full_loss(params, setup_vals):
    from strolle_tpu.models.train import restir_render_loss

    scene, camera, _, state, target = setup_vals
    cfg = RenderConfig(differentiable=True)
    return restir_render_loss(
        params, scene, camera, state, target, jnp.uint32(9), cfg
    )


def test_render_frame_di_base_color_grad_matches_fd(setup):
    """DI-only pipeline: the resampling statistics are independent of
    albedo (target pdfs use white albedo, di.rs:96-117), so detaching
    them drops nothing and autodiff matches central differences."""
    params = setup[2]
    grads = jax.grad(_di_loss)(params, setup)
    for index in ((0, 0), (0, 2)):
        g = float(grads.base_color[index])
        eps = 2e-3
        up = params.replace(
            base_color=params.base_color.at[index].add(eps)
        )
        dn = params.replace(
            base_color=params.base_color.at[index].add(-eps)
        )
        fd = (float(_di_loss(up, setup)) - float(_di_loss(dn, setup))) / (
            2 * eps
        )
        assert abs(g) > 0
        assert np.isclose(g, fd, rtol=0.05, atol=1e-4), (index, g, fd)


def test_render_frame_denoised_base_color_grad_matches_fd(setup):
    """With SVGF on, the custom VJP freezes the a-trous weights; for
    albedo the weight dependence enters only via luma of the DENOISED
    DI-diffuse channel, which is albedo-demodulated — so FD still
    matches tightly."""
    params = setup[2]
    loss = lambda p: _di_loss(p, setup, denoise=True)
    grads = jax.grad(loss)(params)
    index = (0, 1)
    g = float(grads.base_color[index])
    eps = 2e-3
    up = params.replace(base_color=params.base_color.at[index].add(eps))
    dn = params.replace(base_color=params.base_color.at[index].add(-eps))
    fd = (float(loss(up)) - float(loss(dn))) / (2 * eps)
    assert abs(g) > 0
    assert np.isclose(g, fd, rtol=0.05, atol=1e-4), (g, fd)


def test_render_frame_full_grads_finite_and_nonzero(setup):
    """Full pipeline (DI+GI+SVGF): gradients w.r.t. materials and
    lights exist, are finite, and are nonzero where they must be."""
    params = setup[2]
    loss, grads = jax.value_and_grad(_full_loss)(params, setup)
    assert np.isfinite(float(loss))
    for name in (
        "base_color", "emissive", "light_color", "light_pos", "positions"
    ):
        g = np.asarray(getattr(grads, name))
        assert np.isfinite(g).all(), name
    assert np.abs(np.asarray(grads.base_color)).max() > 0
    assert np.abs(np.asarray(grads.light_color)).max() > 0
