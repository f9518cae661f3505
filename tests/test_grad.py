"""Differentiability: finite-difference verification of scene-parameter
gradients through the path integrator (BASELINE.json requirement)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strolle_tpu.models.train import (
    TrainableParams,
    apply_params,
    params_from_scene,
    render_loss,
)
from strolle_tpu.scene.cornell import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box()
    camera = cornell_camera(24, 24)
    params = params_from_scene(scene)
    # target: render with perturbed albedo so the loss is non-trivial
    from strolle_tpu.models.reference import trace_sample

    target = trace_sample(scene, camera, jnp.uint32(123), 2, False) * 0.8
    return scene, camera, params, target


def _loss(params, setup_vals, seed=7):
    scene, camera, _, target = setup_vals
    return render_loss(params, scene, camera, target, seed, depth=2)


def test_grads_finite_and_nonzero(setup):
    params = setup[2]
    loss, grads = jax.value_and_grad(_loss)(params, setup)
    assert np.isfinite(float(loss))
    for name in ("base_color", "emissive", "light_color", "light_pos", "positions"):
        g = np.asarray(getattr(grads, name))
        assert np.isfinite(g).all(), name
    # albedo of the white material definitely matters
    assert np.abs(np.asarray(grads.base_color)[0]).max() > 0
    assert np.abs(np.asarray(grads.light_color)[0]).max() > 0


@pytest.mark.parametrize(
    "field,index",
    [
        ("base_color", (0, 0)),  # white wall red channel
        ("light_color", (0, 1)),  # light green channel
    ],
)
def test_finite_difference_match(setup, field, index):
    params = setup[2]
    grads = jax.grad(_loss)(params, setup)
    g = float(getattr(grads, field)[index])

    eps = 1e-3
    arr = getattr(params, field)
    up = params.replace(**{field: arr.at[index].add(eps)})
    dn = params.replace(**{field: arr.at[index].add(-eps)})
    fd = (float(_loss(up, setup)) - float(_loss(dn, setup))) / (2 * eps)

    # RNG streams are identical across evaluations, so the estimator is
    # deterministic and FD should match closely.
    assert np.isclose(g, fd, rtol=0.05, atol=1e-4), (field, index, g, fd)


def test_finite_difference_light_pos_unoccluded():
    """Geometry gradients: visibility is discrete (detached in autodiff),
    so FD is checked on an occluder-free box where no shadow boundary
    can flip under the perturbation."""
    scene = cornell_box(boxes=False)
    camera = cornell_camera(24, 24)
    params = params_from_scene(scene)
    from strolle_tpu.models.reference import trace_sample

    target = trace_sample(scene, camera, jnp.uint32(123), 2, False) * 0.8
    vals = (scene, camera, params, target)

    grads = jax.grad(_loss)(params, vals)
    index = (0, 1)
    g = float(grads.light_pos[index])
    # eps must be large enough to beat f32 cancellation in the loss
    eps = 1e-2
    up = params.replace(light_pos=params.light_pos.at[index].add(eps))
    dn = params.replace(light_pos=params.light_pos.at[index].add(-eps))
    fd = (float(_loss(up, vals)) - float(_loss(dn, vals))) / (2 * eps)
    assert np.isclose(g, fd, rtol=0.05, atol=1e-3), (g, fd)
