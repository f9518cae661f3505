"""Multi-host mesh path (parallel/distributed.py) on the 8-device CPU
mesh: the 2-D ('host','chip') mesh models 2 hosts × 4 chips; forward
renders must match the single-device image bitwise and gradient steps
must match the single-device trainer (the psum over both axes is
shard_map's transpose — SURVEY.md §5.8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.models.reference import trace_sample
from strolle_tpu.parallel import distributed as dist
from strolle_tpu.scene.cornell import cornell_box, cornell_camera

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


@pytest.fixture(scope="module")
def setup():
    scene = scene_with_bvh(cornell_box())
    cam = cornell_camera(32, 32)
    return scene, cam


def test_initialize_single_process_noop():
    assert dist.initialize() is False  # no coordinator: single-process
    assert dist.initialize() is False  # idempotent


def test_host_chip_mesh_shape():
    mesh = dist.make_host_chip_mesh(n_hosts=2)
    assert mesh.shape == {"host": 2, "chip": 4}


def test_hostmesh_render_matches_single(setup):
    scene, cam = setup
    mesh = dist.make_host_chip_mesh(n_hosts=2)
    seed = jnp.uint32(5)
    ref = np.asarray(trace_sample(scene, cam, seed, 2, False, use_pallas=False))
    img = np.asarray(dist.render_sample_hostmesh(mesh, scene, cam, seed, depth=2))
    # partitioned programs compile differently: fp rounding may flip
    # discrete branches (triangle-edge hits) on rare pixels — same
    # policy as tests/test_sharding.py::_assert_images_match
    diff = np.abs(ref - img).max(axis=-1)
    assert (diff > 1e-5).mean() < 0.01
    assert np.median(diff) <= 1e-6


def test_host_local_rows_roundtrip(setup):
    _, cam = setup
    mesh = dist.make_host_chip_mesh(n_hosts=2)
    data = np.arange(32 * 8, dtype=np.float32).reshape(32, 8)
    arr = dist.host_local_rows(mesh, data)
    assert arr.shape == data.shape
    np.testing.assert_array_equal(np.asarray(arr), data)
    # row-sharded over both axes
    assert arr.sharding.spec == dist.row_spec()


def test_hostmesh_grads_match_single(setup):
    scene, cam = setup
    from strolle_tpu.models.train import (
        params_from_scene,
        train_step,
    )

    mesh = dist.make_host_chip_mesh(n_hosts=2)
    params = params_from_scene(scene)
    target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    seed = jnp.uint32(3)

    l1, _, g1 = train_step(params, scene, cam, target, seed, depth=1)
    l2, _, g2 = dist.train_step_hostmesh(
        mesh, params, scene, cam, target, seed, depth=1
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
