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


_TWO_PROC_CHILD = """
import os, sys, json
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
# initialize BEFORE anything touches the local backend (ADVICE r3: the
# old code queried jax.process_count() first, which made real
# multi-process init impossible)
from strolle_tpu.parallel import distributed as dist

pid = int(sys.argv[1])
is_multi = dist.initialize(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid
)
assert is_multi, "expected multi-process after initialize"
assert jax.process_count() == 2
assert jax.local_device_count() == 2
assert jax.device_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

mesh = dist.make_host_chip_mesh()
assert mesh.shape == {{"host": 2, "chip": 2}}, mesh.shape

# host_local_rows: each process contributes only its own slice of the
# global row axis (the make_array_from_process_local_data branch)
H, W = 8, 4
local = np.arange(H // 2 * W, dtype=np.float32).reshape(H // 2, W)
local = local + pid * 1000.0
garr = dist.host_local_rows(mesh, local)
assert garr.shape == (H, W)

from functools import partial

@jax.jit
@partial(
    jax.shard_map,
    mesh=mesh,
    in_specs=dist.row_spec(),
    out_specs=P(),
)
def total(rows):
    return jax.lax.psum(rows.sum(), ("host", "chip"))

val = float(total(garr))
expect = float(np.arange(H // 2 * W, dtype=np.float32).sum() * 2 + 1000.0 * (H // 2 * W))
assert abs(val - expect) < 1e-3, (val, expect)
if pid == 0:
    print(json.dumps({{"ok": True, "total": val}}))
"""


def test_two_process_distributed_cpu(tmp_path):
    """Real 2-process jax.distributed over a localhost coordinator
    (VERDICT r3 #7): exercises initialize() with actual process
    grouping, make_host_chip_mesh's by-process device ordering, and
    host_local_rows' make_array_from_process_local_data branch — none
    of which the in-process host-axis fold can reach."""
    import pathlib
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    code = _TWO_PROC_CHILD.format(repo=repo, port=port)
    env = {
        k: v
        for k, v in __import__("os").environ.items()
        if not k.startswith(("JAX_", "TPU_"))
    }
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", code, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed (rc={rc}):\n{err[-3000:]}"
    import json as _json

    line = outs[0][1].strip().splitlines()[-1]
    rec = _json.loads(line)
    assert rec["ok"] is True
