"""Multi-host initialization + host×chip meshes (SURVEY.md §5.8).

The reference is single-process/single-GPU (one wgpu queue, no
NCCL/MPI anywhere — strolle/src/images.rs:216-218 is the only queue
submit site); the TPU rebuild's distributed backend is JAX's: one
`jax.distributed.initialize` per process, a 2-D `('host', 'chip')`
mesh whose chip axis rides ICI and host axis rides DCN, and XLA
collectives placed by the SPMD partitioner.

Design (BASELINE.md scaling target, ≥85% 1→4 hosts):
* forward render: pixel rows sharded over the flattened ('host','chip')
  axes — no collectives at all (tiles independent, scene replicated),
  which is what makes the ≥85% scaling target reachable;
* backward (differentiable) pass: per-shard scene-parameter gradients
  are psum'd — XLA lowers the reduction hierarchically (reduce-scatter
  over ICI within a slice, all-reduce over DCN across hosts);
* host-local input feeding via `host_local_rows` /
  `jax.make_array_from_process_local_data` so no host materializes the
  full screen.

Single-process multi-device (the CPU test mesh and the driver's
virtual-device dryrun) uses the same code with num_processes=1.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

HOST_AXIS = "host"
CHIP_AXIS = "chip"

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initializes jax.distributed for a multi-host run; returns True
    when running multi-process afterwards.

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), as
    set by TPU pod launchers. On a single process (no coordinator
    configured) this is a no-op — the same code path then runs on the
    process-local devices, so tests and the virtual CPU mesh need no
    special-casing. Safe to call more than once.

    MUST run before anything instantiates the local backend:
    `jax.distributed.initialize` raises once backends exist, so this
    function gates purely on its args/env and never queries
    jax.process_count()/jax.devices() before deciding to init.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        n = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("JAX_PROCESS_ID")
        process_id = int(p) if p else None

    if coordinator_address is None:
        # No coordinator configured anywhere: single-process run (the
        # CPU test mesh / one-chip case). On TPU pod slices the
        # launcher sets the coordinator env vars, so auto-detection is
        # still reached through them.
        _initialized = True
        return False

    # A configured coordinator always initializes — num_processes /
    # process_id may legitimately be None (jax auto-detects them on TPU
    # pods from the launcher environment).
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def make_host_chip_mesh(
    devices: list | None = None, n_hosts: int | None = None
) -> Mesh:
    """2-D ('host', 'chip') mesh over all global devices.

    The host axis groups devices by owning process so collectives along
    CHIP_AXIS stay on ICI and only HOST_AXIS traffic crosses DCN. With
    one process the host axis is synthesized by folding the device list
    (n_hosts), which is how the CPU test mesh models a pod.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_hosts is None:
        n_hosts = max(1, jax.process_count())
    assert len(devs) % n_hosts == 0, (len(devs), n_hosts)
    if jax.process_count() > 1:
        # order by (process, local index) so rows = hosts
        devs.sort(key=lambda d: (d.process_index, d.id))
    grid = np.asarray(devs).reshape(n_hosts, -1)
    return Mesh(grid, (HOST_AXIS, CHIP_AXIS))


def row_spec() -> P:
    """Pixel rows sharded over both mesh axes (host-major)."""
    return P((HOST_AXIS, CHIP_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, row_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_local_rows(mesh: Mesh, global_array: np.ndarray):
    """Builds a global row-sharded jax.Array from per-process host data.

    Each process passes only its slice of the leading (row) axis —
    `global_array` here is the *process-local* block, shaped
    [H / num_processes, ...]; no host materializes the full screen.
    With one process this is just device_put with the row sharding.
    """
    sharding = row_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(global_array), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(global_array)
    )


def render_sample_hostmesh(
    mesh: Mesh,
    scene,
    camera,
    seed,
    depth: int = 5,
    include_sky: bool = False,
    use_pallas: bool | None = None,
):
    """One path-traced sample with pixel rows sharded over the 2-D
    ('host','chip') mesh. Forward uses no collectives; see module
    docstring."""
    import jax.numpy as jnp

    from ..camera import screen_grid

    n = mesh.shape[HOST_AXIS] * mesh.shape[CHIP_AXIS]
    grid = screen_grid(camera)
    h = grid.shape[0]
    hp = -(-h // n) * n
    if hp != h:
        # wrap-pad: valid for any pad size, incl. pad > h (see
        # parallel/sharding.py); padded rows are dropped below.
        grid = jnp.pad(grid, ((0, hp - h), (0, 0), (0, 0)), mode="wrap")
    img = _render_hostmesh_jit(
        mesh, scene, camera, grid, jnp.asarray(seed, jnp.uint32), depth,
        include_sky, use_pallas,
    )
    return img[:h]


@partial(jax.jit, static_argnames=("mesh", "depth", "include_sky", "use_pallas"))
def _render_hostmesh_jit(
    mesh, scene, camera, grid, seed, depth, include_sky, use_pallas
):
    from ..models.reference import sample_pixels

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), row_spec(), P()),
        out_specs=row_spec(),
    )
    def shard_fn(scene_rep, camera_rep, grid_shard, seed_rep):
        return sample_pixels(
            scene_rep, camera_rep, grid_shard, seed_rep, depth, include_sky,
            use_pallas,
        )

    return shard_fn(scene, camera, grid, seed)


def render_loss_hostmesh(params, scene, camera, target, seed, depth, mesh):
    """L2 image loss with rows sharded over the host×chip mesh.

    Differentiating this produces the hierarchical gradient reduction:
    shard_map's transpose psums the replicated-input (scene-parameter)
    cotangents over BOTH mesh axes, which XLA lowers as reduce-scatter/
    all-reduce over ICI within a host row and all-reduce over DCN
    across hosts."""
    import jax.numpy as jnp

    from ..models.train import apply_params

    s = apply_params(scene, params)
    img = render_sample_hostmesh(
        mesh, s, camera, seed, depth, False, use_pallas=False
    )
    diff = img - target
    return jnp.mean(diff * diff)


@partial(jax.jit, static_argnames=("mesh", "depth"))
def train_step_hostmesh(
    mesh, params, scene, camera, target, seed, lr: float = 0.05,
    depth: int = 2,
):
    """One SGD step on scene parameters over the 2-D host×chip mesh."""
    loss, grads = jax.value_and_grad(render_loss_hostmesh)(
        params, scene, camera, target, seed, depth, mesh
    )
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return loss, new_params, grads
