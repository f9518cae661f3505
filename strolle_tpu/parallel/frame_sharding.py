"""Sharding the realtime ReSTIR+SVGF pipeline over a device mesh.

SURVEY.md §5.7's north-star design: pixels (image rows) sharded across
the mesh, scene replicated, reservoir + denoiser state sharded
alongside the pixels. The implementation is the canonical TPU recipe —
pick a mesh, annotate the shardings of the frame state, and let XLA's
SPMD partitioner place the collectives:

* every per-pixel computation (ray casting, reservoir updates, SVGF
  arithmetic — the dominant cost) partitions along the row axis with
  no communication;
* the cross-pixel reads (reprojection history fetches, the <=128 px
  spatial-reuse neighbor taps of di/gi_spatial_resampling.rs, the
  a-trous tap stencils) are expressed as flat takes / pad+slice over
  full-height operands, for which the partitioner inserts row-axis
  all-gathers of exactly the arrays being tapped — the moral
  equivalent of a halo exchange, without hand-writing one. Results are
  bit-identical to the single-device render (tests/test_sharding.py).

The row axis is the same 'px' mesh axis used by parallel/sharding.py
for the reference tracer; multi-host meshes extend it across hosts
(gather traffic rides ICI within a slice, DCN across).

The trace-heavy stages keep their fused Pallas kernels on multi-chip
hardware: render_frame_sharded threads the mesh into the stage
programs, whose trace calls then run under block-granularity shard_map
(ops.trace.trace_rows_sharded) — each shard invokes the Pallas trace
kernels on its own rows, while the cross-pixel jnp stages
(reprojection, spatial resampling, SVGF) stay GSPMD-partitioned. On
the CPU test mesh, STROLLE_PALLAS_INTERPRET=1 exercises the same
kernels in interpret mode inside shard_map (tests/test_sharding.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import Camera
from ..models.restir import RenderConfig, RenderState, init_state, render_frame
from ..scene.types import Scene
from .sharding import AXIS, make_mesh  # noqa: F401


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_render_state(
    mesh: Mesh, state: RenderState, camera: Camera
) -> RenderState:
    """Places every [H, ...] leaf of the RenderState on the mesh sharded
    by rows; scalars/camera leaves are replicated. The image height must
    be divisible by the mesh size."""
    h = camera.height
    n = mesh.shape[AXIS]
    assert h % n == 0, f"height {h} not divisible by mesh size {n}"
    rows = row_sharding(mesh)
    rep = replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] == h:
            return jax.device_put(x, rows)
        return jax.device_put(x, rep)

    return jax.tree.map(put, state)


def init_state_sharded(mesh: Mesh, camera: Camera) -> RenderState:
    return shard_render_state(mesh, init_state(camera), camera)


def replicate_scene(mesh: Mesh, scene: Scene) -> Scene:
    """Commits the scene pytree replicated across the mesh (one h2d
    broadcast instead of per-dispatch transfers of host numpy)."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), scene)


def render_frame_sharded(
    mesh: Mesh,
    scene: Scene,
    camera: Camera,
    state: RenderState,
    seed,
    config: RenderConfig = RenderConfig(),
    luts=None,
):
    """One realtime frame with the pixel rows sharded over `mesh`.

    `state` should come from init_state_sharded / a previous sharded
    call — the sharding then propagates through every stage program and
    the returned channels/state stay row-sharded. Numerically identical
    to render_frame on one device. Trace calls run under shard_map so
    the Pallas kernels partition (see module docstring); the image
    height must divide by the mesh size."""
    assert camera.height % mesh.size == 0, (camera.height, mesh.size)
    return render_frame(
        scene, camera, state, seed, config, luts=luts, mesh=mesh
    )
