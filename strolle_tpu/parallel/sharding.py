"""Screen-tile data parallelism over a device mesh.

The distributed design (SURVEY.md §5.7-5.8): pixels/rays are sharded
across a mesh, the scene pytree is replicated, and the forward pass
needs NO collectives at all — tiles are independent. The backward pass
of a differentiable render produces per-shard scene-parameter
gradients; `shard_map`'s transpose inserts the psum over the mesh axis
automatically, which XLA lowers onto ICI.

The mesh is 1-D (`'px'`) over all addressable devices by default;
multi-host runs extend the same axis across hosts (DCN handles only
the gradient all-reduce).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..camera import Camera
from ..scene.types import Scene

AXIS = "px"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def pad_rows(h: int, n: int) -> int:
    """Rows padded up so the mesh axis divides the image height."""
    return -(-h // n) * n


@partial(jax.jit, static_argnames=("mesh", "depth", "include_sky", "use_pallas"))
def _render_sharded_jit(
    mesh, scene, camera, seed, depth, include_sky, use_pallas
):
    from ..models.reference import sample_pixels

    n = mesh.shape[AXIS]
    h, w = camera.height, camera.width
    rows = pad_rows(h, n) // n

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(AXIS),
        # pallas_call inside shard_map cannot annotate varying mesh
        # axes on its outputs (see ops.trace._shard_over_rows); the
        # body is per-shard-pure so the check adds nothing
        check_vma=False,
    )
    def shard_fn(scene_rep, camera_rep, seed_rep):
        # each shard derives its own pixel rows from its mesh index
        # (wrap past the image bottom for pad rows, dropped by the
        # caller) — no [H, W, 2] grid array is built/transferred per
        # call, which was measurable per-dispatch overhead
        i = jax.lax.axis_index(AXIS)
        yy = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0) + i * rows
        ) % h
        xx = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
        grid = jnp.stack([xx, yy], axis=-1)
        return sample_pixels(
            scene_rep, camera_rep, grid, seed_rep, depth, include_sky,
            use_pallas,
        )

    return shard_fn(scene, camera, seed)


def render_sample_sharded(
    mesh: Mesh,
    scene: Scene,
    camera: Camera,
    seed,
    depth: int = 5,
    include_sky: bool = False,
    use_pallas: bool | None = None,
):
    """One path-traced sample with rows sharded over the mesh.

    Returns [H, W, 3]. Pads rows to a multiple of the axis size; padded
    rows trace real rays at mirrored coordinates and are dropped.
    """
    seed = jnp.asarray(seed, jnp.uint32)
    img = _render_sharded_jit(
        mesh, scene, camera, seed, depth, include_sky, use_pallas
    )
    # pad rows (wrap-indexed inside the shard body) are dropped here
    h = camera.height
    return img if img.shape[0] == h else img[:h]
