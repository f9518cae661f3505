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

from ..camera import Camera, screen_grid
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
    mesh, scene, camera, grid, seed, depth, include_sky, use_pallas
):
    from ..models.reference import sample_pixels

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P()),
        out_specs=P(AXIS),
    )
    def shard_fn(scene_rep, camera_rep, grid_shard, seed_rep):
        return sample_pixels(
            scene_rep, camera_rep, grid_shard, seed_rep, depth, include_sky,
            use_pallas,
        )

    return shard_fn(scene, camera, grid, seed)


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
    n = mesh.shape[AXIS]
    grid = screen_grid(camera)  # [H, W, 2]
    h = grid.shape[0]
    hp = pad_rows(h, n)
    if hp != h:
        # wrap-pad: valid coords for any pad size (a mirror slice goes
        # wrong when pad > h, i.e. device count > 2x image rows); the
        # padded rows trace real rays and are dropped below.
        grid = jnp.pad(grid, ((0, hp - h), (0, 0), (0, 0)), mode="wrap")

    seed = jnp.asarray(seed, jnp.uint32)
    img = _render_sharded_jit(
        mesh, scene, camera, grid, seed, depth, include_sky, use_pallas
    )
    return img[:h]
