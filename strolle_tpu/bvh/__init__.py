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
    return scene.replace(geometry=geom, bvh=arrays)
