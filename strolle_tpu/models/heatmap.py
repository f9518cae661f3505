"""BVH heatmap debug mode (CameraMode::BvhHeatmap).

Visualizes per-primary-ray traversal memory traffic with the
reference's 4-stop gradient (strolle-shaders/src/bvh_heatmap.rs:29-52:
blue -> green -> red -> black, saturating at 8192 bytes/ray). Besides
being a traversal-cost regression view, on TPU it doubles as the
natural load-balance visualizer for screen-tile sharding (SURVEY.md
§5.1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera, pixel_rays, screen_grid
from ..scene.types import Scene

#: Gradient saturation point (bvh_heatmap.rs:46).
HEATMAP_SCALE = 8192.0

# numpy on purpose: module-level jnp arrays are device buffers the
# jitted program would have to closure-capture (first-dispatch penalty
# on the axon runtime; see sky/atmosphere.py constants).
_STOPS = np.asarray(
    [
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
    ],
    np.float32,
)


def heatmap_gradient(progress: jnp.ndarray) -> jnp.ndarray:
    """4-stop linear gradient (bvh_heatmap.rs:54-72), progress in [0,1]."""
    stops = jnp.asarray(_STOPS)
    n = stops.shape[0]
    x = jnp.clip(progress, 0.0, 1.0) * (n - 1)
    i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
    f = (x - i.astype(jnp.float32))[..., None]
    return stops[i] * (1.0 - f) + stops[i + 1] * f


def trace_cost(scene: Scene, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Per-ray traversal traffic in bytes. BVH scenes count node +
    triangle fetches like the reference's used_memory; brute-force
    scenes charge every resident triangle (each ray reads them all)."""
    if scene.bvh is not None:
        from ..bvh.traverse import TRIANGLE_BYTES, trace_cost_bvh

        return trace_cost_bvh(scene, o, d).astype(jnp.float32)
    from ..bvh.traverse import TRIANGLE_BYTES

    n = scene.geometry.num_triangles
    return jnp.full(o.shape[:-1], float(n * TRIANGLE_BYTES), jnp.float32)


@jax.jit
def render_heatmap(scene: Scene, camera: Camera) -> jnp.ndarray:
    """Renders the BVH heatmap view: one primary ray per pixel, colored
    by traversal cost (bvh_heatmap.rs:22-52). Returns f32[H, W, 3]."""
    grid = screen_grid(camera)
    o, d = pixel_rays(camera, grid)
    cost = trace_cost(scene, o, d)
    return heatmap_gradient(cost / HEATMAP_SCALE)
