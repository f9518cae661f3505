"""Primary visibility + velocity + reprojection map.

The reference rasterizes primary visibility into a packed G-buffer
(prim_raster.rs) purely as a GPU-perf trick; the TPU-native design
ray-casts primaries with the same traversal used everywhere else
(SURVEY.md §7.0) and keeps the G-buffer as an unpacked Surface pytree.
Velocity and the reprojection map reproduce prim_raster.rs:114-127 and
frame_reprojection.rs exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..camera import Camera, screen_grid, pixel_rays, world_to_screen
from ..ops import math as vm
from ..ops.hit import Surface
from ..ops.trace import trace_surface
from ..scene.types import Scene
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class Reprojection:
    """Per-pixel reprojection record (reprojection.rs:6-55)."""

    prev_pos: jnp.ndarray  # f32[H, W, 2]
    confidence: jnp.ndarray  # f32[H, W]
    validity: jnp.ndarray  # i32[H, W] 4-bit bilinear-tap mask

    @property
    def is_some(self) -> jnp.ndarray:
        return self.confidence > 0.0

    @property
    def prev_pos_round(self) -> jnp.ndarray:
        return jnp.round(self.prev_pos).astype(jnp.int32)

    @staticmethod
    def none(shape) -> "Reprojection":
        return Reprojection(
            prev_pos=jnp.zeros(shape + (2,), jnp.float32),
            confidence=jnp.zeros(shape, jnp.float32),
            validity=jnp.zeros(shape, jnp.int32),
        )


def primary_pass(scene: Scene, camera: Camera, prev_camera: Camera):
    """Ray-cast primary visibility.

    Returns (surface: Surface[H,W], velocity f32[H,W,2]). Velocity =
    screen motion of the hit point between cameras (static geometry;
    per-instance motion needs prev transforms, handled by the dynamic
    scene path), with the small-velocity clamp of prim_raster.rs:114-127.
    """
    grid = screen_grid(camera)
    o, d = pixel_rays(camera, grid)
    surf = trace_surface(scene, o, d)

    curr_screen = world_to_screen(camera, surf.point)
    prev_screen = world_to_screen(prev_camera, surf.point)
    velocity = curr_screen - prev_screen
    small = vm.length_squared(velocity) < 0.001
    velocity = jnp.where((small | ~surf.is_some)[..., None], 0.0, velocity)
    return surf, velocity


def surface_similarity(a_normal, a_depth, b_normal, b_depth):
    """Surface::evaluate_similarity_to (surface.rs:20-46): `a` is the
    previous-frame surface, `b` the current one."""
    a_sky = a_depth == 0.0
    b_sky = b_depth == 0.0
    d = jnp.maximum(vm.dot(a_normal, b_normal), 0.0)
    normal_score = jnp.where(d <= 0.5, 0.0, 2.0 * d)
    depth_score = jnp.where(jnp.abs(a_depth - b_depth) >= 0.1 * b_depth, 0.0, 1.0)
    return jnp.where(a_sky | b_sky, 0.0, normal_score * depth_score)


def _gather_surface(normal, depth, pos, h, w):
    """Clamped gather of (normal, depth) at integer coords pos [...,2]."""
    x = jnp.clip(pos[..., 0], 0, w - 1)
    y = jnp.clip(pos[..., 1], 0, h - 1)
    return normal[y, x], depth[y, x]


def build_reprojection_map(
    camera: Camera,
    surf: Surface,
    prev_surf: Surface,
    velocity: jnp.ndarray,
) -> Reprojection:
    """frame_reprojection.rs: prev pos = pos - velocity, confidence from
    surface similarity, per-tap validity bitmask for bilinear fetches."""
    h, w = camera.height, camera.width
    grid = screen_grid(camera).astype(jnp.float32) + 0.0
    prev_pos = grid - velocity

    rounded = jnp.round(prev_pos).astype(jnp.int32)
    in_bounds = (
        (rounded[..., 0] >= 0)
        & (rounded[..., 0] < w)
        & (rounded[..., 1] >= 0)
        & (rounded[..., 1] < h)
    )
    pn, pd = _gather_surface(prev_surf.normal, prev_surf.depth, rounded, h, w)
    confidence = surface_similarity(pn, pd, surf.normal, surf.depth)
    confidence = jnp.where(in_bounds & (surf.depth > 0.0), confidence, 0.0)

    # validity bits for the 4 bilinear taps (floor/ceil combinations)
    fx = jnp.floor(prev_pos[..., 0]).astype(jnp.int32)
    fy = jnp.floor(prev_pos[..., 1]).astype(jnp.int32)
    cx = jnp.ceil(prev_pos[..., 0]).astype(jnp.int32)
    cy = jnp.ceil(prev_pos[..., 1]).astype(jnp.int32)
    validity = jnp.zeros((h, w), jnp.int32)
    for bit, (px, py) in enumerate(((fx, fy), (cx, fy), (fx, cy), (cx, cy))):
        inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        tap = jnp.stack([px, py], axis=-1)
        tn, td = _gather_surface(prev_surf.normal, prev_surf.depth, tap, h, w)
        ok = inb & (surface_similarity(tn, td, surf.normal, surf.depth) >= 0.25)
        validity = validity | jnp.where(ok, 1 << bit, 0)
    validity = jnp.where(confidence > 0.0, validity, 0)

    return Reprojection(
        prev_pos=jnp.where(confidence[..., None] > 0.0, prev_pos, 0.0),
        confidence=confidence,
        validity=validity,
    )


def bilinear_reproject(reproj: Reprojection, values: jnp.ndarray) -> jnp.ndarray:
    """Validity-masked 4-tap bilinear fetch of per-pixel `values`
    [H, W, C] at reprojected coordinates (bilinear_filter.rs:28-107).
    Weights are the validity bits; returns zeros where no valid tap."""
    h, w = values.shape[0], values.shape[1]
    px, py = reproj.prev_pos[..., 0], reproj.prev_pos[..., 1]
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    ux = px - fx
    uy = py - fy

    taps = []
    weights = []
    coords = (
        (fx, fy, (1 - ux) * (1 - uy), 0),
        (jnp.ceil(px), fy, ux * (1 - uy), 1),
        (fx, jnp.ceil(py), (1 - ux) * uy, 2),
        (jnp.ceil(px), jnp.ceil(py), ux * uy, 3),
    )
    for tx, ty, wgt, bit in coords:
        xi = jnp.clip(tx.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(ty.astype(jnp.int32), 0, h - 1)
        valid = ((reproj.validity >> bit) & 1) > 0
        taps.append(values[yi, xi])
        weights.append(jnp.where(valid, wgt, 0.0))

    wsum = sum(weights)
    out = sum(t * wg[..., None] for t, wg in zip(taps, weights))
    return jnp.where(
        wsum[..., None] > 0.0, out / jnp.maximum(wsum, 1e-20)[..., None], 0.0
    )
