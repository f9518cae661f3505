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

from ..camera import Camera, screen_grid, screen_xy, pixel_rays, world_to_screen_xy
from ..ops import gather, math as vm
from ..ops.hit import Surface
from ..ops.trace import trace_surface
from ..scene.types import Scene
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class Reprojection:
    """Per-pixel reprojection record (reprojection.rs:6-55).

    prev x/y live in separate planes: index math over stacked [..., 2]
    arrays draws T(1,128)-tiled TPU layouts (see ops/gather.py).
    """

    prev_x: jnp.ndarray  # f32[H, W]
    prev_y: jnp.ndarray  # f32[H, W]
    confidence: jnp.ndarray  # f32[H, W]
    validity: jnp.ndarray  # i32[H, W] 4-bit bilinear-tap mask

    @property
    def is_some(self) -> jnp.ndarray:
        return self.confidence > 0.0

    @property
    def prev_xy_round(self):
        return (
            jnp.round(self.prev_x).astype(jnp.int32),
            jnp.round(self.prev_y).astype(jnp.int32),
        )

    @staticmethod
    def none(shape) -> "Reprojection":
        return Reprojection(
            prev_x=jnp.zeros(shape, jnp.float32),
            prev_y=jnp.zeros(shape, jnp.float32),
            confidence=jnp.zeros(shape, jnp.float32),
            validity=jnp.zeros(shape, jnp.int32),
        )


def primary_pass(scene: Scene, camera: Camera, prev_camera: Camera,
                 use_pallas: bool | None = None):
    """Ray-cast primary visibility.

    Returns (surface: Surface[H,W], velocity f32[H,W,2]). Velocity =
    screen motion of the hit point between frames: the hit point is
    mapped back through the instance's previous transform when the
    scene carries per-instance motion (prim_raster.rs:25-35 computes
    prev clip pos via prev_xform * curr_xform_inv) and then projected
    with the previous camera; the small-velocity clamp matches
    prim_raster.rs:114-127.
    """
    grid = screen_grid(camera)
    o, d = pixel_rays(camera, grid)
    surf = trace_surface(scene, o, d, use_pallas=use_pallas)

    curr_x, curr_y = world_to_screen_xy(camera, surf.point)
    if scene.motion is not None:
        tri = jnp.maximum(surf.tri, 0)
        inst = jnp.asarray(scene.motion.instance_id)[tri]
        a = gather.gather_rows(scene.motion.prev_of_curr, inst)  # [H,W,12]
        p = surf.point
        prev_point = jnp.stack(
            [
                a[..., 0] * p[..., 0] + a[..., 1] * p[..., 1]
                + a[..., 2] * p[..., 2] + a[..., 3],
                a[..., 4] * p[..., 0] + a[..., 5] * p[..., 1]
                + a[..., 6] * p[..., 2] + a[..., 7],
                a[..., 8] * p[..., 0] + a[..., 9] * p[..., 1]
                + a[..., 10] * p[..., 2] + a[..., 11],
            ],
            axis=-1,
        )
    else:
        prev_point = surf.point
    prev_x, prev_y = world_to_screen_xy(prev_camera, prev_point)
    vel_x = curr_x - prev_x
    vel_y = curr_y - prev_y
    small = vel_x * vel_x + vel_y * vel_y < 0.001
    kill = small | ~surf.is_some
    vel_x = jnp.where(kill, 0.0, vel_x)
    vel_y = jnp.where(kill, 0.0, vel_y)
    return surf, (vel_x, vel_y)


def surface_similarity(a_normal, a_depth, b_normal, b_depth):
    """Surface::evaluate_similarity_to (surface.rs:20-46): `a` is the
    previous-frame surface, `b` the current one."""
    a_sky = a_depth == 0.0
    b_sky = b_depth == 0.0
    d = jnp.maximum(vm.dot(a_normal, b_normal), 0.0)
    normal_score = jnp.where(d <= 0.5, 0.0, 2.0 * d)
    depth_score = jnp.where(jnp.abs(a_depth - b_depth) >= 0.1 * b_depth, 0.0, 1.0)
    return jnp.where(a_sky | b_sky, 0.0, normal_score * depth_score)


def build_reprojection_map(
    camera: Camera,
    surf: Surface,
    prev_surf: Surface,
    velocity,  # (vel_x, vel_y) f32[H, W] planes
) -> Reprojection:
    """frame_reprojection.rs: prev pos = pos - velocity, confidence from
    surface similarity, per-tap validity bitmask for bilinear fetches."""
    h, w = camera.height, camera.width
    xs, ys = screen_xy(camera)
    vel_x, vel_y = velocity
    prev_px = xs.astype(jnp.float32) - vel_x
    prev_py = ys.astype(jnp.float32) - vel_y

    flat, specs = gather.pack_screen(prev_surf.normal, prev_surf.depth)

    rx = jnp.round(prev_px).astype(jnp.int32)
    ry = jnp.round(prev_py).astype(jnp.int32)
    in_bounds = (rx >= 0) & (rx < w) & (ry >= 0) & (ry < h)
    pn, pd = gather.take_screen(
        flat, specs, jnp.clip(ry, 0, h - 1), jnp.clip(rx, 0, w - 1)
    )
    confidence = surface_similarity(pn, pd, surf.normal, surf.depth)
    confidence = jnp.where(in_bounds & (surf.depth > 0.0), confidence, 0.0)

    # validity bits for the 4 bilinear taps (floor/ceil combinations)
    fx = jnp.floor(prev_px).astype(jnp.int32)
    fy = jnp.floor(prev_py).astype(jnp.int32)
    cx = jnp.ceil(prev_px).astype(jnp.int32)
    cy = jnp.ceil(prev_py).astype(jnp.int32)
    validity = jnp.zeros((h, w), jnp.int32)
    for bit, (px, py) in enumerate(((fx, fy), (cx, fy), (fx, cy), (cx, cy))):
        inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        tn, td = gather.take_screen(
            flat, specs, jnp.clip(py, 0, h - 1), jnp.clip(px, 0, w - 1)
        )
        ok = inb & (surface_similarity(tn, td, surf.normal, surf.depth) >= 0.25)
        validity = validity | jnp.where(ok, 1 << bit, 0)
    validity = jnp.where(confidence > 0.0, validity, 0)

    some = confidence > 0.0
    return Reprojection(
        prev_x=jnp.where(some, prev_px, 0.0),
        prev_y=jnp.where(some, prev_py, 0.0),
        confidence=confidence,
        validity=validity,
    )


def bilinear_reproject(reproj: Reprojection, values: jnp.ndarray) -> jnp.ndarray:
    """Validity-masked 4-tap bilinear fetch of per-pixel `values`
    [H, W, C] at reprojected coordinates (bilinear_filter.rs:28-107).
    Weights are the validity bits; returns zeros where no valid tap."""
    h, w = values.shape[0], values.shape[1]
    px, py = reproj.prev_x, reproj.prev_y
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    ux = px - fx
    uy = py - fy

    flat, specs = gather.pack_screen(values)

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
        (tap,) = gather.take_screen(flat, specs, yi, xi)
        taps.append(tap)
        weights.append(jnp.where(valid, wgt, 0.0))

    wsum = sum(weights)
    out = sum(t * wg[..., None] for t, wg in zip(taps, weights))
    return jnp.where(
        wsum[..., None] > 0.0, out / jnp.maximum(wsum, 1e-20)[..., None], 0.0
    )
