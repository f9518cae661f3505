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

    # ALL five taps (4 bilinear corners + the rounded center) come from
    # ONE row-batched take: the corner taps are the shifted-variant
    # channels of gather.take_bilinear, and the rounded tap is a select
    # among them (round(p) is floor or ceil per axis).
    taps, fy, fx = gather.take_bilinear(
        (prev_surf.normal, prev_surf.depth), prev_py, prev_px
    )
    cx = fx + 1
    cy = fy + 1

    rx = jnp.round(prev_px).astype(jnp.int32)
    ry = jnp.round(prev_py).astype(jnp.int32)
    in_bounds = (rx >= 0) & (rx < w) & (ry >= 0) & (ry < h)
    up_y = ry > fy
    up_x = rx > fx

    def pick(cond, a, b):
        return jnp.where(cond[..., None] if a.ndim == 3 else cond, a, b)

    pn = pick(up_x, pick(up_y, taps[3][0], taps[1][0]),
              pick(up_y, taps[2][0], taps[0][0]))
    pd = pick(up_x, pick(up_y, taps[3][1], taps[1][1]),
              pick(up_y, taps[2][1], taps[0][1]))
    confidence = surface_similarity(pn, pd, surf.normal, surf.depth)
    confidence = jnp.where(in_bounds & (surf.depth > 0.0), confidence, 0.0)

    # validity bits for the 4 bilinear taps (floor/ceil combinations)
    validity = jnp.zeros((h, w), jnp.int32)
    corners = ((fx, fy), (cx, fy), (fx, cy), (cx, cy))
    for bit, ((px, py), (tn, td)) in enumerate(zip(corners, taps)):
        inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
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
    px, py = reproj.prev_x, reproj.prev_y
    corner_taps, fy, fx = gather.take_bilinear((values,), py, px)
    ux = px - fx.astype(jnp.float32)
    uy = py - fy.astype(jnp.float32)

    taps = []
    weights = []
    corner_w = (
        (1 - ux) * (1 - uy), ux * (1 - uy), (1 - ux) * uy, ux * uy,
    )
    for bit, (wgt, (tap,)) in enumerate(zip(corner_w, corner_taps)):
        valid = ((reproj.validity >> bit) & 1) > 0
        taps.append(tap)
        weights.append(jnp.where(valid, wgt, 0.0))

    wsum = sum(weights)
    out = sum(t * wg[..., None] for t, wg in zip(taps, weights))
    return jnp.where(
        wsum[..., None] > 0.0, out / jnp.maximum(wsum, 1e-20)[..., None], 0.0
    )
