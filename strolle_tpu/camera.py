"""Camera model: matrices, primary-ray generation, screen transforms.

Reproduces the semantics of /root/reference/strolle-gpu/src/camera.rs
(NDC unprojection with reversed-Z depth, mirrored out-of-bounds
containment) and /root/reference/strolle/src/camera.rs:50-66 (matrix
construction), but as a pytree + vectorized ray generation over the
whole screen instead of per-thread `Camera::ray` calls.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .ops import math as vm
from .utils.pytree import pytree_dataclass, static


@pytree_dataclass
class Camera:
    projection_view: jnp.ndarray  # f32[4,4]  world -> clip
    ndc_to_world: jnp.ndarray  # f32[4,4]  inverse(projection_view)
    origin: jnp.ndarray  # f32[3]
    width: int = static()
    height: int = static()

    @property
    def screen(self) -> tuple[int, int]:
        return (self.width, self.height)


def perspective_infinite_reverse(
    fov_y: float, aspect: float, near: float
) -> np.ndarray:
    """Reversed-Z infinite-far RH projection (wgpu/Bevy depth convention:
    ndc z = 1 at the near plane, -> 0 at infinity)."""
    f = 1.0 / np.tan(0.5 * fov_y)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 3] = near
    m[3, 2] = -1.0
    return m


def look_at(eye: np.ndarray, target: np.ndarray, up: np.ndarray) -> np.ndarray:
    """RH view matrix (world -> view)."""
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(target, np.float32) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float32))
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = right
    m[1, :3] = true_up
    m[2, :3] = -fwd
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def make_camera(
    eye,
    target,
    up=(0.0, 1.0, 0.0),
    fov_y: float = np.pi / 4,
    width: int = 512,
    height: int = 512,
    near: float = 0.1,
) -> Camera:
    proj = perspective_infinite_reverse(fov_y, width / height, near)
    view = look_at(np.asarray(eye), np.asarray(target), np.asarray(up))
    pv = (proj @ view).astype(np.float32)
    return Camera(
        projection_view=jnp.asarray(pv),
        ndc_to_world=jnp.asarray(np.linalg.inv(pv).astype(np.float32)),
        origin=jnp.asarray(np.asarray(eye, np.float32)),
        width=int(width),
        height=int(height),
    )


def _apply_mat4(m: jnp.ndarray, x, y, z, w) -> jnp.ndarray:
    """4x4 matrix applied via unrolled elementwise ops [..., 4].

    NOT an einsum: contracting over a trailing dim of 4 forces XLA to
    relayout [..., 4] arrays across the 128-lane minor axis, costing
    milliseconds per call at 1080p. Unrolled muls stay elementwise.
    """
    out = [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3] * w for i in range(4)]
    return jnp.stack(out, axis=-1)


def _project_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 matrix to [..., 3] points with perspective divide."""
    out = _apply_mat4(m, p[..., 0], p[..., 1], p[..., 2], jnp.ones_like(p[..., 0]))
    return out[..., :3] / out[..., 3:4]


def world_to_clip(camera: Camera, pos: jnp.ndarray) -> jnp.ndarray:
    return _apply_mat4(
        camera.projection_view,
        pos[..., 0],
        pos[..., 1],
        pos[..., 2],
        jnp.ones_like(pos[..., 0]),
    )


def world_to_screen_xy(camera: Camera, pos: jnp.ndarray):
    """World point -> screen pixel coords as separate (x, y) planes.

    Separate planes keep downstream index math (reprojection gathers)
    out of stacked [..., 2] arrays, whose slices draw T(1,128)/T(2,128)
    TPU layouts (see ops/gather.py).
    """
    m = camera.projection_view
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    cx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
    cy = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
    cw = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3]
    ndc_x = cx / cw
    ndc_y = -(cy / cw)
    sx = (0.5 * ndc_x + 0.5) * camera.width
    sy = (0.5 * ndc_y + 0.5) * camera.height
    return sx, sy


def world_to_screen(camera: Camera, pos: jnp.ndarray) -> jnp.ndarray:
    """World point -> screen-space pixel coordinates (camera.rs:24-35)."""
    sx, sy = world_to_screen_xy(camera, pos)
    return jnp.stack([sx, sy], axis=-1)


def pixel_rays(camera: Camera, pixels_xy: jnp.ndarray):
    """Rays through pixel centers for integer pixel coords [..., 2].

    Returns (origins [...,3], dirs [...,3]). Mirrors camera.rs:80-93:
    unproject at reversed-Z ndc depths 1.0 (near) and eps (far).
    """
    size = jnp.asarray([camera.width, camera.height], jnp.float32)
    sp = pixels_xy.astype(jnp.float32) + 0.5
    ndc = sp * 2.0 / size - 1.0
    ndc = ndc * jnp.asarray([1.0, -1.0], jnp.float32)
    eps = jnp.float32(np.finfo(np.float32).eps)
    far = _project_point(
        camera.ndc_to_world,
        jnp.concatenate([ndc, jnp.full_like(ndc[..., :1], eps)], axis=-1),
    )
    near = _project_point(
        camera.ndc_to_world,
        jnp.concatenate([ndc, jnp.ones_like(ndc[..., :1])], axis=-1),
    )
    return near, vm.normalize(far - near)


def screen_xy(camera: Camera):
    """Integer pixel coordinates as two [H, W] arrays (x, y).

    Built with `broadcasted_iota`: composing a [H,1]/[1,W] arange
    through broadcasting (or meshgrid) drags T(1,128)-tiled layouts
    into downstream index math on TPU, adding relayout copies around
    every consumer (gathers included).
    """
    shape = (camera.height, camera.width)
    ys = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return xs, ys


def screen_grid(camera: Camera) -> jnp.ndarray:
    """Integer pixel coordinates [H, W, 2] (x, y order)."""
    xs, ys = screen_xy(camera)
    return jnp.stack([xs, ys], axis=-1)


def primary_rays(camera: Camera):
    """All primary rays: origins/dirs shaped [H, W, 3]."""
    return pixel_rays(camera, screen_grid(camera))


def contain_xy(camera: Camera, x: jnp.ndarray, y: jnp.ndarray):
    """Mirror out-of-bounds integer coords back inside (camera.rs:57-77).

    Operates on separate x/y arrays — keeping index math out of
    stacked [..., 2] arrays avoids TPU minor-dim relayouts (see
    `screen_xy`).
    """
    w = camera.width
    h = camera.height
    x = jnp.where(x < 0, -x, x)
    y = jnp.where(y < 0, -y, y)
    x = jnp.where(x >= w, 2 * w - x - 1, x)
    y = jnp.where(y >= h, 2 * h - y - 1, y)
    return x, y


def contain(camera: Camera, pos_xy: jnp.ndarray) -> jnp.ndarray:
    """Mirror out-of-bounds integer coords back inside (camera.rs:57-77)."""
    x, y = contain_xy(camera, pos_xy[..., 0], pos_xy[..., 1])
    return jnp.stack([x, y], axis=-1)


def cameras_approx_eq(a: Camera, b: Camera) -> jnp.ndarray:
    """`Camera::is_eq` (camera.rs:103-106): drives reference-mode
    accumulation reset on movement."""
    return jnp.all(jnp.abs(a.projection_view - b.projection_view) <= 0.0025)
