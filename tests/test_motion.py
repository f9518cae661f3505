"""Object-motion velocity: per-instance previous transforms
(instances.rs prev_transform -> prim_raster.rs:25-35 velocity)."""

import numpy as np
import jax.numpy as jnp

from strolle_tpu.camera import make_camera, world_to_screen_xy
from strolle_tpu.restir.primary import build_reprojection_map, primary_pass
from strolle_tpu.scene.dynamics import SceneEditor, _prev_of_curr_affine


def _translate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [x, y, z]
    return m


def _rot_y(angle):
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


_QUAD = np.asarray(
    [
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0]],
        [[-1, -1, 0], [1, 1, 0], [-1, 1, 0]],
    ],
    np.float32,
)


def test_prev_of_curr_affine():
    a = _prev_of_curr_affine(None, None)
    assert np.allclose(a, np.eye(3, 4))
    prev = _translate(0, 0, 0)
    curr = _translate(1, 2, 3)
    a = _prev_of_curr_affine(prev, curr)
    p = np.asarray([5.0, 6.0, 7.0])
    mapped = a[:, :3] @ p + a[:, 3]
    assert np.allclose(mapped, p - [1, 2, 3], atol=1e-5)


def test_moving_instance_velocity():
    ed = SceneEditor()
    ed.insert_mesh("quad", _QUAD)
    ed.insert_material("m", base_color=[1.0, 1.0, 1.0, 1.0])
    ed.insert_instance("q", mesh="quad", material="m",
                       transform=_translate(0, 0, -3))
    s0 = ed.tick()

    dx = 0.4
    ed.insert_instance("q", mesh="quad", material="m",
                       transform=_translate(dx, 0, -3))
    s1 = ed.tick()

    cam = make_camera((0, 0, 0), (0, 0, -1), width=64, height=64)
    surf, (vel_x, vel_y) = primary_pass(s1, cam, cam)
    cy, cx = 32, 32
    assert bool(surf.is_some[cy, cx])

    # expected: screen displacement of the hit point moved back by dx
    p = np.asarray(surf.point[cy, cx])
    sx_now, _ = world_to_screen_xy(cam, jnp.asarray(p))
    sx_prev, _ = world_to_screen_xy(cam, jnp.asarray(p - [dx, 0, 0]))
    expected = float(sx_now) - float(sx_prev)
    assert expected > 1.0  # sanity: motion is several pixels
    assert np.isclose(float(vel_x[cy, cx]), expected, atol=0.1)
    assert abs(float(vel_y[cy, cx])) < 0.1

    # camera-only path (motion stripped) reports zero velocity
    surf2, (vx2, _) = primary_pass(s1.replace(motion=None), cam, cam)
    assert abs(float(vx2[cy, cx])) < 1e-3


def test_moving_tilted_quad_keeps_confidence():
    """A y-rotated quad translated along x has a depth gradient across
    the screen: without object motion the reprojection depth gate kills
    history; with prev transforms confidence stays ~1 behind it."""
    xform0 = _translate(0, 0, -4) @ _rot_y(np.radians(45.0))
    xform1 = _translate(0.5, 0, -4) @ _rot_y(np.radians(45.0))

    ed = SceneEditor()
    ed.insert_mesh("quad", _QUAD)
    ed.insert_material("m", base_color=[1.0, 1.0, 1.0, 1.0])
    ed.insert_instance("q", mesh="quad", material="m", transform=xform0)
    s0 = ed.tick()
    ed.insert_instance("q", mesh="quad", material="m", transform=xform1)
    s1 = ed.tick()

    cam = make_camera((0, 0, 0), (0, 0, -1), width=64, height=64)
    prev_surf, _ = primary_pass(s0, cam, cam)

    surf, vel = primary_pass(s1, cam, cam)
    reproj = build_reprojection_map(cam, surf, prev_surf, vel)

    surf_n, vel_n = primary_pass(s1.replace(motion=None), cam, cam)
    reproj_n = build_reprojection_map(cam, surf_n, prev_surf, vel_n)

    on = np.asarray(surf.is_some) & np.asarray(prev_surf.is_some)
    conf = np.asarray(reproj.confidence)[on]
    conf_n = np.asarray(reproj_n.confidence)[on]
    # motion-aware: most overlapping pixels keep full confidence
    assert conf.mean() > 0.8, conf.mean()
    # camera-only velocity mis-projects onto the depth gradient
    assert conf.mean() > conf_n.mean() + 0.3, (conf.mean(), conf_n.mean())
