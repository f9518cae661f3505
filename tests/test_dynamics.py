"""Dynamic scene editing: light kill/remap protocol + geometry rebuilds."""

import numpy as np
import jax.numpy as jnp

from strolle_tpu.scene.dynamics import SceneEditor
from strolle_tpu.scene.types import LIGHT_NONE, LIGHT_POINT


def _tri(offset):
    return np.asarray(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32
    ) + np.asarray(offset, np.float32)


def test_light_remove_records_kill_and_remap():
    ed = SceneEditor(light_capacity=8)
    ed.insert_instance("floor", _tri([0, 0, 0]))
    ed.insert_light("a", pos=[0, 1, 0], color=[1, 0, 0])
    ed.insert_light("b", pos=[1, 1, 0], color=[0, 1, 0])
    ed.insert_light("c", pos=[2, 1, 0], color=[0, 0, 1])
    s0 = ed.tick()
    assert int(s0.lights.count) == 4  # sun + 3
    assert np.allclose(np.asarray(s0.lights.color[1]), [1, 0, 0])

    ed.remove_light("b")  # slot 2 dies; c moves 3 -> 2
    s1 = ed.tick()
    assert int(s1.lights.count) == 3
    killed = np.asarray(s1.lights.killed)
    remap = np.asarray(s1.lights.remap)
    assert killed[2] == 1
    assert remap[3] == 2  # c's old slot points at its new one
    assert np.allclose(np.asarray(s1.lights.color[2]), [0, 0, 1])

    # markers are visible for exactly one frame
    s2 = ed.tick()
    assert np.asarray(s2.lights.killed).sum() == 0
    assert (np.asarray(s2.lights.remap) == -1).all()


def test_light_update_keeps_prev_copy():
    ed = SceneEditor(light_capacity=4)
    ed.insert_instance("g", _tri([0, 0, 0]))
    ed.insert_light("a", pos=[0, 1, 0], color=[1, 1, 1])
    ed.tick()
    ed.insert_light("a", pos=[0, 2, 0], color=[2, 2, 2])  # update same handle
    s = ed.tick()
    assert np.allclose(np.asarray(s.lights.pos[1]), [0, 2, 0])
    assert np.allclose(np.asarray(s.lights.prev_pos[1]), [0, 1, 0])
    # after commit, prev matches current
    s2 = ed.tick()
    assert np.allclose(np.asarray(s2.lights.prev_pos[1]), [0, 2, 0])


def test_geometry_rebuild_and_bucketing():
    ed = SceneEditor()
    ed.insert_instance("a", _tri([0, 0, 0]))
    s0 = ed.tick()
    cap0 = s0.geometry.num_triangles
    ed.insert_instance("b", _tri([2, 0, 0]))
    s1 = ed.tick()
    assert s1.geometry.num_triangles == cap0  # same bucket, no recompile
    assert s1.bvh is not None
    # removing geometry works
    ed.remove_instance("a")
    s2 = ed.tick()
    # triangle at offset 2 must still be hittable
    from strolle_tpu.ops.trace import trace_closest_brute

    o = jnp.asarray([[2.2, 0.2, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = trace_closest_brute(s2, o, d)
    assert bool(hit.is_some[0])


def test_sun_slot_zero():
    ed = SceneEditor(sun_altitude=0.35)
    ed.insert_instance("g", _tri([0, 0, 0]))
    s = ed.tick()
    # slot 0 is the sun with a warm transmittance-derived color
    color = np.asarray(s.lights.color[0])
    assert color.sum() > 0
    assert color[0] > color[2]  # red > blue near the horizon
    ed.update_sun(altitude=-1.0)
    s2 = ed.tick()
    assert np.asarray(s2.lights.color[0]).sum() == 0  # sun below horizon


def test_render_with_editor_scene():
    from strolle_tpu.camera import make_camera
    from strolle_tpu.models.reference import trace_sample

    ed = SceneEditor(light_capacity=4)
    ed.insert_instance(
        "floor",
        np.asarray(
            [
                [[-2, 0, -2], [2, 0, -2], [2, 0, 2]],
                [[-2, 0, -2], [2, 0, 2], [-2, 0, 2]],
            ],
            np.float32,
        ),
    )
    ed.insert_light("l", pos=[0, 2, 0], color=[5, 5, 5])
    scene = ed.tick()
    cam = make_camera(eye=[0, 1.5, 3], target=[0, 0, 0], width=24, height=24)
    img = trace_sample(scene, cam, jnp.uint32(0), depth=1, include_sky=False)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.max() > 0  # lit floor visible
