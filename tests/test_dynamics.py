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


def test_mesh_asset_instances_and_materials():
    """Engine mesh/material handle APIs (lib.rs:160-245): instances
    referencing missing assets are retried next frame."""
    ed = SceneEditor(light_capacity=4)
    # instance first, mesh+material later: must not crash, resolves
    # once the assets arrive (instances.rs:85-101)
    ed.insert_instance("inst", mesh="box", material="red")
    s0 = ed.tick()

    tri = np.asarray([[[-1, 0, -1], [1, 0, -1], [1, 0, 1]]], np.float32)
    ed.insert_mesh("box", tri)
    assert not ed.has_material("red")
    ed.insert_material("red", base_color=[1, 0, 0, 1])
    assert ed.has_material("red")
    s1 = ed.tick()
    # the triangle is now present (plus the degenerate filler rows)
    assert np.abs(np.asarray(s1.geometry.positions)).sum() > 0

    # transformed second instance via the same mesh
    xf = np.eye(4, dtype=np.float32)
    xf[0, 3] = 5.0
    ed.insert_instance("inst2", mesh="box", material="red", transform=xf)
    s2 = ed.tick()
    assert np.asarray(s2.geometry.positions)[..., 0].max() >= 4.0

    # removal
    ed.remove_instance("inst2")
    ed.remove_mesh("box")  # inst now pending again
    ed.remove_material("red")
    s3 = ed.tick()
    assert np.isfinite(np.asarray(s3.geometry.positions)).all()


def test_material_slot_reuse():
    ed = SceneEditor()
    a = ed.insert_material("a", base_color=[1, 1, 1, 1])
    b = ed.insert_material("b", base_color=[0, 1, 0, 1])
    ed.remove_material("a")
    c = ed.insert_material("c", base_color=[0, 0, 1, 1])
    assert c == a  # freed slot recycled
    assert b != c


def test_images_atlas_and_dynamic():
    ed = SceneEditor(atlas_size=64)
    img = np.ones((8, 8, 4), np.float32)
    ed.insert_image("tex", img, dynamic=True)
    ed.insert_material("m", base_color=[1, 1, 1, 1], base_color_image="tex")
    ed.insert_instance("i", _tri([0, 0, 0]), material_id=ed.insert_material(
        "m", base_color=[1, 1, 1, 1], base_color_image="tex"))
    s0 = ed.tick()
    rect = np.asarray(s0.materials.base_color_tex[ed._material_index["m"]])
    assert rect[2] > 0 and rect[3] > 0  # resolved to a non-empty rect
    assert s0.atlas is not None
    before = float(np.asarray(s0.atlas.image).sum())

    # dynamic: mutate the caller-owned array in place -> next tick sees it
    img *= 0.5
    s1 = ed.tick()
    after = float(np.asarray(s1.atlas.image).sum())
    assert after < before

    ed.remove_image("tex")
    s2 = ed.tick()
    rect2 = np.asarray(s2.materials.base_color_tex[ed._material_index["m"]])
    assert rect2[2] == 0  # back to untextured


def test_renderer_camera_lifecycle():
    from strolle_tpu.camera import make_camera
    from strolle_tpu.renderer import CameraSettings, Renderer

    ed = SceneEditor(light_capacity=4)
    ed.insert_instance("floor", _tri([0, 0, 0]))
    ed.insert_light("l", pos=[0, 2, 0], color=[5, 5, 5])
    scene = ed.tick()

    r = Renderer()
    cam = make_camera(eye=[0, 1.5, 3], target=[0, 0, 0], width=16, height=16)
    r.create_camera("main", cam, CameraSettings(mode="reference",
                                                reference_depth=1))
    img0 = r.render_camera("main", scene, 0)
    img1 = r.render_camera("main", scene, 1)
    assert np.isfinite(np.asarray(img1)).all()

    # mode switch invalidates temporal state (camera.rs:17-48)
    r.update_camera("main", settings=CameraSettings(mode="image",
                                                    denoise=False))
    assert r._cameras["main"].state is None
    img2 = r.render_camera("main", scene, 2)
    assert np.asarray(img2).shape == (16, 16, 3)
    assert np.isfinite(np.asarray(img2)).all()

    r.delete_camera("main")
    assert not r.has_camera("main")


def test_transform_only_edit_takes_refit_path():
    """Re-inserting a mesh instance with only a new transform refits the
    BVH in place (native bvh_refit) instead of a full rebuild, and the
    refitted scene traces identically to a freshly built one."""
    from strolle_tpu import native
    from strolle_tpu.camera import make_camera
    from strolle_tpu.restir.primary import primary_pass

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    box = np.asarray(
        [
            [[-1, -1, -1], [1, -1, -1], [1, 1, -1]],
            [[-1, -1, -1], [1, 1, -1], [-1, 1, -1]],
        ],
        np.float32,
    )

    def xf(x):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [x, 0.0, -4.0]
        return m

    ed = SceneEditor()
    ed.insert_mesh("b", box)
    ed.insert_material("m", base_color=[1, 1, 1, 1])
    ed.insert_instance("i", mesh="b", material="m", transform=xf(0.0))
    ed.tick()
    assert (ed.stats["bvh_rebuilds"], ed.stats["bvh_refits"]) == (1, 0)

    ed.insert_instance("i", mesh="b", material="m", transform=xf(0.5))
    s_refit = ed.tick()
    assert (ed.stats["bvh_rebuilds"], ed.stats["bvh_refits"]) == (1, 1)

    # ground truth: a fresh editor built directly at the new transform
    ed2 = SceneEditor()
    ed2.insert_mesh("b", box)
    ed2.insert_material("m", base_color=[1, 1, 1, 1])
    ed2.insert_instance("i", mesh="b", material="m", transform=xf(0.5))
    s_full = ed2.tick()

    cam = make_camera((0, 0, 0), (0, 0, -1), width=32, height=32)
    surf_a, _ = primary_pass(s_refit, cam, cam)
    surf_b, _ = primary_pass(s_full, cam, cam)
    assert (np.asarray(surf_a.is_some) == np.asarray(surf_b.is_some)).all()
    assert np.allclose(
        np.asarray(surf_a.depth), np.asarray(surf_b.depth), atol=1e-4
    )

    # the streak cap forces a periodic rebuild
    ed.max_refit_streak = 2
    ed.insert_instance("i", mesh="b", material="m", transform=xf(1.0))
    ed.tick()  # refit #2
    ed.insert_instance("i", mesh="b", material="m", transform=xf(1.5))
    ed.tick()  # streak exhausted -> rebuild
    assert ed.stats["bvh_rebuilds"] == 2
    assert ed.stats["bvh_refits"] == 2


def test_mesh_swap_forces_rebuild():
    ed = SceneEditor()
    ed.insert_mesh("b1", _tri([0, 0, 0]))
    ed.insert_mesh("b2", np.concatenate([_tri([0, 0, 0]), _tri([2, 0, 0])]))
    ed.insert_material("m", base_color=[1, 1, 1, 1])
    ed.insert_instance("i", mesh="b1", material="m")
    ed.tick()
    ed.insert_instance("i", mesh="b2", material="m")  # different mesh
    ed.tick()
    assert ed.stats["bvh_rebuilds"] == 2
    assert ed.stats["bvh_refits"] == 0
