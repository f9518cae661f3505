import numpy as np
import jax.numpy as jnp

from strolle_tpu.scene.demo import cornell_gltf, dungeon, dungeon_camera


def test_dungeon_loads():
    scene = dungeon()
    assert scene.geometry.num_triangles > 8000
    assert scene.materials.num_materials == 45
    assert scene.atlas is not None
    assert scene.atlas.image.shape[-1] == 4
    assert int(scene.lights.count) >= 5
    # atlas rects normalized and inside [0, 1]
    rects = np.asarray(scene.materials.base_color_tex)
    assert (rects >= 0).all() and (rects <= 1).all()
    assert (rects.sum(-1) > 0).any()  # at least one textured material


def test_cornell_gltf_loads_and_renders():
    from strolle_tpu.camera import make_camera
    from strolle_tpu.models.reference import trace_sample

    scene = cornell_gltf()
    assert scene.geometry.num_triangles == 32
    cam = make_camera(
        eye=[0, 1, 3.2], target=[0, 1, 0], width=32, height=32,
        fov_y=np.deg2rad(45),
    )
    img = np.asarray(
        trace_sample(scene, cam, jnp.uint32(0), depth=1, include_sky=False)
    )
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_dungeon_renders_with_bvh():
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.models.reference import trace_sample

    scene = scene_with_bvh(dungeon())
    cam = dungeon_camera(48, 36)
    img = np.asarray(
        trace_sample(scene, cam, jnp.uint32(1), depth=1, include_sky=False)
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # lights visible
