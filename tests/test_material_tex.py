"""Metallic-roughness texture sampling (material.rs:44-58 semantics:
multiplier = [1, roughness, metallic, 1]; texel G channel scales
roughness, B channel scales metallic)."""

import numpy as np
import jax.numpy as jnp

from strolle_tpu.ops.trace import trace_surface
from strolle_tpu.scene.build import MeshBuilder
from strolle_tpu.scene.types import Atlas, Scene, make_lights, make_materials


def _mr_scene(rough_factor: float, metal_factor: float) -> Scene:
    """One quad at z=0 spanning [-1,1]^2, uv.x goes 0 -> 1 left to
    right. Atlas: G channel ramps 0 -> 1 along x, B channel fixed 0.5."""
    b = MeshBuilder()
    b.add_quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0], 0)
    size = 32
    img = np.zeros((size, size, 4), np.float32)
    img[..., 1] = np.linspace(0.0, 1.0, size)[None, :]  # G ramp along x
    img[..., 2] = 0.5  # B constant
    img[..., 0] = 1.0
    img[..., 3] = 1.0
    mats = make_materials(
        [
            {
                "base_color": [1.0, 1.0, 1.0, 1.0],
                "roughness": rough_factor,
                "metallic": metal_factor,
                "metallic_roughness_tex": [0.0, 0.0, 1.0, 1.0],
            }
        ]
    )
    return Scene(
        geometry=b.build(),
        materials=mats,
        lights=make_lights([]),
        atlas=Atlas(image=jnp.asarray(img)),
        sun_azimuth=jnp.asarray(0.0, jnp.float32),
        sun_altitude=jnp.asarray(-1.0, jnp.float32),
    )


def _surf_at(scene, x):
    o = jnp.asarray([[x, 0.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    return trace_surface(scene, o, d)


def test_roughness_varies_across_triangle():
    scene = _mr_scene(rough_factor=1.0, metal_factor=1.0)
    left = _surf_at(scene, -0.9)
    right = _surf_at(scene, 0.9)
    rl = float(left.roughness[0])
    rr = float(right.roughness[0])
    # G ramp: near 0 at uv.x=0.05, near 1 at uv.x=0.95
    assert rl < 0.15, rl
    assert rr > 0.85, rr
    # B constant 0.5 scales the metallic factor everywhere
    assert np.isclose(float(left.metallic[0]), 0.5, atol=0.05)
    assert np.isclose(float(right.metallic[0]), 0.5, atol=0.05)


def test_factors_scale_texels():
    scene = _mr_scene(rough_factor=0.5, metal_factor=0.2)
    right = _surf_at(scene, 0.9)
    assert np.isclose(float(right.roughness[0]), 0.5 * 0.95, atol=0.05)
    assert np.isclose(float(right.metallic[0]), 0.2 * 0.5, atol=0.02)


def test_untextured_material_keeps_factors():
    scene = _mr_scene(rough_factor=0.7, metal_factor=0.3)
    # zero out the rect -> untextured path
    mats = scene.materials.replace(
        metallic_roughness_tex=jnp.zeros_like(
            jnp.asarray(scene.materials.metallic_roughness_tex)
        )
    )
    scene = scene.replace(materials=mats)
    s = _surf_at(scene, 0.0)
    assert np.isclose(float(s.roughness[0]), 0.7, atol=1e-5)
    assert np.isclose(float(s.metallic[0]), 0.3, atol=1e-5)
