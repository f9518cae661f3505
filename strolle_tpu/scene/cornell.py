"""Procedural Cornell box — the framework's first-class test scene.

The reference ships a Cornell glTF asset + an orbiting point light
(bevy-strolle/examples/cornell.rs); here the classic box is generated
procedurally so tests need no asset files. Interior faces use inward
normals; an emissive panel sits under the ceiling and a point light
provides NEE-friendly direct lighting.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .build import MeshBuilder
from .types import (
    LIGHT_POINT,
    Scene,
    compute_static_flags,
    make_lights,
    make_materials,
)

# material slots
MAT_WHITE = 0
MAT_RED = 1
MAT_GREEN = 2
MAT_LAMP = 3
MAT_METAL = 4


def cornell_box(
    light_intensity: float = 6.0,
    emissive_lamp: bool = False,
    metallic_tall_box: bool = False,
    light_capacity: int = 4,
    boxes: bool = True,
) -> Scene:
    """Box spanning x,z in [-1, 1], y in [0, 2], open toward +z camera."""
    b = MeshBuilder()

    f = [-1.0, 1.0]  # shorthand

    # floor (y=0, normal +y)
    b.add_quad([-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1], MAT_WHITE)
    # ceiling (y=2, normal -y)
    b.add_quad([-1, 2, 1], [1, 2, 1], [1, 2, -1], [-1, 2, -1], MAT_WHITE)
    # back wall (z=-1, normal +z)
    b.add_quad([-1, 0, -1], [-1, 2, -1], [1, 2, -1], [1, 0, -1], MAT_WHITE)
    # left wall (x=-1, red, normal +x)
    b.add_quad([-1, 0, -1], [-1, 0, 1], [-1, 2, 1], [-1, 2, -1], MAT_RED)
    # right wall (x=1, green, normal -x)
    b.add_quad([1, 0, -1], [1, 2, -1], [1, 2, 1], [1, 0, 1], MAT_GREEN)

    # lamp panel just below the ceiling (facing down)
    s = 0.35
    y = 1.995
    b.add_quad([-s, y, s], [s, y, s], [s, y, -s], [-s, y, -s], MAT_LAMP)

    def add_box(center, size, rot_y, mat):
        cx, cy, cz = center
        sx, sy, sz = size
        c, sn = np.cos(rot_y), np.sin(rot_y)

        def pt(dx, dy, dz):
            x, z = dx * sx * 0.5, dz * sz * 0.5
            xr = c * x + sn * z
            zr = -sn * x + c * z
            return [cx + xr, cy + dy * sy * 0.5, cz + zr]

        # 8 corners; dy in {-1, 1}
        quads = [
            # top
            ([-1, 1, 1], [1, 1, 1], [1, 1, -1], [-1, 1, -1]),
            # bottom
            ([-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1]),
            # +z
            ([-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]),
            # -z
            ([1, -1, -1], [-1, -1, -1], [-1, 1, -1], [1, 1, -1]),
            # +x
            ([1, -1, 1], [1, -1, -1], [1, 1, -1], [1, 1, 1]),
            # -x
            ([-1, -1, -1], [-1, -1, 1], [-1, 1, 1], [-1, 1, -1]),
        ]
        for q in quads:
            b.add_quad(*(pt(*d) for d in q), mat)

    if not boxes:
        # occluder-free variant: useful for visibility-gradient tests
        # (no shadow boundaries -> finite differences match autodiff)
        return _finish(b, light_intensity, emissive_lamp, light_capacity)

    add_box(
        center=[-0.37, 0.6, -0.35],
        size=[0.57, 1.2, 0.57],
        rot_y=np.deg2rad(17.0),
        mat=MAT_METAL if metallic_tall_box else MAT_WHITE,
    )
    add_box(
        center=[0.38, 0.3, 0.38],
        size=[0.58, 0.6, 0.58],
        rot_y=np.deg2rad(-18.0),
        mat=MAT_WHITE,
    )

    return _finish(b, light_intensity, emissive_lamp, light_capacity)


def _finish(
    b: MeshBuilder,
    light_intensity: float,
    emissive_lamp: bool,
    light_capacity: int,
) -> Scene:
    lamp_emissive = light_intensity if emissive_lamp else 0.0
    materials = make_materials(
        [
            {"base_color": [0.73, 0.73, 0.73, 1.0], "roughness": 1.0},
            {"base_color": [0.61, 0.06, 0.06, 1.0], "roughness": 1.0},
            {"base_color": [0.12, 0.45, 0.12, 1.0], "roughness": 1.0},
            {
                "base_color": [1.0, 1.0, 1.0, 1.0],
                "emissive": [lamp_emissive] * 3 + [1.0],
                "roughness": 1.0,
            },
            {
                "base_color": [0.95, 0.95, 0.95, 1.0],
                "roughness": 0.05,
                "metallic": 1.0,
            },
        ]
    )

    lights = make_lights(
        [
            {
                "pos": [0.0, 1.85, 0.0],
                "radius": 0.05,
                "color": [light_intensity] * 3,
                "range": np.inf,
                "kind": LIGHT_POINT,
            }
        ],
        capacity=light_capacity,
    )

    geometry = b.build()
    return Scene(
        geometry=geometry,
        materials=materials,
        lights=lights,
        atlas=None,
        sun_azimuth=np.float32(0.0),
        sun_altitude=np.float32(-1.0),  # sun below horizon
        bvh=None,
        **compute_static_flags(geometry, materials),
    )


def cornell_camera(width: int = 512, height: int = 512):
    from ..camera import make_camera

    return make_camera(
        eye=[0.0, 1.0, 3.2],
        target=[0.0, 1.0, 0.0],
        fov_y=np.deg2rad(45.0),
        width=width,
        height=height,
    )
