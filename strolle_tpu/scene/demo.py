"""Demo scenes from the reference's bundled assets.

Mirrors bevy-strolle/examples/{demo.rs,cornell.rs}: the dungeon level
(demo/level.glb) with its point lights, and the Cornell glTF with an
orbiting point light. Zips auto-extract on first use
(examples/_common.rs:18-46 behavior).
"""

from __future__ import annotations

import os
import zipfile

import numpy as np

from .gltf import load_gltf
from .types import LIGHT_POINT, Scene

_ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
)


def _extract(zip_name: str, member: str) -> str:
    path = os.path.join(_ASSETS, member)
    if not os.path.exists(path):
        with zipfile.ZipFile(os.path.join(_ASSETS, zip_name)) as z:
            z.extractall(_ASSETS)
    return path


def dungeon(light_intensity: float = 8.0, **kwargs) -> Scene:
    """The demo dungeon level (8.4k textured triangles).

    Lights follow the spirit of examples/demo.rs: a handful of point
    lights along the level's corridors.
    """
    glb = _extract("demo.zip", os.path.join("demo", "level.glb"))
    c = light_intensity
    lights = [
        {"pos": [-3.0, 0.75, -0.75], "radius": 0.05, "color": [c * 0.9, c * 0.75, c * 0.5], "kind": LIGHT_POINT, "range": 20.0},
        {"pos": [0.25, 0.75, 0.0], "radius": 0.05, "color": [c * 0.9, c * 0.75, c * 0.5], "kind": LIGHT_POINT, "range": 20.0},
        {"pos": [3.0, 0.75, -0.75], "radius": 0.05, "color": [c * 0.9, c * 0.75, c * 0.5], "kind": LIGHT_POINT, "range": 20.0},
        {"pos": [6.0, 0.75, 0.0], "radius": 0.05, "color": [c * 0.7, c * 0.8, c], "kind": LIGHT_POINT, "range": 20.0},
        {"pos": [-6.0, 0.75, 0.0], "radius": 0.05, "color": [c * 0.7, c * 0.8, c], "kind": LIGHT_POINT, "range": 20.0},
        {"pos": [0.0, 2.0, 3.0], "radius": 0.08, "color": [c, c, c], "kind": LIGHT_POINT, "range": 30.0},
    ]
    return load_gltf(glb, lights=lights, **kwargs)


def dungeon_camera(width: int = 640, height: int = 480):
    from ..camera import make_camera

    return make_camera(
        eye=[0.0, 2.2, 7.0],
        target=[0.0, 0.8, 0.0],
        fov_y=np.deg2rad(55.0),
        width=width,
        height=height,
    )


def cornell_gltf(**kwargs) -> Scene:
    """The Cornell glTF asset (t-ly, CC-BY-4.0; see assets license)."""
    path = _extract("cornell.zip", os.path.join("cornell", "scene.gltf"))
    lights = [
        {
            "pos": [0.0, 1.5, 0.0],
            "radius": 0.05,
            "color": [2.5, 2.5, 2.5],
            "kind": LIGHT_POINT,
            "range": np.inf,
        }
    ]
    return load_gltf(path, lights=lights, **kwargs)
