"""Alpha-tested transparency in traversal (ray.rs:212-229 semantics:
a hit on an AlphaMode::Blend material with sampled base-color alpha < 1
does not count — closest-hit skips past it, shadow rays pass through)."""

import numpy as np
import jax.numpy as jnp

from strolle_tpu.ops.trace import trace_anyhit, trace_closest, trace_surface
from strolle_tpu.scene.build import MeshBuilder
from strolle_tpu.scene.types import Scene, make_lights, make_materials


def _two_pane_scene(alpha: float, blend: int) -> Scene:
    """Pane A at z=0 (material 0, alpha configurable), pane B at z=-2
    (material 1, opaque). Camera rays fly along -z."""
    b = MeshBuilder()
    b.add_quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0], 0)
    b.add_quad([-1, -1, -2], [1, -1, -2], [1, 1, -2], [-1, 1, -2], 1)
    mats = [
        {"base_color": [1.0, 1.0, 1.0, alpha], "alpha_blend": blend},
        {"base_color": [0.5, 0.5, 0.5, 1.0]},
    ]
    return Scene(
        geometry=b.build(),
        materials=make_materials(mats),
        lights=make_lights([]),
        atlas=None,
        sun_azimuth=jnp.asarray(0.0, jnp.float32),
        sun_altitude=jnp.asarray(-1.0, jnp.float32),
        has_alpha=bool(blend),
    )


_O = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
_D = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)


def test_opaque_pane_blocks():
    scene = _two_pane_scene(alpha=1.0, blend=0)
    hit = trace_closest(scene, _O, _D)
    assert np.isclose(float(hit.t[0]), 1.0, atol=1e-5)
    assert bool(trace_anyhit(scene, _O, _D, jnp.asarray([10.0]))[0])


def test_transparent_pane_skipped_closest():
    scene = _two_pane_scene(alpha=0.25, blend=1)
    hit = trace_closest(scene, _O, _D)
    # ray skips the alpha pane (z=0) and lands on the opaque one (z=-2)
    assert np.isclose(float(hit.t[0]), 3.0, atol=1e-3)
    surf = trace_surface(scene, _O, _D)
    assert np.allclose(np.asarray(surf.base_color[0, :3]), 0.5, atol=1e-5)


def test_blend_material_with_full_alpha_still_hits():
    scene = _two_pane_scene(alpha=1.0, blend=1)
    hit = trace_closest(scene, _O, _D)
    assert np.isclose(float(hit.t[0]), 1.0, atol=1e-5)


def test_transparent_pane_does_not_occlude():
    scene = _two_pane_scene(alpha=0.25, blend=1)
    # shadow ray stopping before the far pane: only the alpha pane is in
    # range and it doesn't occlude
    assert not bool(trace_anyhit(scene, _O, _D, jnp.asarray([2.0]))[0])
    # longer ray reaches the opaque pane
    assert bool(trace_anyhit(scene, _O, _D, jnp.asarray([10.0]))[0])


def test_miss_behind_transparent():
    b = MeshBuilder()
    b.add_quad([-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0], 0)
    scene = Scene(
        geometry=b.build(),
        materials=make_materials([{"base_color": [1, 1, 1, 0.0], "alpha_blend": 1}]),
        lights=make_lights([]),
        atlas=None,
        sun_azimuth=jnp.asarray(0.0, jnp.float32),
        sun_altitude=jnp.asarray(-1.0, jnp.float32),
        has_alpha=True,
    )
    hit = trace_closest(scene, _O, _D)
    assert not bool(hit.is_some[0])
    assert not bool(trace_anyhit(scene, _O, _D, jnp.asarray([10.0]))[0])
