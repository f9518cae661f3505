"""Pallas kernels validated in interpreter mode against the jnp path."""

import numpy as np
import jax.numpy as jnp

from strolle_tpu.ops.hit import surface_at
from strolle_tpu.ops.pallas.trace_kernels import (
    pack_geometry,
    pack_triangles,
    trace_anyhit_brute_pallas,
    trace_closest_brute_pallas,
    trace_surface_pallas,
)
from strolle_tpu.ops.trace import trace_anyhit_brute, trace_closest_brute
from strolle_tpu.scene.cornell import cornell_box


def _rays(n, seed=0):
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(-0.9, 0.9, (n, 3)).astype(np.float32))
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def _padded(rows, k):
    pad = (-rows.shape[0]) % 8
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, k), rows.dtype)])
    return rows


def test_closest_kernel_matches_jnp():
    scene = cornell_box()
    rows = _padded(pack_triangles(scene.geometry.positions), 12)
    o, d = _rays(1200)
    ref = trace_closest_brute(scene, o, d)
    t, tri, u, v = trace_closest_brute_pallas(rows, o, d, interpret=True)
    tt = np.where(np.isfinite(np.asarray(t)), np.asarray(t), 1e30)
    rt = np.where(np.isfinite(np.asarray(ref.t)), np.asarray(ref.t), 1e30)
    assert np.allclose(tt, rt, atol=1e-4)
    assert (np.asarray(tri) == np.asarray(ref.tri)).all()


def test_anyhit_kernel_matches_jnp():
    scene = cornell_box()
    rows = _padded(pack_triangles(scene.geometry.positions), 12)
    o, d = _rays(1200, seed=2)
    t_max = jnp.full((1200,), 1.3, jnp.float32)
    ref = trace_anyhit_brute(scene, o, d, t_max)
    occ = trace_anyhit_brute_pallas(rows, o, d, t_max, interpret=True)
    assert (np.asarray(occ) == np.asarray(ref)).all()


def test_surface_kernel_matches_surface_at():
    scene = cornell_box()
    rows = _padded(pack_geometry(scene.geometry), 28)
    o, d = _rays(1200, seed=3)
    out = trace_surface_pallas(rows, o, d, interpret=True)
    hit = trace_closest_brute(scene, o, d)
    surf = surface_at(scene, o, d, hit)
    some = np.asarray(hit.is_some)
    assert (np.asarray(out["tri"]) == np.asarray(hit.tri)).all()
    assert np.allclose(
        np.asarray(out["normal"])[some], np.asarray(surf.normal)[some], atol=1e-4
    )
    assert np.allclose(
        np.asarray(out["uv"])[some], np.asarray(surf.uv)[some], atol=1e-4
    )
    assert (
        np.asarray(out["mat_id"])[some] == np.asarray(surf.material_id)[some]
    ).all()


def test_ref_megakernel_matches_oracle():
    """The megakernel steps the same PCG stream as the jnp oracle path,
    so a single path-traced sample must match per pixel (ref_shading.rs
    semantics, fused; see ops/pallas/ref_kernel.py)."""
    import jax.numpy as jnp

    from strolle_tpu.camera import pixel_rays, screen_grid
    from strolle_tpu.models.reference import (
        _sample_pixels_megakernel,
        sample_pixels,
    )
    from strolle_tpu.ops import rng
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera

    scene = cornell_box()
    camera = cornell_camera(64, 48)
    grid = screen_grid(camera)
    seed = jnp.uint32(11)

    want = sample_pixels(
        scene, camera, grid, seed, depth=2, include_sky=False,
        use_pallas=False,
    )
    o, d = pixel_rays(camera, grid)
    state = rng.wnoise_new(seed, grid[..., 0], grid[..., 1])
    got = _sample_pixels_megakernel(
        scene, o, d, state, depth=2, interpret=True
    )
    # The kernel replays the oracle's PCG stream, so pixels match
    # sample-for-sample — except at triangle edges, where the kernel's
    # Baldwin-Weber intersection rounds differently from the oracle's
    # Möller-Trumbore and a binary visibility decision can flip. Those
    # are rare (<1%) and unbiased, so the means also agree tightly.
    diff = np.abs(np.asarray(got) - np.asarray(want)).max(axis=-1)
    assert (diff <= 2e-3).mean() > 0.99, (diff > 2e-3).mean()
    assert abs(np.asarray(got).mean() - np.asarray(want).mean()) < 5e-3


def test_ref_megakernel_spot_and_range_lights_match_oracle():
    """The three copies of the shading math (jnp oracle, megakernel,
    surface kernel) agree on Cornell, but Cornell exercises neither
    spot-angle falloff nor finite-range attenuation — pin those too
    (light.rs:143-207 semantics)."""
    import numpy as np
    import jax.numpy as jnp

    from strolle_tpu.camera import pixel_rays, screen_grid
    from strolle_tpu.models.reference import (
        _sample_pixels_megakernel,
        sample_pixels,
    )
    from strolle_tpu.ops import rng
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera
    from strolle_tpu.scene.types import LIGHT_SPOT, make_lights

    scene = cornell_box()
    lights = make_lights(
        [
            {  # downward spot over the left box
                "pos": [-0.4, 0.9, -0.3],
                "radius": 0.03,
                "color": [4.0, 3.5, 3.0],
                "kind": LIGHT_SPOT,
                "spot_dir": [0.0, -1.0, 0.0],
                "spot_angle": 0.7,
                "range": np.inf,
            },
            {  # finite-range point light near the right wall
                "pos": [0.6, 0.3, 0.2],
                "radius": 0.02,
                "color": [2.0, 2.0, 2.5],
                "range": 1.2,
            },
        ]
    )
    scene = scene.replace(lights=lights)
    camera = cornell_camera(48, 32)
    grid = screen_grid(camera)
    seed = jnp.uint32(21)

    want = sample_pixels(
        scene, camera, grid, seed, depth=1, include_sky=False,
        use_pallas=False,
    )
    o, d = pixel_rays(camera, grid)
    state = rng.wnoise_new(seed, grid[..., 0], grid[..., 1])
    got = _sample_pixels_megakernel(scene, o, d, state, depth=1, interpret=True)

    diff = np.abs(np.asarray(got) - np.asarray(want)).max(axis=-1)
    assert (diff <= 2e-3).mean() > 0.99, (diff > 2e-3).mean()
    assert abs(np.asarray(got).mean() - np.asarray(want).mean()) < 5e-3
