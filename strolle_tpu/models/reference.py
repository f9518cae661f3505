"""Brute-force path-traced reference mode — the framework's oracle.

Reimplements CameraMode::Reference semantics
(strolle/src/camera_controller.rs:101-111 +
strolle-shaders/src/{ref_tracing,ref_shading}.rs) as ONE jitted
function: instead of 2(depth+1) kernel dispatches with ray state
round-tripped through Vec4 buffers, the bounce loop is unrolled inside
a single XLA program, carrying (origin, dir, color, throughput, alive)
as registers. Accumulation across frames resets when the camera moves
(Camera::is_eq tolerance, camera.rs:103-106).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera, screen_grid
from ..ops import brdf, rng
from ..ops.lights import gather_light, radiance, shadow_ray_wnoise
from ..ops.trace import trace_anyhit, trace_surface
from ..scene.types import Scene
from ..sky.atmosphere import sample_sky, sun_direction
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class RefAccumulator:
    """Running average state (ref_colors texture + camera snapshot)."""

    color: jnp.ndarray  # f32[H, W, 3]  sum of samples
    samples: jnp.ndarray  # f32[H, W]   sample count (colors.w)
    projection_view: jnp.ndarray  # f32[4, 4] camera at last accumulation


def init_accumulator(camera: Camera) -> RefAccumulator:
    h, w = camera.height, camera.width
    return RefAccumulator(
        color=jnp.zeros((h, w, 3), jnp.float32),
        samples=jnp.zeros((h, w), jnp.float32),
        projection_view=jnp.zeros((4, 4), jnp.float32),
    )


def sample_pixels(
    scene: Scene,
    camera: Camera,
    grid: jnp.ndarray,  # i32[..., 2] pixel coords
    seed: jnp.ndarray,
    depth: int = 5,
    include_sky: bool = True,
    use_pallas: bool | None = None,
    luts=None,
):
    """One path-traced sample for each pixel in ``grid``; returns
    radiance [..., 3]. Takes explicit pixel coords so callers can shard
    the pixel axis across a device mesh (parallel/sharding.py).

    ``use_pallas=False`` forces the differentiable jnp trace path
    (gradients do not flow through the Pallas kernels).

    Follows ref_shading.rs bounce logic: emissive + single-light NEE +
    layered-BRDF continuation, with material regularization for
    depth > 0 (ref_shading.rs:107-109).
    """
    from ..camera import pixel_rays

    o, d = pixel_rays(camera, grid)
    state = rng.wnoise_new(seed, grid[..., 0], grid[..., 1])

    # Megakernel fast path: the whole bounce loop in one Pallas kernel
    # (ops/pallas/ref_kernel.py) — no XLA glue between bounces. Falls
    # back to the staged jnp path for gradients (use_pallas=False),
    # sky, textures, alpha, or large scenes (the kernel is brute-force).
    from ..ops.trace import BRUTE_FORCE_MAX_TRIS, _pallas_available

    if (
        use_pallas is not False
        and _pallas_available()
        and not include_sky
        and luts is None
        and scene.atlas is None
        and not scene.has_alpha
        and scene.geometry.num_triangles <= BRUTE_FORCE_MAX_TRIS
    ):
        return _sample_pixels_megakernel(scene, o, d, state, depth)

    hw = o.shape[:-1]
    color = jnp.zeros(hw + (3,), jnp.float32)
    throughput = jnp.ones(hw + (3,), jnp.float32)
    alive = jnp.ones(hw, bool)

    sun = sun_direction(scene.sun_azimuth, scene.sun_altitude)
    lcount = scene.lights.count
    has_lights = lcount > 0

    for bounce in range(depth + 1):
        surf = trace_surface(
            scene, o, d, regularize=bounce > 0, use_pallas=use_pallas
        )

        # sky on miss (ref_shading.rs:95-103)
        missed = alive & ~surf.is_some
        if include_sky:
            if luts is not None:
                from ..sky.atmosphere import sample_atmosphere

                sky = sample_atmosphere(luts, sun, d)
            else:
                sky = sample_sky(sun, d)
            color = jnp.where(missed[..., None], color + throughput * sky, color)
        alive = alive & surf.is_some

        # emissive
        color = jnp.where(
            alive[..., None], color + throughput * surf.emissive, color
        )

        # next-event estimation: 1 uniformly-chosen light
        state, word = rng.next_u32(state)
        light_id = (word % jnp.maximum(lcount, 1).astype(jnp.uint32)).astype(
            jnp.int32
        )
        light = gather_light(scene.lights, light_id)
        state, sr_o, sr_d, sr_len = shadow_ray_wnoise(state, light, surf.point)
        occluded = trace_anyhit(scene, sr_o, sr_d, sr_len)
        light_pdf = 1.0 / jnp.maximum(lcount.astype(jnp.float32), 1.0)
        nee = radiance(light, surf).sum / light_pdf
        take = alive & has_lights & ~occluded
        color = jnp.where(take[..., None], color + throughput * nee, color)

        # continuation ray
        if bounce < depth:
            state, new_dir, pdf, rad = brdf.layered_sample(
                state,
                surf.base_color,
                surf.metallic,
                surf.roughness,
                surf.reflectance,
                surf.normal,
                -d,
            )
            alive = alive & (pdf > 0.0)
            cos = jnp.sum(new_dir * surf.normal, axis=-1)
            throughput = throughput * (
                cos[..., None] * rad / jnp.maximum(pdf, 1e-20)[..., None]
            )
            o = surf.point
            d = jnp.where(alive[..., None], new_dir, d)

    return color


def _sample_pixels_megakernel(scene, o, d, state, depth, interpret=False):
    from ..ops.pallas.ref_kernel import (
        pack_geometry_bw,
        pack_lights,
        pack_materials,
        trace_sample_megakernel,
    )

    rows = pack_geometry_bw(scene.geometry)
    pad = (-rows.shape[0]) % 8
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, 24), rows.dtype)])
    sg = jax.lax.stop_gradient
    return trace_sample_megakernel(
        sg(rows),
        sg(pack_materials(scene.materials)),
        sg(pack_lights(scene.lights)),
        scene.lights.count,
        sg(o),
        sg(d),
        state,
        depth=depth,
        interpret=interpret,
        flat=scene.flat_normals,
        no_metal=not scene.has_metal,
    )


def trace_sample(
    scene: Scene,
    camera: Camera,
    seed: jnp.ndarray,
    depth: int = 5,
    include_sky: bool = True,
    use_pallas: bool | None = None,
    luts=None,
):
    """One path-traced sample per pixel over the full screen [H, W, 3]."""
    return sample_pixels(
        scene, camera, screen_grid(camera), seed, depth, include_sky,
        use_pallas, luts,
    )


def render_reference(
    scene: Scene,
    camera: Camera,
    accum: RefAccumulator,
    seed: jnp.ndarray,
    depth: int = 5,
    include_sky: bool = True,
    luts=None,
):
    """Accumulating reference render. Returns (image [H,W,3], accum').

    When the sky is on and no LUTs are supplied, they are fetched from
    the sun-altitude-keyed host cache (sky/atmosphere.luts_for): the
    analytic per-pixel march would otherwise be inlined once per
    bounce, bloating the executable ~100x and permanently degrading
    every later dispatch in the process on the TPU runtime.

    Behavior change vs round 1: include_sky=True with luts=None now
    renders with the cached-LUT sky rather than the analytic march
    (matches upstream's LUT policy, passes/atmosphere.rs:76-112);
    ground-truth output shifted accordingly — regenerate stored
    reference images."""
    if include_sky and luts is None:
        alt = scene.sun_altitude
        if not isinstance(alt, jax.core.Tracer):
            from ..sky.atmosphere import luts_for

            luts = luts_for(float(alt))
    return _render_reference(
        scene, camera, accum, seed, depth, include_sky, luts
    )


@partial(jax.jit, static_argnames=("depth", "include_sky"))
def _render_reference(
    scene: Scene,
    camera: Camera,
    accum: RefAccumulator,
    seed: jnp.ndarray,
    depth: int = 5,
    include_sky: bool = True,
    luts=None,
):
    sample = trace_sample(scene, camera, seed, depth, include_sky, luts=luts)
    keep = jnp.all(
        jnp.abs(accum.projection_view - camera.projection_view) <= 0.0025
    )
    keep_f = keep.astype(jnp.float32)
    color = accum.color * keep_f + sample
    samples = accum.samples * keep_f + 1.0
    image = color / jnp.maximum(samples, 1.0)[..., None]
    return image, RefAccumulator(
        color=color,
        samples=samples,
        projection_view=camera.projection_view,
    )
