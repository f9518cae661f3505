"""Light radiance evaluation + shadow-ray sampling.

Batched SoA re-derivation of strolle-gpu/src/light.rs:143-239:
spherical lights with spot-angle falloff, smooth inverse-square range
attenuation, Lambert cosine, diffuse BRDF, and representative-point
sphere-light specular with roughness widening. Light parameters are
gathered by id so callers can evaluate arbitrary (pixel, light)
pairings.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene.types import LIGHT_POINT, Lights
from . import brdf, math as vm, rng


class LightGather(NamedTuple):
    """Per-lane light parameters (one light per lane, gathered by id)."""

    pos: jnp.ndarray  # f32[..., 3]
    radius: jnp.ndarray  # f32[...]
    color: jnp.ndarray  # f32[..., 3]
    range: jnp.ndarray  # f32[...]
    kind: jnp.ndarray  # i32[...]
    spot_dir: jnp.ndarray  # f32[..., 3]
    spot_angle: jnp.ndarray  # f32[...]


#: Finite stand-in for "unlimited range": inf cannot ride through the
#: one-hot matmul (unselected rows would contribute 0 * inf = NaN).
RANGE_UNLIMITED = 1e30


def _light_table(lights: Lights, prev: bool) -> jnp.ndarray:
    """[L, 13] packed rows so one one-hot matmul fetches a full light
    (per-field gathers hit the TPU slow path — see ops/gather.py)."""
    if prev:
        cols = [
            lights.prev_pos, lights.prev_radius[:, None], lights.prev_color,
            lights.prev_range[:, None],
            lights.prev_kind.astype(jnp.float32)[:, None],
            lights.prev_spot_dir, lights.prev_spot_angle[:, None],
        ]
    else:
        cols = [
            lights.pos, lights.radius[:, None], lights.color,
            lights.range[:, None], lights.kind.astype(jnp.float32)[:, None],
            lights.spot_dir, lights.spot_angle[:, None],
        ]
    table = jnp.concatenate(cols, axis=-1)
    return jnp.minimum(table, RANGE_UNLIMITED)


def gather_light(lights: Lights, light_id: jnp.ndarray, prev: bool = False) -> LightGather:
    from .gather import gather_rows

    i = jnp.clip(light_id, 0, lights.capacity - 1)
    rows = gather_rows(_light_table(lights, prev), i)
    return LightGather(
        pos=rows[..., 0:3],
        radius=rows[..., 3],
        color=rows[..., 4:7],
        range=rows[..., 7],
        kind=rows[..., 8].astype(jnp.int32),
        spot_dir=rows[..., 9:12],
        spot_angle=rows[..., 12],
    )


class LightRadiance(NamedTuple):
    radiance: jnp.ndarray  # f32[..., 3]
    diff_brdf: jnp.ndarray  # f32[..., 3]
    spec_brdf: jnp.ndarray  # f32[..., 3]

    @property
    def sum(self) -> jnp.ndarray:
        return self.radiance * (self.diff_brdf + self.spec_brdf)


def radiance(light: LightGather, surf) -> LightRadiance:
    """Light::radiance (light.rs:143-207) against a Surface pytree."""
    l_vec = light.pos - surf.point

    # spot-angle falloff. The clip stays strictly inside (-1, 1):
    # d/dx arccos(+-1) = inf, and a perfectly (anti)aligned direction —
    # routine on point lights, whose f_angle where() discards the value
    # but not the backward NaN — would poison position gradients.
    to_point = vm.normalize(surf.point - light.pos)
    cosang = jnp.clip(
        vm.dot(vm.normalize(light.spot_dir), to_point),
        -1.0 + 1e-6,
        1.0 - 1e-6,
    )
    angle = jnp.arccos(cosang)
    q = angle / jnp.maximum(light.spot_angle, 1e-6)
    spot_f = vm.saturate(1.0 - q * q * q)
    f_angle = jnp.where(light.kind == LIGHT_POINT, 1.0, spot_f)

    # smooth inverse-square distance falloff
    l2 = vm.length_squared(l_vec)
    inv_r2 = 1.0 / jnp.maximum(vm.sqr(light.range), 1e-12)
    factor = l2 * inv_r2
    smooth = vm.saturate(1.0 - factor * factor)
    attenuation = smooth * smooth / jnp.maximum(l2, 1e-4)
    unlimited = jnp.isinf(light.range) | (light.range >= RANGE_UNLIMITED)
    f_dist = jnp.where(unlimited, 1.0, attenuation)

    f_cos = vm.saturate(vm.dot(surf.normal, vm.normalize(l_vec)))

    diff = brdf.diffuse_eval(surf.base_color, surf.metallic)

    # representative-point sphere-light specular (light.rs:170-201)
    v = -surf.dir
    n = surf.normal
    r = vm.reflect(-v, n)
    center_to_ray = vm.dotk(l_vec, r) * r - l_vec
    t = vm.saturate(light.radius * _rsqrt(vm.length_squared(center_to_ray)))
    closest = l_vec + center_to_ray * t[..., None]
    inv_len = _rsqrt(vm.length_squared(closest))
    cr = brdf.clamped_roughness(surf.roughness)
    i_rough = cr / vm.saturate(cr + light.radius * 0.5 * inv_len)
    spec_dir = closest * inv_len[..., None]
    spec = vm.sqr(i_rough)[..., None] * brdf.specular_eval(
        surf.base_color, surf.metallic, surf.roughness, surf.reflectance,
        n, spec_dir, v,
    )

    rad = light.color * (f_angle * f_dist * f_cos)[..., None]
    return LightRadiance(radiance=rad, diff_brdf=diff, spec_brdf=spec)


def _rsqrt(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-20))


def shadow_ray_wnoise(state, light: LightGather, hit_point):
    """Light::ray_wnoise (light.rs:209-215): shadow ray *from* a point
    on the light sphere *toward* the hit. Returns
    (state, origin, dir, length)."""
    state, sph = rng.sample_sphere(state)
    light_pos = light.pos + light.radius[..., None] * sph
    to_hit = hit_point - light_pos
    length = vm.length(to_hit)
    return state, light_pos, vm.normalize(to_hit), length


def shadow_ray_bnoise(sample2, light: LightGather, hit_point):
    """Light::ray_bnoise (light.rs:217-239): blue-noise disk sample
    toward the light; returns (origin, dir, length) with the same
    light->hit orientation as the reference."""
    to_light = light.pos - hit_point
    dist = vm.length(to_light)
    ldir = to_light / jnp.maximum(dist, 1e-20)[..., None]
    lrad = light.radius / jnp.maximum(dist, 1e-20)
    tangent, bitangent = vm.any_orthonormal_pair(ldir)

    angle = 2.0 * jnp.pi * sample2[..., 0]
    radius = jnp.sqrt(jnp.maximum(sample2[..., 1], 0.0))
    dx = jnp.sin(angle) * radius * lrad
    dy = jnp.cos(angle) * radius * lrad

    ray_dir = vm.normalize(ldir + dx[..., None] * tangent + dy[..., None] * bitangent)
    origin = hit_point + ray_dir * dist[..., None]
    return origin, -ray_dir, dist
