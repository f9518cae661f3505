"""BRDF models: Lambert diffuse + GGX microfacet specular + layered mix.

Faithful re-derivation of strolle-gpu/src/brdf.rs as batched SoA
functions: same distributions, same (slightly non-standard) pdfs — the
reference pairs a uniform-in-cos-theta hemisphere sample with pdf=1/pi,
and we replicate that so renders converge to the same values.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as vm
from . import rng

MIN_ROUGHNESS = 0.089 * 0.089


def clamped_roughness(roughness):
    """gbuffer.rs:118-120."""
    return jnp.clip(roughness, MIN_ROUGHNESS, 1.0)


def diffuse_eval(base_color, metallic):
    """Lambert: base_color.rgb * (1 - metallic) / pi (brdf.rs:20-25)."""
    return base_color[..., :3] * ((1.0 - metallic) / jnp.pi)[..., None]


def diffuse_sample(state, normal):
    """Returns (state, dir, pdf). Reference pdf is 1/pi (brdf.rs:27-33)."""
    state, d = rng.sample_hemisphere(state, normal)
    pdf = jnp.full(normal.shape[:-1], 1.0 / jnp.pi, jnp.float32)
    return state, d, pdf


def _ggx_distribution(n_dot_h, roughness):
    a2 = roughness * roughness
    d = (n_dot_h * a2 - n_dot_h) * n_dot_h + 1.0
    return a2 / (jnp.pi * d * d)


def _ggx_schlick_masking(n_dot_l, n_dot_v, roughness):
    k = roughness * roughness / 2.0
    g_v = n_dot_v / (n_dot_v * (1.0 - k) + k)
    g_l = n_dot_l / (n_dot_l * (1.0 - k) + k)
    return g_v * g_l


def _ggx_schlick_fresnel(f0, l_dot_h):
    f90 = vm.saturate(jnp.sum(f0 * (50.0 * 0.33), axis=-1))
    x = jnp.maximum(1.0 - l_dot_h, 0.001)
    x2 = x * x
    p = x2 * x2 * x  # x**5 as multiplies (float pow lowers to exp/log)
    return f0 + (f90[..., None] - f0) * p[..., None]


def specular_eval(base_color, metallic, roughness, reflectance, normal, l, v):
    """GGX specular (brdf.rs:47-79). Zero where metallic <= 0 or
    backfacing."""
    a = clamped_roughness(roughness)
    h = vm.normalize(l + v)
    n_dot_l = vm.saturate(vm.dot(normal, l))
    n_dot_h = vm.saturate(vm.dot(normal, h))
    l_dot_h = vm.saturate(vm.dot(l, h))
    n_dot_v = vm.saturate(vm.dot(normal, v))

    d = _ggx_distribution(n_dot_h, a)
    g = _ggx_schlick_masking(n_dot_l, n_dot_v, a)
    f0 = (0.16 * reflectance * reflectance * (1.0 - metallic))[..., None] + (
        base_color[..., :3] * metallic[..., None]
    )
    f = _ggx_schlick_fresnel(f0, l_dot_h)

    denom = 4.0 * n_dot_l * n_dot_v
    spec = (d * g)[..., None] * f / jnp.maximum(denom, 1e-8)[..., None]
    ok = (metallic > 0.0) & (n_dot_l > 0.0) & (n_dot_v > 0.0)
    return jnp.where(ok[..., None], spec, 0.0)


def specular_sample(state, base_color, metallic, roughness, reflectance, normal, v):
    """NDF importance sampling (brdf.rs:82-113; VNDF is a TODO upstream
    too). Returns (state, dir, pdf, radiance)."""
    state, r0 = rng.next_f32(state)
    state, r1 = rng.next_f32(state)

    a = clamped_roughness(roughness)
    a2 = a * a
    b, t = vm.any_orthonormal_pair(normal)

    cos_theta = jnp.sqrt(
        jnp.maximum((1.0 - r0) / ((a2 - 1.0) * r0 + 1.0), 0.0)
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = r1 * jnp.pi * 2.0

    h = (
        t * (sin_theta * jnp.cos(phi))[..., None]
        + b * (sin_theta * jnp.sin(phi))[..., None]
        + normal * cos_theta[..., None]
    )
    n_dot_h = vm.saturate(vm.dot(normal, h))
    h_dot_v = vm.saturate(vm.dot(h, v))

    d = vm.normalize(2.0 * h_dot_v[..., None] * h - v)
    pdf = _ggx_distribution(n_dot_h, a) * n_dot_h / jnp.maximum(4.0 * h_dot_v, 1e-8)
    radiance = specular_eval(base_color, metallic, roughness, reflectance, normal, d, v)
    return state, d, pdf, radiance


def layered_sample(state, base_color, metallic, roughness, reflectance, normal, v):
    """LayeredBrdf::sample (brdf.rs:125-139): pick the specular lobe with
    probability `metallic`, else diffuse; divide pdf by pick probability.

    Returns (state, dir, pdf, radiance[..., 3]). Lanes where pdf == 0
    are invalid samples (BrdfSample::is_invalid).
    """
    state, pick = rng.next_f32(state)
    use_spec = pick < metallic

    # Evaluate both lobes with a forked-but-identical stream: the
    # reference consumes 2 uniforms for either branch (hemisphere: 2,
    # GGX: 2), so stepping the shared state twice keeps replay parity.
    spec_state, s_dir, s_pdf, s_rad = specular_sample(
        state, base_color, metallic, roughness, reflectance, normal, v
    )
    diff_state, d_dir, d_pdf = diffuse_sample(state, normal)
    d_rad = diffuse_eval(base_color, metallic)

    new_state = jnp.where(use_spec, spec_state, diff_state)
    direction = jnp.where(use_spec[..., None], s_dir, d_dir)
    pdf = jnp.where(
        use_spec,
        s_pdf / jnp.maximum(metallic, 1e-8),
        d_pdf / jnp.maximum(1.0 - metallic, 1e-8),
    )
    radiance = jnp.where(use_spec[..., None], s_rad, d_rad)
    return new_state, direction, pdf, radiance
