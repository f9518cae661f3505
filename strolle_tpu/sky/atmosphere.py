"""Hillaire-style sky/atmosphere model.

Constants mirror strolle-gpu/src/atmosphere.rs:19-70 (planet radii,
Rayleigh/Mie/ozone coefficients, LUT resolutions). This module exposes:

* `sample_sky(sun_dir, ray_dir)` — radiance toward `ray_dir` via the
  direct analytic single-scattering march (`_raymarch_scattering`);
  kept as the CPU/test fallback only — never inline it into a frame
  program (see models/restir.py program-size notes).
* `luts_for(sun_altitude)` / `sample_atmosphere(luts, sun, dir)` — the
  LUT-cached pipeline (transmittance/multi-scatter/sky-view, generated
  by jitted functions and keyed on sun altitude like
  passes/atmosphere.rs:76-112). This is the production sky path.
* `sun_direction(azimuth, altitude)` — world.rs:18-25.

The fast path used by renders with the sun below the horizon returns
black, matching the ground-occlusion behavior of atmosphere.rs:86-106.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import math as vm

# --- constants (atmosphere.rs:19-70) ---------------------------------------
# Vector constants are NUMPY arrays on purpose: a module-level jnp
# array is a committed device buffer the jitted program must
# closure-capture. Rounds 1-4 observed multi-minute hangs from that on
# the axon runtime; the r5 re-probe shows no hang but still a ~1 s
# first-dispatch penalty — an np constant embeds an HLO literal and is
# clean either way.
GROUND_RADIUS_MM = 6.360
ATMOSPHERE_RADIUS_MM = 6.460
VIEW_POS = np.asarray([0.0, GROUND_RADIUS_MM + 0.0002, 0.0], np.float32)

RAYLEIGH_SCATTERING_BASE = np.asarray([5.802, 13.558, 33.1], np.float32)
RAYLEIGH_ABSORPTION_BASE = 0.0
MIE_SCATTERING_BASE = 3.996
MIE_ABSORPTION_BASE = 4.4
OZONE_ABSORPTION_BASE = np.asarray([0.650, 1.881, 0.085], np.float32)
GROUND_ALBEDO = 0.25
EXPOSURE = 20.0

TRANSMITTANCE_LUT_RES = (256, 64)
SCATTERING_LUT_RES = (32, 32)
SKY_LUT_RES = (256, 256)

SUN_DISTANCE = 1000.0  # world.rs SUN_DISTANCE


def sun_direction(azimuth, altitude):
    """world.rs:18-25 spherical -> cartesian."""
    return jnp.stack(
        [
            jnp.cos(altitude) * jnp.sin(azimuth),
            jnp.sin(altitude),
            -jnp.cos(altitude) * jnp.cos(azimuth),
        ],
        axis=-1,
    )


def _atmosphere_density(altitude_mm):
    """Rayleigh/Mie/ozone density profiles (atmosphere/utils.rs).

    Altitude is clamped: marches toward a below-horizon sun can dip
    below the ground sphere, where exp(-altitude/H) overflows to inf
    and poisons the extinction sum with 0*inf = NaN."""
    altitude_km = jnp.clip(altitude_mm * 1000.0, -0.5, 120.0)
    rayleigh = jnp.exp(-altitude_km / 8.0)
    mie = jnp.exp(-altitude_km / 1.2)
    ozone = jnp.maximum(0.0, 1.0 - jnp.abs(altitude_km - 25.0) / 15.0)
    return rayleigh, mie, ozone


def _scattering_values(pos):
    """Returns (rayleigh_scat[3], mie_scat, extinction[3]) at pos."""
    altitude = vm.length(pos) - GROUND_RADIUS_MM
    rayleigh_d, mie_d, ozone_d = _atmosphere_density(altitude)
    rayleigh_scat = RAYLEIGH_SCATTERING_BASE * rayleigh_d[..., None]
    mie_scat = MIE_SCATTERING_BASE * mie_d
    mie_abs = MIE_ABSORPTION_BASE * mie_d
    ozone_abs = OZONE_ABSORPTION_BASE * ozone_d[..., None]
    extinction = (
        rayleigh_scat
        + (RAYLEIGH_ABSORPTION_BASE * rayleigh_d + mie_scat + mie_abs)[..., None]
        + ozone_abs
    )
    return rayleigh_scat, mie_scat, extinction


def _rayleigh_phase(cos_theta):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_theta * cos_theta)


def _mie_phase(cos_theta):
    g = 0.8
    scale = 3.0 / (8.0 * jnp.pi)
    num = (1.0 - g * g) * (1.0 + cos_theta * cos_theta)
    den = (2.0 + g * g) * jnp.power(
        jnp.maximum(1.0 + g * g - 2.0 * g * cos_theta, 1e-7), 1.5
    )
    return scale * num / den


def transmittance(pos, sun_dir, steps: int = 40):
    """Optical-depth march toward the sun
    (generate_transmittance_lut.rs:29-58); also evaluated host-side for
    the sun light color (strolle/src/lights.rs:84-99)."""
    from ..ops.intersect import ray_sphere

    t_atmo = ray_sphere(
        pos, sun_dir, jnp.zeros(3, jnp.float32), ATMOSPHERE_RADIUS_MM
    )
    t_atmo = jnp.where(jnp.isinf(t_atmo), 0.0, t_atmo)
    dt = t_atmo / steps
    total = jnp.zeros(pos.shape[:-1] + (3,), jnp.float32)
    t = 0.3 * dt
    p = pos + t[..., None] * sun_dir
    for _ in range(steps):
        _, _, extinction = _scattering_values(p)
        total = total + extinction * dt[..., None]
        p = p + dt[..., None] * sun_dir
    return jnp.exp(-total)


def sample_sky(sun_dir, ray_dir, steps: int = 16):
    """Sky radiance toward ray_dir (atmosphere.rs:86-106 semantics):
    single-scattering march + analytic sun disk, ground-occluded,
    scaled by EXPOSURE."""
    from ..ops.intersect import ray_sphere

    pos = jnp.broadcast_to(VIEW_POS, ray_dir.shape)
    zero = jnp.zeros(3, jnp.float32)

    t_ground = ray_sphere(pos, ray_dir, zero, GROUND_RADIUS_MM)
    t_atmo = ray_sphere(pos, ray_dir, zero, ATMOSPHERE_RADIUS_MM)
    t_max = jnp.where(jnp.isinf(t_ground), t_atmo, t_ground)
    t_max = jnp.where(jnp.isinf(t_max), 0.0, t_max)

    cos_theta = vm.dot(ray_dir, sun_dir)
    rayleigh_ph = _rayleigh_phase(cos_theta)
    mie_ph = _mie_phase(cos_theta)

    dt = t_max / steps
    lum = jnp.zeros(ray_dir.shape, jnp.float32)
    trans = jnp.ones(ray_dir.shape, jnp.float32)
    t = 0.3 * dt
    for _ in range(steps):
        p = pos + t[..., None] * ray_dir
        rayleigh_scat, mie_scat, extinction = _scattering_values(p)
        sample_trans = jnp.exp(-dt[..., None] * extinction)
        sun_trans = transmittance(p, sun_dir, steps=8)
        ground_t = ray_sphere(p, sun_dir, zero, GROUND_RADIUS_MM)
        shadow = jnp.where(jnp.isinf(ground_t), 1.0, 0.0)[..., None]
        in_scat = (
            rayleigh_scat * rayleigh_ph[..., None]
            + (mie_scat * mie_ph)[..., None]
        ) * sun_trans * shadow
        integral = (
            in_scat * (1.0 - sample_trans) / jnp.maximum(extinction, 1e-7)
        )
        lum = lum + integral * trans
        trans = trans * sample_trans
        t = t + dt

    # analytic sun disk with bloom (atmosphere.rs sun_radiance)
    sun_lum = _sun_disk(cos_theta) * trans
    lum = lum + sun_lum
    # ground occlusion for the disk handled via t_ground -> trans ~ 0
    lum = jnp.where(jnp.isinf(t_ground)[..., None], lum, lum * 0.0 + lum)
    return lum * EXPOSURE


def _sun_disk(cos_theta):
    """Analytic sun disk + small bloom around it."""
    sun_cos = jnp.cos(jnp.deg2rad(0.535 / 2.0))
    disk = jnp.where(cos_theta >= sun_cos, 1.0, 0.0)
    offset = sun_cos - cos_theta
    gaussian = jnp.exp(-offset * 50000.0) * 0.5
    inv = 0.002 / jnp.maximum(offset, 0.0002) * 0.01
    bloom = jnp.where(cos_theta < sun_cos, gaussian + inv, 1.0)
    return jnp.maximum(disk, bloom * 0.2)[..., None] * jnp.ones(3, jnp.float32)


# ===========================================================================
# LUT pipeline (strolle-shaders/src/atmosphere/*.rs)
# ===========================================================================

import jax
from functools import partial

from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class AtmosphereLuts:
    """The three Hillaire LUTs. Transmittance + multi-scattering depend
    only on the physical constants (generated once, cached);
    the sky-view LUT is keyed on sun altitude (passes/atmosphere.rs:
    76-112 regenerates it when the sun moves)."""

    transmittance: jnp.ndarray  # f32[64, 256, 3]
    scattering: jnp.ndarray  # f32[32, 32, 3]
    sky: jnp.ndarray  # f32[256, 256, 3]


def _bilinear(lut: jnp.ndarray, u, v):
    """Clamped bilinear fetch at normalized uv (texel centers).

    ONE row-batched take of the LUT packed with its x+1 / y+1 / x+1,y+1
    clamp-shifted variants (12 channels), indexed at the floor corner:
    a per-corner 2-D advanced-indexing fetch costs ~5 ms each at 800x608
    while one multi-channel take costs ~5 ms total (ops/gather.py)."""
    h, w = lut.shape[0], lut.shape[1]
    sx = jnp.concatenate([lut[:, 1:], lut[:, -1:]], axis=1)
    sy = jnp.concatenate([lut[1:], lut[-1:]], axis=0)
    sxy = jnp.concatenate([sy[:, 1:], sy[:, -1:]], axis=1)
    mat = jnp.concatenate([lut, sx, sy, sxy], axis=-1).reshape(h * w, -1)
    c = lut.shape[-1]

    x = jnp.clip(u * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    g = jnp.take(mat, (y0 * w + x0).reshape(-1), axis=0, mode="clip").reshape(
        x0.shape + (4 * c,)
    )
    c00, c10, c01, c11 = (g[..., i * c : (i + 1) * c] for i in range(4))
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def sample_lut_at(lut, pos, sun_dir):
    """Atmosphere::sample_lut (atmosphere.rs:183-204): u from the sun
    cos-zenith angle, v from normalized height."""
    height = vm.length(pos)
    up = pos / jnp.maximum(height, 1e-20)[..., None]
    cos_zenith = vm.dot(sun_dir, up)
    u = vm.saturate(0.5 + 0.5 * cos_zenith)
    v = vm.saturate(
        (height - GROUND_RADIUS_MM)
        / (ATMOSPHERE_RADIUS_MM - GROUND_RADIUS_MM)
    )
    return _bilinear(lut, u, v)


def _march_tmax(pos, d):
    from ..ops.intersect import ray_sphere

    zero = jnp.zeros(3, jnp.float32)
    t_g = ray_sphere(pos, d, zero, GROUND_RADIUS_MM)
    t_a = ray_sphere(pos, d, zero, ATMOSPHERE_RADIUS_MM)
    return jnp.where(jnp.isinf(t_g), jnp.where(jnp.isinf(t_a), 0.0, t_a), t_g), t_g


def generate_transmittance_lut(steps: int = 40) -> jnp.ndarray:
    """generate_transmittance_lut.rs: per texel, optical-depth march
    toward a sun at cos-zenith u from height v."""
    h, w = TRANSMITTANCE_LUT_RES[1], TRANSMITTANCE_LUT_RES[0]  # 64 x 256
    us = (jnp.arange(w, dtype=jnp.float32)) / w
    vs = (jnp.arange(h, dtype=jnp.float32)) / h
    u, v = jnp.meshgrid(us, vs, indexing="xy")
    sun_cos = 2.0 * u - 1.0
    sun_sin = jnp.sin(jnp.arccos(jnp.clip(sun_cos, -1.0, 1.0)))
    height = GROUND_RADIUS_MM + (ATMOSPHERE_RADIUS_MM - GROUND_RADIUS_MM) * v
    pos = jnp.stack([jnp.zeros_like(height), height, jnp.zeros_like(height)], -1)
    sun_dir = vm.normalize(
        jnp.stack([jnp.zeros_like(sun_cos), sun_cos, -sun_sin], -1)
    )

    from ..ops.intersect import ray_sphere

    zero = jnp.zeros(3, jnp.float32)
    hits_ground = ~jnp.isinf(ray_sphere(pos, sun_dir, zero, GROUND_RADIUS_MM))
    t_atmo = ray_sphere(pos, sun_dir, zero, ATMOSPHERE_RADIUS_MM)
    t_atmo = jnp.where(jnp.isinf(t_atmo), 0.0, t_atmo)

    def body(i, carry):
        t, trans = carry
        new_t = ((i + 0.3) / steps) * t_atmo
        dt = new_t - t
        p = pos + new_t[..., None] * sun_dir
        _, _, extinction = _scattering_values(p)
        return new_t, trans * jnp.exp(-dt[..., None] * extinction)

    _, trans = jax.lax.fori_loop(
        0, steps, body, (jnp.zeros_like(t_atmo), jnp.ones_like(pos))
    )
    return jnp.where(hits_ground[..., None], 0.0, trans)


def generate_scattering_lut(tlut, steps: int = 20, dirs_sqrt: int = 8):
    """generate_scattering_lut.rs: multi-scattering psi LUT — 8x8
    direction samples x 20-step marches per texel; lum / (1 - f_ms)."""
    res = SCATTERING_LUT_RES[0]  # 32
    us = jnp.arange(res, dtype=jnp.float32) / res
    vs = jnp.arange(res, dtype=jnp.float32) / res
    u, v = jnp.meshgrid(us, vs, indexing="xy")
    sun_cos = 2.0 * u - 1.0
    sun_sin = jnp.sin(jnp.arccos(jnp.clip(sun_cos, -1.0, 1.0)))
    height = GROUND_RADIUS_MM + (
        ATMOSPHERE_RADIUS_MM - GROUND_RADIUS_MM
    ) * jnp.maximum(v, 0.01)
    pos = jnp.stack([jnp.zeros_like(height), height, jnp.zeros_like(height)], -1)
    sun_dir = vm.normalize(
        jnp.stack([jnp.zeros_like(sun_cos), sun_cos, -sun_sin], -1)
    )

    lum_total = jnp.zeros(pos.shape, jnp.float32)
    fms_total = jnp.zeros(pos.shape, jnp.float32)
    inv_samples = 1.0 / (dirs_sqrt * dirs_sqrt)

    from ..ops.intersect import ray_sphere

    zero = jnp.zeros(3, jnp.float32)

    for i in range(dirs_sqrt):
        for j in range(dirs_sqrt):
            theta = jnp.pi * (i + 0.5) / dirs_sqrt
            phi = jnp.arccos(
                jnp.clip(1.0 - 2.0 * (j + 0.5) / dirs_sqrt, -1.0, 1.0)
            )
            ray_dir = jnp.asarray(
                [
                    jnp.sin(phi) * jnp.sin(theta),
                    jnp.cos(phi),
                    jnp.sin(phi) * jnp.cos(theta),
                ],
                jnp.float32,
            )
            ray_dir = jnp.broadcast_to(ray_dir, pos.shape)
            t_a = ray_sphere(pos, ray_dir, zero, ATMOSPHERE_RADIUS_MM)
            t_g = ray_sphere(pos, ray_dir, zero, GROUND_RADIUS_MM)
            ground_hit = ~jnp.isinf(t_g)
            t_max = jnp.where(ground_hit, t_g, jnp.where(jnp.isinf(t_a), 0.0, t_a))

            cos_th = vm.dot(ray_dir, sun_dir)
            mie_ph = _mie_phase(cos_th)[..., None]
            ray_ph = _rayleigh_phase(-cos_th)[..., None]

            def body(si, carry):
                t, lum, lum_f, trans = carry
                new_t = ((si + 0.3) / steps) * t_max
                dt = (new_t - t)[..., None]
                p = pos + new_t[..., None] * ray_dir
                r_s, m_s, ext = _scattering_values(p)
                m_s = m_s[..., None]
                s_trans = jnp.exp(-dt * ext)
                no_phase = r_s + m_s
                scat_f = (no_phase - no_phase * s_trans) / jnp.maximum(ext, 1e-7)
                lum_f = lum_f + trans * scat_f
                sun_t = sample_lut_at(tlut, p, sun_dir)
                in_s = (r_s * ray_ph + m_s * mie_ph) * sun_t
                integral = (in_s - in_s * s_trans) / jnp.maximum(ext, 1e-7)
                return new_t, lum + integral * trans, lum_f, trans * s_trans

            _, lum, lum_f, trans = jax.lax.fori_loop(
                0,
                steps,
                body,
                (
                    jnp.zeros(height.shape, jnp.float32),
                    jnp.zeros(pos.shape, jnp.float32),
                    jnp.zeros(pos.shape, jnp.float32),
                    jnp.ones(pos.shape, jnp.float32),
                ),
            )

            # ground bounce (generate_scattering_lut.rs ground albedo term)
            hit_pos = pos + t_g[..., None] * ray_dir
            hit_pos = vm.normalize(hit_pos) * GROUND_RADIUS_MM
            bounce = (
                trans * GROUND_ALBEDO * sample_lut_at(tlut, hit_pos, sun_dir)
            )
            sun_up = vm.dot(pos, sun_dir) > 0.0
            lum = jnp.where(
                (ground_hit & sun_up)[..., None], lum + bounce, lum
            )

            fms_total = fms_total + lum_f * inv_samples
            lum_total = lum_total + lum * inv_samples

    return lum_total / jnp.maximum(1.0 - fms_total, 1e-4)


def generate_sky_lut(tlut, slut, sun_altitude, steps: int = 32):
    """generate_sky_lut.rs: per-sun-altitude 256x256 sky view with the
    non-linear horizon-centric V parameterization."""
    res = SKY_LUT_RES[0]
    us = jnp.arange(res, dtype=jnp.float32) / res
    vs = jnp.arange(res, dtype=jnp.float32) / res
    u, v = jnp.meshgrid(us, vs, indexing="xy")

    azimuth = (u - 0.5) * 2.0 * jnp.pi
    vv = jnp.where(v < 0.5, -vm.sqr(1.0 - 2.0 * v), vm.sqr(v * 2.0 - 1.0))
    height = vm.length(VIEW_POS)
    horizon = (
        jnp.arccos(
            jnp.clip(
                jnp.sqrt(jnp.maximum(height**2 - GROUND_RADIUS_MM**2, 0.0))
                / height,
                -1.0,
                1.0,
            )
        )
        - 0.5 * jnp.pi
    )
    altitude = vv * 0.5 * jnp.pi - horizon

    ray_dir = jnp.stack(
        [
            jnp.cos(altitude) * jnp.sin(azimuth),
            jnp.sin(altitude),
            -jnp.cos(altitude) * jnp.cos(azimuth),
        ],
        -1,
    )

    alt = jnp.mod(jnp.asarray(sun_altitude, jnp.float32), 2.0 * jnp.pi)
    sun_dir = jnp.where(
        alt < 0.5 * jnp.pi,
        jnp.stack([0.0 * alt, jnp.sin(alt), -jnp.cos(alt)], -1),
        jnp.stack([0.0 * alt, jnp.sin(alt), jnp.cos(alt)], -1),
    )
    sun_dir = jnp.broadcast_to(sun_dir, ray_dir.shape)

    pos = jnp.broadcast_to(VIEW_POS, ray_dir.shape)
    t_max, _ = _march_tmax(pos, ray_dir)

    cos_th = vm.dot(ray_dir, sun_dir)
    mie_ph = _mie_phase(cos_th)[..., None]
    ray_ph = _rayleigh_phase(-cos_th)[..., None]

    def body(i, carry):
        t, lum, trans = carry
        new_t = ((i + 0.3) / steps) * t_max
        dt = (new_t - t)[..., None]
        p = pos + new_t[..., None] * ray_dir
        r_s, m_s, ext = _scattering_values(p)
        m_s = m_s[..., None]
        s_trans = jnp.exp(-dt * ext)
        sun_t = sample_lut_at(tlut, p, sun_dir)
        psi = sample_lut_at(slut, p, sun_dir)
        in_s = r_s * (ray_ph * sun_t + psi) + m_s * (mie_ph * sun_t + psi)
        integral = (in_s - in_s * s_trans) / jnp.maximum(ext, 1e-7)
        return new_t, lum + integral * trans, trans * s_trans

    shape = ray_dir.shape[:-1]
    _, lum, _ = jax.lax.fori_loop(
        0,
        steps,
        body,
        (
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape + (3,), jnp.float32),
            jnp.ones(shape + (3,), jnp.float32),
        ),
    )
    return lum


@jax.jit
def _static_luts():
    t = generate_transmittance_lut()
    s = generate_scattering_lut(t)
    return t, s


@jax.jit
def _sky_lut(tlut, slut, sun_altitude):
    return generate_sky_lut(tlut, slut, sun_altitude)


class _LutCache:
    """Host-side LUT cache, deliberately NOT a plain module-level dict.

    The cached LUTs are device arrays, but they are only ever handed to
    jitted programs as ARGUMENTS (never closure-captured), so they do
    not trip the capture hazard that
    tests/test_aux.py::test_no_module_level_device_array_constants
    polices. Wrapping them in an opaque (non-pytree) object documents
    that exemption and keeps the scan from flattening into the cache
    (mixed-type dict keys crash tree_flatten's key sort). Keys are
    strings only."""

    def __init__(self):
        self.entries: dict = {}


_lut_cache = _LutCache()


def luts_for(sun_altitude: float) -> AtmosphereLuts:
    """Host-cached LUT bundle (transmittance/scattering generated once;
    sky LUT keyed on rounded sun altitude — passes/atmosphere.rs:76-112)."""
    cache = _lut_cache.entries
    if "static" not in cache:
        cache["static"] = _static_luts()
    t, s = cache["static"]
    key = f"sky:{round(float(sun_altitude), 4)}"
    if key not in cache:
        cache[key] = _sky_lut(t, s, jnp.float32(sun_altitude))
    return AtmosphereLuts(transmittance=t, scattering=s, sky=cache[key])


def sample_sky_lut(luts: AtmosphereLuts, ray_dir, sun_dir):
    """Atmosphere::sample_sky_lut (atmosphere.rs:108-146)."""
    height = vm.length(VIEW_POS)
    up = VIEW_POS / height
    horizon = jnp.arccos(
        jnp.clip(
            jnp.sqrt(jnp.maximum(height**2 - GROUND_RADIUS_MM**2, 0.0)) / height,
            -1.0,
            1.0,
        )
    )
    # clips stay strictly inside (-1, 1) and arctan2 inputs are swapped
    # to a safe dummy on the degenerate branches: arccos'(+-1) and
    # arctan2 at (0, 0) are inf/NaN, and vertical/horizon rays are
    # routine — the where() hides the value but not the backward NaN.
    dot_up = vm.dot(ray_dir, jnp.broadcast_to(up, ray_dir.shape))
    altitude = horizon - jnp.arccos(
        jnp.clip(dot_up, -1.0 + 1e-6, 1.0 - 1e-6)
    )

    right = vm.cross(sun_dir, jnp.broadcast_to(up, sun_dir.shape))
    forward = vm.cross(jnp.broadcast_to(up, right.shape), right)
    projected = vm.normalize(ray_dir - up * dot_up[..., None])
    sin_th = vm.dot(projected, right)
    cos_th = vm.dot(projected, forward)
    vertical = jnp.abs(altitude) > (0.5 * jnp.pi - 1e-4)
    degenerate = vertical | ((sin_th == 0.0) & (cos_th == 0.0))
    azimuth = jnp.where(
        vertical,
        0.0,
        jnp.arctan2(
            jnp.where(degenerate, 0.0, sin_th),
            jnp.where(degenerate, 1.0, cos_th),
        )
        + jnp.pi,
    )
    u = azimuth / (2.0 * jnp.pi)
    s = jnp.sqrt(jnp.maximum(jnp.abs(altitude) * 2.0 / jnp.pi, 1e-12))
    v = 0.5 + 0.5 * jnp.where(altitude >= 0.0, s, -s)
    return _bilinear(luts.sky, u, v)


def sample_atmosphere(luts: AtmosphereLuts, sun_dir, ray_dir):
    """Atmosphere::sample (atmosphere.rs:86-106): sky LUT + analytic
    sun bloom x transmittance, ground-occluded, scaled by EXPOSURE."""
    from ..ops.intersect import ray_sphere

    lum = sample_sky_lut(luts, ray_dir, sun_dir)

    cos_theta = vm.dot(ray_dir, sun_dir)
    sun_cos = jnp.cos(jnp.deg2rad(0.53))
    offset = sun_cos - cos_theta
    bloom = jnp.where(
        cos_theta >= sun_cos,
        1.0,
        jnp.exp(-offset * 50000.0) * 0.5 + 0.01 / (0.02 + offset * 300.0),
    )
    # smoothstep between 0.002 and 1.0 (interpolate_bloom)
    tt = jnp.clip((bloom - 0.002) / (1.0 - 0.002), 0.0, 1.0)
    sun_lum = tt * tt * (3.0 - 2.0 * tt)

    pos = jnp.broadcast_to(VIEW_POS, ray_dir.shape)
    hits_ground = ~jnp.isinf(
        ray_sphere(pos, ray_dir, jnp.zeros(3, jnp.float32), GROUND_RADIUS_MM)
    )
    # the view position is the fixed VIEW_POS, so the transmittance
    # fetch depends only on sun_dir: evaluate at sun_dir's own shape
    # (pass a 1-D sun to make this a scalar fetch, not a per-pixel one)
    trans = sample_lut_at(luts.transmittance, VIEW_POS, sun_dir)
    sun_contrib = jnp.where(
        (hits_ground | (sun_lum <= 0.0))[..., None],
        0.0,
        sun_lum[..., None] * trans,
    )
    return (lum + sun_contrib) * EXPOSURE


def sun_color(luts: AtmosphereLuts, sun_dir):
    """Host-side sun light color: transmittance at the view position x
    EXPOSURE x 5 (strolle/src/lights.rs:84-99 update_sun)."""
    trans = sample_lut_at(
        luts.transmittance, jnp.broadcast_to(VIEW_POS, sun_dir.shape), sun_dir
    )
    return trans * EXPOSURE * 5.0
