import numpy as np
import jax.numpy as jnp
import pytest

from strolle_tpu.sky import atmosphere as atm


@pytest.fixture(scope="module")
def luts():
    return atm.luts_for(0.35)


def test_transmittance_lut_properties(luts):
    t = np.asarray(luts.transmittance)
    assert t.shape == (64, 256, 3)
    assert np.isfinite(t).all()
    assert (t >= 0).all() and (t <= 1).all()
    # sun below horizon (u=0) from ground level -> fully blocked
    assert t[0, 0].max() == 0.0
    # sun overhead (u=255) from ground -> mostly transparent
    assert t[0, -1].min() > 0.5
    # blue is attenuated more than red at grazing angles
    mid = t[0, 140]
    assert mid[0] > mid[2]


def test_scattering_lut_finite(luts):
    s = np.asarray(luts.scattering)
    assert s.shape == (32, 32, 3)
    assert np.isfinite(s).all()
    assert (s >= 0).all()


def test_sky_lut_day_vs_night():
    day = np.asarray(atm.luts_for(0.5).sky)
    night = np.asarray(atm.luts_for(-0.5).sky)
    assert day.mean() > night.mean() * 5


def test_sample_atmosphere_horizon(luts):
    sun = atm.sun_direction(jnp.float32(0.0), jnp.float32(0.35))
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    sky_up = np.asarray(atm.sample_atmosphere(luts, jnp.broadcast_to(sun, (1, 3)), up))[0]
    sky_down = np.asarray(atm.sample_atmosphere(luts, jnp.broadcast_to(sun, (1, 3)), down))[0]
    assert np.isfinite(sky_up).all() and np.isfinite(sky_down).all()
    # daytime zenith is blue-ish and brighter than the ground direction
    assert sky_up[2] > sky_up[0]
    assert sky_up.sum() > sky_down.sum()


def test_sun_disk_brighter_than_sky(luts):
    sun = atm.sun_direction(jnp.float32(0.0), jnp.float32(0.35))
    toward_sun = jnp.broadcast_to(sun, (1, 3))
    away = jnp.asarray([[np.sin(2.0), np.cos(2.0) * 0.3, np.cos(2.0)]])
    away = away / np.linalg.norm(np.asarray(away))
    at_sun = np.asarray(atm.sample_atmosphere(luts, toward_sun, toward_sun))[0]
    off_sun = np.asarray(atm.sample_atmosphere(luts, toward_sun, away.astype(np.float32)))[0]
    assert at_sun.sum() > off_sun.sum() * 3


def test_sun_color_warm(luts):
    sun = atm.sun_direction(jnp.float32(0.0), jnp.float32(0.1))
    c = np.asarray(atm.sun_color(luts, sun[None]))[0]
    assert c[0] > c[2] > 0  # low sun: red > blue


def test_analytic_fallback_finite():
    sun = atm.sun_direction(jnp.float32(0.0), jnp.float32(-1.0))
    rs = np.random.RandomState(0)
    d = rs.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = atm.sample_sky(jnp.broadcast_to(sun, (64, 3)), jnp.asarray(d))
    assert bool(jnp.isfinite(out).all())
