"""The fused Pallas spatial-probe kernel must reproduce the jnp probe
loop bit-for-bit (ops/pallas/probe_kernels.py vs the shared-offset
loops in restir/di.py + restir/gi.py): same offset tables, same
per-pixel RNG stream, same gate/level walk, same accepted neighbor and
(GI) Jacobian. Runs the kernel in interpret mode on CPU."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strolle_tpu.camera import make_camera
from strolle_tpu.config import DEFAULT_TUNING
from strolle_tpu.ops.hit import Surface
from strolle_tpu.restir import di as di_mod
from strolle_tpu.restir import gi as gi_mod
from strolle_tpu.restir import reservoir as rsv
from strolle_tpu.scene.cornell import cornell_box
from strolle_tpu.bvh import scene_with_bvh

H, W = 72, 160

#: Full-size probes (8 tries x 6 levels) compile for minutes in
#: interpret mode; 3 tries x 4 levels exercises every code path
#: (level walk, gates, jacobian, mirror edges) in seconds.
TUNING = dataclasses.replace(
    DEFAULT_TUNING,
    di_spatial_samples=3, di_spatial_radius=24.0,
    gi_spatial_samples=3, gi_spatial_radius=24.0,
)


def _camera():
    return make_camera(
        eye=[0.0, 1.0, 3.0], target=[0.0, 1.0, 0.0],
        fov_y=1.0, width=W, height=H,
    )


def _surface(seed=0):
    rs = np.random.RandomState(seed)
    n = rs.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # blocky fields so similarity gates pass/fail in patches rather
    # than razor-edge per pixel (keeps the comparison away from float
    # tie-breaking)
    depth = np.repeat(
        np.repeat(rs.uniform(1.0, 5.0, (H // 8, W // 8)), 8, 0), 8, 1
    ).astype(np.float32)
    some = np.repeat(
        np.repeat(rs.uniform(0, 1, (H // 8, W // 8)) > 0.15, 8, 0), 8, 1
    )
    zeros = jnp.zeros((H, W), jnp.float32)
    z3 = jnp.zeros((H, W, 3), jnp.float32)
    return Surface(
        point=jnp.asarray(rs.uniform(-2, 2, (H, W, 3)).astype(np.float32)),
        dir=z3, normal=jnp.asarray(n), uv=jnp.zeros((H, W, 2)),
        tri=jnp.zeros((H, W), jnp.int32),
        material_id=jnp.zeros((H, W), jnp.int32),
        base_color=jnp.ones((H, W, 4)), emissive=z3,
        metallic=zeros, roughness=zeros + 0.5, reflectance=zeros + 0.5,
        depth=jnp.asarray(depth), is_some=jnp.asarray(some),
    )


def _di_res(seed=1):
    rs = np.random.RandomState(seed)
    shape = (H, W)
    r = rsv.DiReservoirs.empty(shape)
    return r.replace(
        m=jnp.asarray((rs.uniform(0, 1, shape) > 0.2).astype(np.float32)
                      * rs.uniform(1, 8, shape).astype(np.float32)),
        w=jnp.asarray(rs.uniform(0, 2, shape).astype(np.float32)),
        pdf=jnp.asarray(rs.uniform(0.1, 2, shape).astype(np.float32)),
        light_id=jnp.asarray(rs.randint(0, 2, shape).astype(np.int32)),
        light_point=jnp.asarray(rs.uniform(-2, 2, shape + (3,)).astype(np.float32)),
    )


def _gi_res(seed=2):
    rs = np.random.RandomState(seed)
    shape = (H, W)
    r = gi_mod.GiReservoirs.empty(shape)
    v2n = rs.normal(size=shape + (3,)).astype(np.float32)
    v2n /= np.linalg.norm(v2n, axis=-1, keepdims=True)
    return r.replace(
        m=jnp.asarray((rs.uniform(0, 1, shape) > 0.2).astype(np.float32)
                      * rs.uniform(1, 8, shape).astype(np.float32)),
        w=jnp.asarray(rs.uniform(0, 2, shape).astype(np.float32)),
        pdf=jnp.asarray(rs.uniform(0.1, 2, shape).astype(np.float32)),
        radiance=jnp.asarray(rs.uniform(0, 3, shape + (3,)).astype(np.float32)),
        v1_point=jnp.asarray(rs.uniform(-2, 2, shape + (3,)).astype(np.float32)),
        v2_point=jnp.asarray(
            (rs.uniform(-2, 2, shape + (3,))
             * (rs.uniform(0, 1, shape + (1,)) > 0.1)).astype(np.float32)
        ),
        v2_normal=jnp.asarray(v2n),
    )


def _tree_equal(a, b, rtol=1e-6):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        la, lb = np.asarray(la), np.asarray(lb)
        if la.dtype.kind in "fc":
            np.testing.assert_allclose(la, lb, rtol=rtol, atol=1e-6)
        else:
            np.testing.assert_array_equal(la, lb)


@pytest.fixture()
def interpret_env(monkeypatch):
    monkeypatch.setenv("STROLLE_PALLAS_INTERPRET", "1")


def test_di_spatial_kernel_matches_loop(interpret_env):
    scene = scene_with_bvh(cornell_box())
    cam = _camera()
    surf = _surface()
    res = _di_res()
    seed = jnp.uint32(0xBEEF)
    out_loop = di_mod.di_spatial(
        scene, cam, surf, res, seed, 3, TUNING, use_pallas=False
    )
    out_kern = di_mod.di_spatial(
        scene, cam, surf, res, seed, 3, TUNING, use_pallas=True
    )
    _tree_equal(out_loop, out_kern)


def test_gi_spatial_kernel_matches_loop(interpret_env):
    scene = scene_with_bvh(cornell_box())
    cam = _camera()
    surf = _surface(3)
    res = _gi_res()
    seed = jnp.uint32(0xF00D)
    out_loop = gi_mod.gi_spatial(
        scene, cam, surf, res, seed, 5, TUNING, use_pallas=False
    )
    out_kern = gi_mod.gi_spatial(
        scene, cam, surf, res, seed, 5, TUNING, use_pallas=True
    )
    _tree_equal(out_loop, out_kern)
