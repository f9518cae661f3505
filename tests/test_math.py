import jax.numpy as jnp
import numpy as np
import pytest

from strolle_tpu.ops import math as vm


def test_octahedral_roundtrip():
    rs = np.random.RandomState(0)
    v = rs.normal(size=(256, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    dec = np.asarray(vm.octahedral_decode(vm.octahedral_encode(jnp.asarray(v))))
    assert np.allclose(dec, v, atol=1e-3)


def test_octahedral_axes():
    axes = np.eye(3, dtype=np.float32)
    axes = np.concatenate([axes, -axes])
    dec = np.asarray(
        vm.octahedral_decode(vm.octahedral_encode(jnp.asarray(axes)))
    )
    assert np.allclose(dec, axes, atol=1e-5)


def test_any_orthonormal_pair():
    rs = np.random.RandomState(1)
    n = rs.normal(size=(512, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = vm.any_orthonormal_pair(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    assert np.allclose(np.sum(t * n, -1), 0, atol=1e-5)
    assert np.allclose(np.sum(b * n, -1), 0, atol=1e-5)
    assert np.allclose(np.sum(t * b, -1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)
    assert np.allclose(np.linalg.norm(b, axis=-1), 1, atol=1e-5)


def test_reflect():
    i = jnp.asarray([1.0, -1.0, 0.0]) / np.sqrt(2)
    n = jnp.asarray([0.0, 1.0, 0.0])
    r = np.asarray(vm.reflect(i, n))
    assert np.allclose(r, [1 / np.sqrt(2), 1 / np.sqrt(2), 0.0], atol=1e-6)


def test_luma():
    assert np.isclose(float(vm.luma(jnp.ones(3))), 1.0, atol=1e-6)
    assert float(vm.luma(jnp.zeros(3))) == 0.0


def test_normalize_safe():
    out = np.asarray(vm.normalize(jnp.zeros((4, 3))))
    assert np.isfinite(out).all()
