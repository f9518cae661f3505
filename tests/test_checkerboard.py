"""Checkerboard ray compaction (ops/checkerboard.py): the exactness
argument — active columns survive a compact/expand round trip, and the
packed pair-pass visits exactly the rays of the two full passes."""

import jax.numpy as jnp
import numpy as np

from strolle_tpu.ops import checkerboard as cb


def _grid(h, w, c=None):
    n = h * w * (c or 1)
    shape = (h, w) if c is None else (h, w, c)
    return jnp.arange(n, dtype=jnp.float32).reshape(shape)


def test_compact_expand_roundtrip():
    h, w = 6, 8
    for f in range(4):
        parity = cb.row_parity(f, h)
        for c in (None, 3):
            a = _grid(h, w, c)
            half = cb.compact(parity, a)
            assert half.shape[:2] == (h, w // 2)
            back = cb.expand(parity, half, -1.0)
            an, bn, pn = map(np.asarray, (a, back, parity))
            for y in range(h):
                for x in range(w):
                    if x % 2 == pn[y]:  # active column
                        assert np.all(bn[y, x] == an[y, x]), (y, x)
                    else:
                        assert np.all(bn[y, x] == -1.0), (y, x)


def test_compact_picks_active_parity_columns():
    h, w = 4, 6
    parity = cb.row_parity(1, h)  # active x%2 == (1+y)%2
    a = _grid(h, w)
    half = np.asarray(cb.compact(parity, a))
    an = np.asarray(a)
    pn = np.asarray(parity)
    for y in range(h):
        for k in range(w // 2):
            assert half[y, k] == an[y, 2 * k + pn[y]]


def test_paired_anyhit_matches_two_passes():
    h, w = 8, 12
    rng = np.random.RandomState(0)
    a_o = jnp.asarray(rng.randn(h, w, 3).astype(np.float32))
    a_d = jnp.asarray(rng.randn(h, w, 3).astype(np.float32))
    b_o = jnp.asarray(rng.randn(h, w, 3).astype(np.float32))
    b_d = jnp.asarray(rng.randn(h, w, 3).astype(np.float32))
    parity = cb.row_parity(2, h)
    active = (jnp.arange(w)[None, :] % 2) == parity[:, None]
    # ray lengths zero off the active half — the contract the ReSTIR
    # callers establish before the pass
    a_len = jnp.where(active, jnp.abs(jnp.asarray(rng.randn(h, w))), 0.0)
    a_len = a_len.astype(jnp.float32)
    b_len = jnp.where(active, jnp.abs(jnp.asarray(rng.randn(h, w))), 0.0)
    b_len = b_len.astype(jnp.float32)

    def fake_trace(_scene, o, d, t):
        # deterministic per-ray "occlusion"; len-0 rays never occlude
        return (t > 0.0) & ((o.sum(-1) + d.sum(-1)) > 0.0)

    a_occ, b_occ = cb.paired_anyhit(
        fake_trace, None, parity, (a_o, a_d, a_len), (b_o, b_d, b_len)
    )
    ref_a = fake_trace(None, a_o, a_d, a_len)
    ref_b = fake_trace(None, b_o, b_d, b_len)
    assert np.array_equal(np.asarray(a_occ), np.asarray(ref_a))
    assert np.array_equal(np.asarray(b_occ), np.asarray(ref_b))
