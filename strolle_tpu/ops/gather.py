"""Gather strategies tuned for the TPU compiler.

Plain `table[idx]` gathers that get fused into larger computations
lower to an ~11 ms/486k-element slow path on TPU (scalar-core loop with
S(1) staging copies — measured via jax.profiler on the reference
frame). For small tables a one-hot matmul runs on the MXU instead and
fuses cleanly with elementwise producers/consumers.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Above this many rows the one-hot matrix is too large; fall back.
ONEHOT_MAX_ROWS = 256


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [T, K] fetched at idx [...] -> [..., K]."""
    t, k = table.shape
    if t <= ONEHOT_MAX_ROWS:
        onehot = (
            idx[..., None] == jnp.arange(t, dtype=idx.dtype)
        ).astype(table.dtype)
        return jnp.matmul(onehot, table, preferred_element_type=table.dtype)
    return jnp.take(table, idx, axis=0)
