"""Checkerboard ray compaction: trace only the active half.

Every checkerboarded pass (GI sampling, DI/GI spatial reuse —
strolle-gpu/src/utils.rs:33-43) touches exactly the pixels of one 2x1
checkerboard half: within row y the active columns share one x parity.
The reference halves its dispatch width for those passes
(strolle/src/camera_controller/passes/gi_sampling.rs:72-77); the TPU
analogue is to *compact* the active columns into an [H, W/2] ray grid
before the trace kernel and expand the results afterwards — the trace
cost (tiles walked, rows streamed, lanes intersected) is linear in the
ray count, so this halves it exactly. The compaction itself is two
strided slices + a row select (pure bandwidth, fused by XLA).

The active parity may depend on the *dynamic* frame counter, so it is
carried as a per-row [H] array and every select is a jnp.where.

Only even widths compact (all production viewports); odd widths fall
back to the caller's full-width path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compaction_pays(scene, width: int) -> bool:
    """Static routing decision: compaction trades ~half the trace cost
    for a fixed pack/expand relayout tax (the stride-2 slices + minor-
    axis interleaves around the kernel). Measured A/B at 800x608
    (mbench, round 5): dungeon (stream-kernel scene) 180 -> 163 ms,
    Cornell (brute trace, 32 tris) 102 -> ~120 ms. So compact exactly
    when the trace routes to a per-ray-expensive path — the same
    static threshold ops.trace uses for the stream/cluster kernels."""
    from .trace import BRUTE_FORCE_MAX_TRIS

    return (
        width % 2 == 0
        and int(scene.geometry.num_triangles) > BRUTE_FORCE_MAX_TRIS
    )


def row_parity(f, h: int) -> jnp.ndarray:
    """[H] active x parity for checkerboard frame-key ``f``:
    active(x, y) <=> x % 2 == (f + y) % 2 (got_checkerboard_at)."""
    ys = jnp.arange(h, dtype=jnp.int32)
    return (jnp.asarray(f, jnp.int32) + ys) % 2


def _rowcond(parity: jnp.ndarray, ndim: int):
    return parity.reshape((-1,) + (1,) * (ndim - 1)) == 0


def compact(parity: jnp.ndarray, arr: jnp.ndarray) -> jnp.ndarray:
    """[H, W(, C)] -> [H, W/2(, C)] keeping column x = 2c + parity[y]."""
    even = arr[:, 0::2]
    odd = arr[:, 1::2]
    return jnp.where(_rowcond(parity, arr.ndim), even, odd)


def expand(parity: jnp.ndarray, half: jnp.ndarray, fill=0) -> jnp.ndarray:
    """Inverse of :func:`compact`; inactive columns take ``fill``."""
    fill = jnp.full_like(half, fill)
    cond = _rowcond(parity, half.ndim)
    even = jnp.where(cond, half, fill)
    odd = jnp.where(cond, fill, half)
    h, w2 = half.shape[:2]
    stacked = jnp.stack([even, odd], axis=2)  # [H, W/2, 2, ...]
    return stacked.reshape((h, 2 * w2) + half.shape[2:])


def compact_tree(parity, tree):
    return jax.tree.map(lambda a: compact(parity, a), tree)


def expand_tree(parity, tree, fill=0):
    return jax.tree.map(lambda a: expand(parity, a, fill), tree)


def paired_anyhit(trace_fn, scene, parity, a_rays, b_rays):
    """Run the two cross-visibility shadow rays of a checkerboarded
    spatial pass as ONE half-width-each trace: the active half's A rays
    fill the left half of an [H, W] grid, its B rays the right half
    (di_spatial_resampling.rs pick->trace emits exactly these two rays
    per active pixel). Returns (a_occluded, b_occluded) full-width,
    False at inactive columns — where the callers' ray lengths are
    already zero, so the results are bitwise what two full traces give.
    """
    (a_o, a_d, a_len) = a_rays
    (b_o, b_d, b_len) = b_rays
    o = jnp.concatenate(
        [compact(parity, a_o), compact(parity, b_o)], axis=1
    )
    d = jnp.concatenate(
        [compact(parity, a_d), compact(parity, b_d)], axis=1
    )
    t = jnp.concatenate(
        [compact(parity, a_len), compact(parity, b_len)], axis=1
    )
    occ = trace_fn(scene, o, d, t)
    w2 = a_o.shape[1] // 2
    a_occ = expand(parity, occ[:, :w2], False)
    b_occ = expand(parity, occ[:, w2:], False)
    return a_occ, b_occ
