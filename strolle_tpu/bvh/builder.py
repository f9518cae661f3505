"""Binned-SAH BVH builder (host-side numpy).

Re-derivation of the reference's builder (strolle/src/bvh/builder.rs:
binned SAH, 12 bins, split rejected when SAH cost >= leaf cost) with a
TPU-friendly flat output layout: instead of the Vec4 stream with
bit-cast opcodes (bvh/serializer.rs:35-106), children AABBs + indices
live in typed arrays indexed by node id, and leaf triangles are
contiguous ranges in a reordered triangle array — so traversal needs
one gather per visited node and a dynamic slice per leaf.

The incremental subtree-hash reuse of the reference builder
(builder.rs:204-279) is an optimization for dynamic scenes; the
planned C++ builder port adds it. This numpy builder is the
correctness baseline and handles static scenes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static

SAH_BINS = 12
MAX_LEAF_SIZE = 8


@pytree_dataclass
class BvhArrays:
    """Flattened 2-wide BVH. `child[n, k] >= 0` is an internal node id;
    `child[n, k] < 0` encodes a leaf whose triangles are
    `order[first : first+count)` with `first = -(child+1)`."""

    child_min: jnp.ndarray  # f32[N, 2, 3]
    child_max: jnp.ndarray  # f32[N, 2, 3]
    child: jnp.ndarray  # i32[N, 2]
    child_count: jnp.ndarray  # i32[N, 2]
    max_depth: int = static(default=32)

    @property
    def num_nodes(self) -> int:
        return self.child.shape[0]


@dataclass
class _BuildNode:
    first: int
    count: int
    # filled when split:
    child0: int = -1
    child1: int = -1


def _leaf_token(first: int) -> int:
    return -(first + 1)


def build_bvh(
    positions: np.ndarray, backend: str | None = None, ctx=None
) -> tuple[BvhArrays, np.ndarray]:
    """Builds a BVH over triangles `positions` [T, 3, 3].

    Returns (arrays, order) where `order` is the permutation applied to
    triangle ids: leaf ranges index the REORDERED triangle array, i.e.
    callers must permute their geometry arrays by `order`.

    ``backend``: "native" (C++ builder, native/strolle_native.cpp),
    "numpy", or None = native when available (it is ~100-1000x faster,
    which is what makes per-frame dynamic-scene rebuilds viable).

    ``ctx``: optional native.BvhContext enabling cross-frame
    subtree-hash reuse (builder.rs:204-279): unchanged subtrees are
    copied from the previous build instead of re-split.
    """
    if backend in (None, "native"):
        from .. import native

        if ctx is not None:
            out = ctx.build(np.asarray(positions, np.float32))
        else:
            out = native.bvh_build(np.asarray(positions, np.float32))
        if out is not None:
            cmin, cmax, child, count, order, max_depth = out
            # host numpy on purpose (jit transfers h2d on first call;
            # eager d2h readbacks cripple later gathers — ops/gather.py)
            return (
                BvhArrays(
                    child_min=cmin,
                    child_max=cmax,
                    child=child,
                    child_count=count,
                    max_depth=max_depth,
                ),
                order,
            )
        if backend == "native":
            raise RuntimeError("native BVH builder unavailable")
    return build_bvh_numpy(positions)


def build_bvh_numpy(positions: np.ndarray) -> tuple[BvhArrays, np.ndarray]:
    """Pure-numpy reference implementation of `build_bvh` (correctness
    baseline; used when the native library cannot be built)."""
    positions = np.asarray(positions, np.float32)
    t = positions.shape[0]
    assert t > 0
    tri_min = positions.min(axis=1)  # [T, 3]
    tri_max = positions.max(axis=1)
    centers = (tri_min + tri_max) * 0.5

    order = np.arange(t, dtype=np.int64)

    child_min: list[np.ndarray] = []
    child_max: list[np.ndarray] = []
    child: list[list[int]] = []
    child_count: list[list[int]] = []

    def half_area(bmin, bmax):
        e = np.maximum(bmax - bmin, 0.0)
        return e[0] * e[1] + e[1] * e[2] + e[2] * e[0]

    def range_bounds(ids):
        return tri_min[ids].min(axis=0), tri_max[ids].max(axis=0)

    def find_split(ids):
        """Returns (axis, threshold, cost) of the best binned split or
        None when unsplittable."""
        n = len(ids)
        c = centers[ids]
        best = None
        for axis in range(3):
            lo = c[:, axis].min()
            hi = c[:, axis].max()
            if hi - lo <= 1e-12:
                continue
            # bin triangle bounds by center
            scale = SAH_BINS * (1.0 - 1e-6) / (hi - lo)
            bins = np.minimum(
                ((c[:, axis] - lo) * scale).astype(np.int64), SAH_BINS - 1
            )
            bin_counts = np.bincount(bins, minlength=SAH_BINS)
            bin_min = np.full((SAH_BINS, 3), np.inf, np.float32)
            bin_max = np.full((SAH_BINS, 3), -np.inf, np.float32)
            for b in range(SAH_BINS):
                mask = bins == b
                if mask.any():
                    bin_min[b] = tri_min[ids][mask].min(axis=0)
                    bin_max[b] = tri_max[ids][mask].max(axis=0)
            # prefix/suffix sweeps
            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            lcount = np.cumsum(bin_counts)
            rcount = n - lcount
            for cut in range(SAH_BINS - 1):
                nl, nr = lcount[cut], rcount[cut]
                if nl == 0 or nr == 0:
                    continue
                cost = nl * half_area(lmin[cut], lmax[cut]) + nr * half_area(
                    rmin[cut + 1], rmax[cut + 1]
                )
                if best is None or cost < best[2]:
                    thresh = lo + (cut + 1) * (hi - lo) / SAH_BINS
                    best = (axis, thresh, cost)
        return best

    # Iterative top-down build over (slot writeback) worklist.
    # Each stack entry: (ids, parent_slot) where parent_slot=(node, k)
    # or None for the root.
    nodes_children: list[tuple] = []  # (c0_desc, c1_desc) per node
    out_order: list[np.ndarray] = []
    out_cursor = 0

    def build_range(ids) -> tuple[int, int] | tuple[int, int, bool]:
        """Returns child descriptor (token, count, is_leaf)."""
        nonlocal out_cursor
        n = len(ids)
        split = None if n <= 1 else find_split(ids)
        make_leaf = False
        if split is None:
            make_leaf = True
        else:
            axis, thresh, cost = split
            bmin, bmax = range_bounds(ids)
            leaf_cost = n * half_area(bmin, bmax)
            if cost >= leaf_cost and n <= MAX_LEAF_SIZE:
                make_leaf = True
        if make_leaf and n > MAX_LEAF_SIZE:
            # forced split by median when SAH says leaf but leaf too big
            c = centers[ids]
            axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            med = np.median(c[:, axis])
            left_mask = c[:, axis] <= med
            if left_mask.all() or not left_mask.any():
                left_mask = np.zeros(n, bool)
                left_mask[: n // 2] = True
            split = (axis, None, None, left_mask)
            make_leaf = False
        if make_leaf:
            first = out_cursor
            out_order.append(ids)
            out_cursor += n
            return (_leaf_token(first), n, True)

        if len(split) == 4:
            axis, _, _, left_mask = split
        else:
            axis, thresh, _ = split
            left_mask = centers[ids][:, axis] <= thresh
            if left_mask.all() or not left_mask.any():
                cvals = centers[ids][:, axis]
                half = len(ids) // 2
                left_mask = np.zeros(len(ids), bool)
                left_mask[np.argsort(cvals)[:half]] = True

        left_ids = ids[left_mask]
        right_ids = ids[~left_mask]
        node_id = len(nodes_children)
        nodes_children.append(None)  # reserve
        c0 = build_range(left_ids)
        c1 = build_range(right_ids)
        lmin, lmax = range_bounds(left_ids)
        rmin, rmax = range_bounds(right_ids)
        nodes_children[node_id] = (c0, c1, lmin, lmax, rmin, rmax)
        return (node_id, 0, False)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100_000))
    try:
        root_desc = build_range(order)
    finally:
        sys.setrecursionlimit(old_limit)

    new_order = np.concatenate(out_order) if out_order else order

    if root_desc[2]:  # whole scene in one leaf -> synth a root node
        bmin, bmax = tri_min.min(axis=0), tri_max.max(axis=0)
        n_all = len(new_order)
        n0 = n_all  # single child leaf; second child empty
        nodes_children.append(
            (
                (root_desc[0], root_desc[1], True),
                (_leaf_token(0), 0, True),
                bmin,
                bmax,
                bmin,
                bmax,
            )
        )

    n_nodes = len(nodes_children)
    a_child_min = np.zeros((n_nodes, 2, 3), np.float32)
    a_child_max = np.zeros((n_nodes, 2, 3), np.float32)
    a_child = np.zeros((n_nodes, 2), np.int32)
    a_count = np.zeros((n_nodes, 2), np.int32)
    for i, entry in enumerate(nodes_children):
        c0, c1, lmin, lmax, rmin, rmax = entry
        a_child_min[i, 0], a_child_max[i, 0] = lmin, lmax
        a_child_min[i, 1], a_child_max[i, 1] = rmin, rmax
        for k, cd in enumerate((c0, c1)):
            token, cnt, is_leaf = cd
            a_child[i, k] = token
            a_count[i, k] = cnt if is_leaf else 0

    # depth for stack sizing
    def depth_of(desc, d=1):
        if desc[2]:
            return d
        c0, c1, *_ = nodes_children[desc[0]]
        return max(depth_of(c0, d + 1), depth_of(c1, d + 1))

    sys.setrecursionlimit(max(old_limit, 100_000))
    try:
        if root_desc[2]:
            max_depth = 2
            root_id = n_nodes - 1
        else:
            max_depth = depth_of(root_desc)
            root_id = root_desc[0]
    finally:
        sys.setrecursionlimit(old_limit)

    # Node 0 must be the root for traversal; swap if needed.
    if root_id != 0:
        _swap_nodes(a_child_min, a_child_max, a_child, a_count, 0, root_id)

    arrays = BvhArrays(
        child_min=a_child_min,
        child_max=a_child_max,
        child=a_child,
        child_count=a_count,
        max_depth=int(max_depth) + 2,
    )
    return arrays, new_order


def _swap_nodes(cmin, cmax, child, count, a, b):
    for arr in (cmin, cmax, child, count):
        arr[[a, b]] = arr[[b, a]]
    # fix references to swapped ids
    ref = child
    is_internal = (ref >= 0) & (count == 0)
    to_a = is_internal & (ref == a)
    to_b = is_internal & (ref == b)
    ref[to_a] = b
    ref[to_b] = a


def sah_cost(arrays: BvhArrays) -> float:
    """Total SAH cost metric (sum over nodes of count*half_area for
    leaves) for build-quality regression tests."""
    cmin = np.asarray(arrays.child_min)
    cmax = np.asarray(arrays.child_max)
    count = np.asarray(arrays.child_count)
    e = np.maximum(cmax - cmin, 0.0)
    ha = e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]
    return float((ha * count).sum())


def pad_nodes(arrays: BvhArrays, capacity: int) -> BvhArrays:
    """Pads the node arrays to `capacity` rows so dynamic scenes keep a
    stable pytree shape across rebuilds (the reference grows its GPU
    buffer in 128 KiB steps for the same reason,
    buffers/mapped_storage_buffer.rs:28-57). Padding rows are empty
    leaves ([inf, -inf] boxes, count 0) that traversal never visits."""
    n = arrays.num_nodes
    if capacity <= n:
        return arrays
    pad = capacity - n
    inf = jnp.full((pad, 2, 3), jnp.inf, jnp.float32)
    return BvhArrays(
        child_min=jnp.concatenate([arrays.child_min, inf]),
        child_max=jnp.concatenate([arrays.child_max, -inf]),
        child=jnp.concatenate(
            [arrays.child, jnp.full((pad, 2), -1, jnp.int32)]
        ),
        child_count=jnp.concatenate(
            [arrays.child_count, jnp.zeros((pad, 2), jnp.int32)]
        ),
        max_depth=arrays.max_depth,
    )
