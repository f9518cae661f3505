"""Vectorized BVH traversal in pure JAX (lax.while_loop + per-ray stacks).

Mirrors the reference's iterative stack traversal (strolle-gpu/src/
ray.rs:114-266): near-child-first ordering, far child pushed, leaf
ranges intersected inline. All rays advance in lockstep with masked
lanes; a ray whose stack empties goes idle until the loop exits.

This is the correctness baseline and the fallback for interpretability;
the Pallas packet-traversal kernel (ops/pallas/traverse.py) is the
speed-of-light path on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.hit import TriangleHit
from ..ops.intersect import ray_aabb, ray_triangle, safe_inv_dir
from .builder import MAX_LEAF_SIZE, BvhArrays


def _traverse(bvh: BvhArrays, positions, o, d, t_limit, any_hit: bool):
    """Core loop over flattened rays o/d [R, 3].

    Returns (t, tri, u, v) with t clipped to hits closer than t_limit
    (pass +inf lanes for closest-hit). For any_hit, exits early per-lane
    on the first accepted hit.
    """
    r = o.shape[0]
    maxd = bvh.max_depth
    # scene arrays may be host numpy (scene/build.py); coerce so the
    # while-loop body can fancy-index them with tracers.
    bvh = jax.tree.map(jnp.asarray, bvh)
    positions = jnp.asarray(positions)
    inv_d = safe_inv_dir(d)
    lane = jnp.arange(r)

    # carries derived from o so they inherit shard_map varying axes
    zero = o[..., 0] * 0.0
    stack = jnp.zeros((r, maxd), jnp.int32) + zero[:, None].astype(jnp.int32)
    ptr = zero.astype(jnp.int32) + 1  # root pre-pushed at slot 0

    best_t = jnp.asarray(t_limit, jnp.float32) + zero
    best_tri = zero.astype(jnp.int32) - 1
    best_u = zero
    best_v = zero

    def cond(carry):
        ptr, *_ = carry
        return jnp.any(ptr > 0)

    def body(carry):
        ptr, stack, best_t, best_tri, best_u, best_v = carry
        active = ptr > 0
        slot = jnp.maximum(ptr - 1, 0)
        node = stack[lane, slot]
        ptr = jnp.where(active, ptr - 1, ptr)

        cmin = bvh.child_min[node]  # [R, 2, 3]
        cmax = bvh.child_max[node]
        child = bvh.child[node]  # [R, 2]
        ccount = bvh.child_count[node]

        tbox = ray_aabb(
            o[:, None, :], inv_d[:, None, :], cmin, cmax, best_t[:, None]
        )  # [R, 2]
        box_hit = jnp.isfinite(tbox) & active[:, None]
        is_leaf = child < 0

        # --- leaf children: intersect their triangle ranges ------------
        first = -(child + 1)  # valid where is_leaf
        for k in range(2):
            leaf_mask = box_hit[:, k] & is_leaf[:, k]
            f = jnp.where(is_leaf[:, k], first[:, k], 0)
            cnt = jnp.where(leaf_mask, ccount[:, k], 0)
            for j in range(MAX_LEAF_SIZE):
                tri_idx = jnp.clip(f + j, 0, positions.shape[0] - 1)
                tri = positions[tri_idx]  # [R, 3, 3]
                t, u, v, _ = ray_triangle(
                    o, d, tri[:, 0], tri[:, 1], tri[:, 2]
                )
                ok = (j < cnt) & (t < best_t)
                best_tri = jnp.where(ok, tri_idx.astype(jnp.int32), best_tri)
                best_u = jnp.where(ok, u, best_u)
                best_v = jnp.where(ok, v, best_v)
                best_t = jnp.where(ok, t, best_t)

        # --- internal children: push far then near ---------------------
        push = box_hit & ~is_leaf
        near_is_0 = tbox[:, 0] <= tbox[:, 1]
        far_k = jnp.where(near_is_0, 1, 0)
        near_k = 1 - far_k
        far_child = child[lane, far_k]
        near_child = child[lane, near_k]
        far_push = push[lane, far_k]
        near_push = push[lane, near_k]

        stack = stack.at[lane, jnp.minimum(ptr, maxd - 1)].set(
            jnp.where(far_push, far_child, stack[lane, jnp.minimum(ptr, maxd - 1)])
        )
        ptr = jnp.where(far_push, ptr + 1, ptr)
        stack = stack.at[lane, jnp.minimum(ptr, maxd - 1)].set(
            jnp.where(near_push, near_child, stack[lane, jnp.minimum(ptr, maxd - 1)])
        )
        ptr = jnp.where(near_push, ptr + 1, ptr)

        if any_hit:
            # lane done as soon as something was hit
            ptr = jnp.where(best_tri >= 0, 0, ptr)

        return ptr, stack, best_t, best_tri, best_u, best_v

    init = (ptr, stack, best_t, best_tri, best_u, best_v)
    _, _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, init
    )
    return best_t, best_tri, best_u, best_v


def trace_closest_bvh(scene, o, d) -> TriangleHit:
    batch = o.shape[:-1]
    of = o.reshape(-1, 3)
    df = d.reshape(-1, 3)
    t, tri, u, v = _traverse(
        scene.bvh, scene.geometry.positions, of, df, jnp.inf, any_hit=False
    )
    t = jnp.where(tri >= 0, t, jnp.inf)
    return TriangleHit(
        t=t.reshape(batch),
        tri=tri.reshape(batch),
        u=u.reshape(batch),
        v=v.reshape(batch),
    )


def trace_anyhit_bvh(scene, o, d, t_max) -> jnp.ndarray:
    batch = o.shape[:-1]
    of = o.reshape(-1, 3)
    df = d.reshape(-1, 3)
    tl = jnp.broadcast_to(t_max, batch).reshape(-1)
    _, tri, _, _ = _traverse(
        scene.bvh, scene.geometry.positions, of, df, tl, any_hit=True
    )
    return (tri >= 0).reshape(batch)


#: Bytes charged per traversal event, matching the reference's
#: used_memory accounting (ray.rs:141,147,184): each visited node
#: fetches its header Vec4 (16 B) + 3 more Vec4s when internal (48 B);
#: each tested leaf triangle fetches one leaf Vec4 + a 9-Vec4 Triangle.
NODE_BYTES = 64
TRIANGLE_BYTES = 160


def trace_cost_bvh(scene, o, d) -> jnp.ndarray:
    """Per-ray traversal memory traffic in bytes (the reference's
    used_memory counter, ray.rs:126-147,184) for the BVH heatmap debug
    view and TPU load-balance profiling. Same traversal structure as
    _traverse, with a bytes carry instead of early exits."""
    bvh = jax.tree.map(jnp.asarray, scene.bvh)
    positions = jnp.asarray(scene.geometry.positions)
    batch = o.shape[:-1]
    of = o.reshape(-1, 3)
    df = d.reshape(-1, 3)
    r = of.shape[0]
    maxd = bvh.max_depth
    inv_d = safe_inv_dir(df)
    lane = jnp.arange(r)

    zero = of[..., 0] * 0.0
    stack = jnp.zeros((r, maxd), jnp.int32) + zero[:, None].astype(jnp.int32)
    ptr = zero.astype(jnp.int32) + 1
    best_t = jnp.inf + zero
    used = zero.astype(jnp.int32)

    def cond(carry):
        ptr, *_ = carry
        return jnp.any(ptr > 0)

    def body(carry):
        ptr, stack, best_t, used = carry
        active = ptr > 0
        slot = jnp.maximum(ptr - 1, 0)
        node = stack[lane, slot]
        ptr = jnp.where(active, ptr - 1, ptr)
        used = jnp.where(active, used + NODE_BYTES, used)

        cmin = bvh.child_min[node]
        cmax = bvh.child_max[node]
        child = bvh.child[node]
        ccount = bvh.child_count[node]

        tbox = ray_aabb(
            of[:, None, :], inv_d[:, None, :], cmin, cmax, best_t[:, None]
        )
        box_hit = jnp.isfinite(tbox) & active[:, None]
        is_leaf = child < 0
        first = -(child + 1)

        for k in range(2):
            leaf_mask = box_hit[:, k] & is_leaf[:, k]
            f = jnp.where(is_leaf[:, k], first[:, k], 0)
            cnt = jnp.where(leaf_mask, ccount[:, k], 0)
            used = used + cnt * TRIANGLE_BYTES
            for j in range(MAX_LEAF_SIZE):
                tri_idx = jnp.clip(f + j, 0, positions.shape[0] - 1)
                tri = positions[tri_idx]
                t, _, _, _ = ray_triangle(of, df, tri[:, 0], tri[:, 1], tri[:, 2])
                ok = (j < cnt) & (t < best_t)
                best_t = jnp.where(ok, t, best_t)

        push = box_hit & ~is_leaf
        near_is_0 = tbox[:, 0] <= tbox[:, 1]
        far_k = jnp.where(near_is_0, 1, 0)
        near_k = 1 - far_k
        far_child = child[lane, far_k]
        near_child = child[lane, near_k]
        far_push = push[lane, far_k]
        near_push = push[lane, near_k]

        stack = stack.at[lane, jnp.minimum(ptr, maxd - 1)].set(
            jnp.where(far_push, far_child, stack[lane, jnp.minimum(ptr, maxd - 1)])
        )
        ptr = jnp.where(far_push, ptr + 1, ptr)
        stack = stack.at[lane, jnp.minimum(ptr, maxd - 1)].set(
            jnp.where(near_push, near_child, stack[lane, jnp.minimum(ptr, maxd - 1)])
        )
        ptr = jnp.where(near_push, ptr + 1, ptr)
        return ptr, stack, best_t, used

    _, _, _, used = jax.lax.while_loop(cond, body, (ptr, stack, best_t, used))
    return used.reshape(batch)
