"""Pallas packet BVH traversal.

TPU-first redesign of the reference's per-thread stack traversal
(strolle-gpu/src/ray.rs:114-266): a whole ray tile (SUBLANES x 128
rays) traverses the tree together with ONE shared stack in SMEM —
scalar control flow, vector AABB/triangle tests, zero per-lane
gathers. Near-child-first ordering uses the tile-reduced entry
distance; a node is descended if ANY ray in the tile wants it.

This is the classic packet-traversal formulation, which maps exactly
onto the TPU's scalar-core + VPU split. It shines on coherent rays
(primary, shadow) and degrades gracefully on incoherent ones (the tile
visits the union of nodes).

Data layout:
* nodes  [N, 16]: lmin(3) lmax(3) rmin(3) rmax(3) child0 child1
  count0 count1 (children/counts as exact-integer f32);
  child < 0 encodes a leaf with first = -(child+1).
* tris   [T, 28]: the pack_geometry rows of trace_kernels.py; leaf
  ranges are contiguous (bvh builder reorders triangles).

Winning-hit surface attributes (normal/uv/material) are interpolated
eagerly per accepted candidate and kept in VMEM scratch, so no XLA
gather ever touches the geometry.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace_kernels import LANES, _moller_trumbore, pack_geometry  # noqa: F401

BVH_SUBLANES = 32
BVH_TILE = BVH_SUBLANES * LANES
MAX_STACK = 48
MAX_LEAF = 8  # bvh/builder.py MAX_LEAF_SIZE

_BIG = 1e30


def pack_nodes(bvh) -> jnp.ndarray:
    """BvhArrays -> [N, 16] rows."""
    n = bvh.num_nodes
    return jnp.concatenate(
        [
            bvh.child_min[:, 0],
            bvh.child_max[:, 0],
            bvh.child_min[:, 1],
            bvh.child_max[:, 1],
            bvh.child.astype(jnp.float32),
            bvh.child_count.astype(jnp.float32),
        ],
        axis=-1,
    )


def _aabb_hit(bmin, bmax, ox, oy, oz, idx, idy, idz, tmax):
    """Slab test of one box (scalars) against the tile. Returns
    (hit mask, entry t with +BIG on miss)."""
    t0x = (bmin[0] - ox) * idx
    t1x = (bmax[0] - ox) * idx
    t0y = (bmin[1] - oy) * idy
    t1y = (bmax[1] - oy) * idy
    t0z = (bmin[2] - oz) * idz
    t1z = (bmax[2] - oz) * idz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    hit = (tn <= tf) & (tf >= 0.0) & (tn <= tmax)
    return hit, jnp.where(hit, tn, _BIG)


def _leaf_intersect(
    tri_ref, first, count, ox, oy, oz, dx, dy, dz,
    bt_ref, nx_ref, ny_ref, nz_ref, ux_ref, uy_ref, mat_ref, hit_ref,
    id_ref,
):
    """Masked loop over one leaf's triangles, updating the best-hit
    scratch state with eagerly interpolated attributes."""

    def body(j, _):
        @pl.when(j < count)
        def _():
            row = tri_ref[first + j]
            t, u, v, _hit = _moller_trumbore(row, ox, oy, oz, dx, dy, dz)
            bt = bt_ref[:]
            better = t < bt
            w = 1.0 - u - v
            # det sign for the two-sided normal flip
            px = dy * row[8] - dz * row[7]
            py = dz * row[6] - dx * row[8]
            pz = dx * row[7] - dy * row[6]
            det = row[3] * px + row[4] * py + row[5] * pz
            nx = w * row[9] + u * row[12] + v * row[15]
            ny = w * row[10] + u * row[13] + v * row[16]
            nz = w * row[11] + u * row[14] + v * row[17]
            flip = jnp.where(det >= 0.0, 1.0, -1.0)
            bt_ref[:] = jnp.where(better, t, bt)
            hit_ref[:] = jnp.where(better, 1, hit_ref[:])
            nx_ref[:] = jnp.where(better, nx * flip, nx_ref[:])
            ny_ref[:] = jnp.where(better, ny * flip, ny_ref[:])
            nz_ref[:] = jnp.where(better, nz * flip, nz_ref[:])
            ux_ref[:] = jnp.where(
                better, w * row[18] + u * row[20] + v * row[22], ux_ref[:]
            )
            uy_ref[:] = jnp.where(
                better, w * row[19] + u * row[21] + v * row[23], uy_ref[:]
            )
            mat_ref[:] = jnp.where(better, row[24], mat_ref[:])
            # row index = triangle id (builder reorders geometry into
            # BVH order); exact in f32 up to 2^24 triangles
            id_ref[:] = jnp.where(
                better, (first + j).astype(jnp.float32), id_ref[:]
            )

        return 0

    jax.lax.fori_loop(0, MAX_LEAF, body, 0)


def _bvh_surface_kernel(
    node_ref, tri_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_out, n_x, n_y, n_z, uv_x, uv_y, mat_out, hit_out, id_out,
    stack_ref, bt_ref, nx_ref, ny_ref, nz_ref, ux_ref, uy_ref, mat_ref,
    hit_ref, id_ref,
):
    shape = (BVH_SUBLANES, LANES)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    tiny = 1e-20
    idx = 1.0 / jnp.where(jnp.abs(dx) < tiny, jnp.where(dx >= 0, tiny, -tiny), dx)
    idy = 1.0 / jnp.where(jnp.abs(dy) < tiny, jnp.where(dy >= 0, tiny, -tiny), dy)
    idz = 1.0 / jnp.where(jnp.abs(dz) < tiny, jnp.where(dz >= 0, tiny, -tiny), dz)

    bt_ref[:] = jnp.full(shape, jnp.inf, jnp.float32)
    hit_ref[:] = jnp.zeros(shape, jnp.int32)
    nx_ref[:] = jnp.zeros(shape, jnp.float32)
    ny_ref[:] = jnp.zeros(shape, jnp.float32)
    nz_ref[:] = jnp.zeros(shape, jnp.float32)
    ux_ref[:] = jnp.zeros(shape, jnp.float32)
    uy_ref[:] = jnp.zeros(shape, jnp.float32)
    mat_ref[:] = jnp.zeros(shape, jnp.float32)
    id_ref[:] = jnp.full(shape, -1.0, jnp.float32)

    stack_ref[0] = 0  # root

    def cond(ptr):
        return ptr > 0

    def body(ptr):
        node = stack_ref[ptr - 1]
        ptr = ptr - 1
        row = node_ref[node]
        tmax = bt_ref[:]

        hit0, tn0 = _aabb_hit(
            (row[0], row[1], row[2]), (row[3], row[4], row[5]),
            ox, oy, oz, idx, idy, idz, tmax,
        )
        hit1, tn1 = _aabb_hit(
            (row[6], row[7], row[8]), (row[9], row[10], row[11]),
            ox, oy, oz, idx, idy, idz, tmax,
        )
        any0 = jnp.any(hit0)
        any1 = jnp.any(hit1)
        c0 = row[12].astype(jnp.int32)
        c1 = row[13].astype(jnp.int32)
        cnt0 = row[14].astype(jnp.int32)
        cnt1 = row[15].astype(jnp.int32)
        leaf0 = c0 < 0
        leaf1 = c1 < 0

        @pl.when(any0 & leaf0)
        def _():
            _leaf_intersect(
                tri_ref, -(c0 + 1), cnt0, ox, oy, oz, dx, dy, dz,
                bt_ref, nx_ref, ny_ref, nz_ref, ux_ref, uy_ref, mat_ref,
                hit_ref, id_ref,
            )

        @pl.when(any1 & leaf1)
        def _():
            _leaf_intersect(
                tri_ref, -(c1 + 1), cnt1, ox, oy, oz, dx, dy, dz,
                bt_ref, nx_ref, ny_ref, nz_ref, ux_ref, uy_ref, mat_ref,
                hit_ref, id_ref,
            )

        # interior pushes: far child first so the near one pops first
        push0 = any0 & ~leaf0
        push1 = any1 & ~leaf1
        m0 = jnp.min(jnp.where(hit0, tn0, _BIG))
        m1 = jnp.min(jnp.where(hit1, tn1, _BIG))
        near_is_0 = m0 <= m1
        first_child = jnp.where(near_is_0, c1, c0)  # far pushed first
        first_push = jnp.where(near_is_0, push1, push0)
        second_child = jnp.where(near_is_0, c0, c1)
        second_push = jnp.where(near_is_0, push0, push1)

        @pl.when(first_push)
        def _():
            stack_ref[ptr] = first_child

        ptr = jnp.where(first_push, ptr + 1, ptr)

        @pl.when(second_push)
        def _():
            stack_ref[ptr] = second_child

        ptr = jnp.where(second_push, ptr + 1, ptr)
        return jnp.minimum(ptr, MAX_STACK - 1)

    jax.lax.while_loop(cond, body, 1)

    # normalize the interpolated normal and emit
    nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    t_out[:] = bt_ref[:]
    hit_out[:] = hit_ref[:]
    n_x[:] = nx * inv
    n_y[:] = ny * inv
    n_z[:] = nz * inv
    uv_x[:] = ux_ref[:]
    uv_y[:] = uy_ref[:]
    mat_out[:] = mat_ref[:]
    id_out[:] = id_ref[:]


def _bvh_anyhit_kernel(
    node_ref, tri_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    occ_out,
    stack_ref, occ_ref,
):
    shape = (BVH_SUBLANES, LANES)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]

    tiny = 1e-20
    idx = 1.0 / jnp.where(jnp.abs(dx) < tiny, jnp.where(dx >= 0, tiny, -tiny), dx)
    idy = 1.0 / jnp.where(jnp.abs(dy) < tiny, jnp.where(dy >= 0, tiny, -tiny), dy)
    idz = 1.0 / jnp.where(jnp.abs(dz) < tiny, jnp.where(dz >= 0, tiny, -tiny), dz)

    occ_ref[:] = jnp.zeros(shape, jnp.int32)
    stack_ref[0] = 0

    def leaf(first, count):
        def body(j, _):
            @pl.when(j < count)
            def _():
                row = tri_ref[first + j]
                t, _, _, _hit = _moller_trumbore(row, ox, oy, oz, dx, dy, dz)
                occ_ref[:] = occ_ref[:] | (t < tmax).astype(jnp.int32)

            return 0

        jax.lax.fori_loop(0, MAX_LEAF, body, 0)

    def cond(ptr):
        return (ptr > 0) & jnp.any(
            (occ_ref[:] == 0) & (tmax > 0.0)
        )

    def body(ptr):
        node = stack_ref[ptr - 1]
        ptr = ptr - 1
        row = node_ref[node]
        live = jnp.where((occ_ref[:] > 0) | (tmax <= 0.0), 0.0, tmax)

        hit0, _ = _aabb_hit(
            (row[0], row[1], row[2]), (row[3], row[4], row[5]),
            ox, oy, oz, idx, idy, idz, live,
        )
        hit1, _ = _aabb_hit(
            (row[6], row[7], row[8]), (row[9], row[10], row[11]),
            ox, oy, oz, idx, idy, idz, live,
        )
        any0 = jnp.any(hit0 & (live > 0.0))
        any1 = jnp.any(hit1 & (live > 0.0))
        c0 = row[12].astype(jnp.int32)
        c1 = row[13].astype(jnp.int32)
        cnt0 = row[14].astype(jnp.int32)
        cnt1 = row[15].astype(jnp.int32)

        @pl.when(any0 & (c0 < 0))
        def _():
            leaf(-(c0 + 1), cnt0)

        @pl.when(any1 & (c1 < 0))
        def _():
            leaf(-(c1 + 1), cnt1)

        push0 = any0 & (c0 >= 0)
        push1 = any1 & (c1 >= 0)

        @pl.when(push0)
        def _():
            stack_ref[ptr] = c0

        ptr = jnp.where(push0, ptr + 1, ptr)

        @pl.when(push1)
        def _():
            stack_ref[ptr] = c1

        ptr = jnp.where(push1, ptr + 1, ptr)
        return jnp.minimum(ptr, MAX_STACK - 1)

    jax.lax.while_loop(cond, body, 1)
    occ_out[:] = occ_ref[:]


def _tile(o, d, extra=None):
    batch = o.shape[:-1]
    r = 1
    for s in batch:
        r *= s
    of = o.reshape(r, 3)
    df = d.reshape(r, 3)
    pad = (-r) % BVH_TILE
    if pad:
        of = jnp.concatenate([of, jnp.zeros((pad, 3), of.dtype)])
        df = jnp.concatenate(
            [df, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], df.dtype), (pad, 1))]
        )
    g = (r + pad) // BVH_TILE

    def plane(a):
        return a.reshape(g * BVH_SUBLANES, LANES)

    comps = [plane(of[:, i]) for i in range(3)] + [plane(df[:, i]) for i in range(3)]
    if extra is not None:
        e = extra.reshape(r)
        if pad:
            e = jnp.concatenate([e, jnp.zeros((pad,), e.dtype)])
        comps.append(plane(e))
    return batch, r, g, comps


@partial(jax.jit, static_argnames=("interpret",))
def bvh_trace_surface_pallas(node_rows, geom_rows, o, d, interpret=False):
    """Packet-BVH closest hit with in-kernel attribute resolve.

    Returns dict: t, hit (bool), normal [..,3], uv [..,2], mat_id,
    tri (i32, -1 on miss)."""
    batch, r, g, comps = _tile(o, d)
    shape = (g * BVH_SUBLANES, LANES)
    spec = pl.BlockSpec(
        (BVH_SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    f32 = jax.ShapeDtypeStruct(shape, jnp.float32)
    i32 = jax.ShapeDtypeStruct(shape, jnp.int32)
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [spec] * 6,
        out_specs=[spec] * 9,
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.float32),  # bt
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.float32),  # nx
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.float32),  # ny
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.float32),  # nz
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.float32),  # ux
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.float32),  # uy
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.float32),  # mat
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.int32),  # hit
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.float32),  # tri id
        ],
    )
    outs = pl.pallas_call(
        _bvh_surface_kernel,
        out_shape=(f32, f32, f32, f32, f32, f32, f32, i32, f32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(node_rows, geom_rows, *comps)
    t, nx, ny, nz, ux, uy, mat, hit, tri = outs

    def unpack(a):
        return a.reshape(-1)[:r].reshape(batch)

    from .trace_kernels import _reshape_i32

    hit_b = _reshape_i32(hit, r, batch) > 0
    return {
        "t": unpack(t),
        "hit": hit_b,
        "normal": jnp.stack([unpack(nx), unpack(ny), unpack(nz)], axis=-1),
        "uv": jnp.stack([unpack(ux), unpack(uy)], axis=-1),
        "mat_id": unpack(mat).astype(jnp.int32),
        "tri": jnp.where(hit_b, unpack(tri).astype(jnp.int32), -1),
    }


@partial(jax.jit, static_argnames=("interpret",))
def bvh_trace_anyhit_pallas(node_rows, geom_rows, o, d, t_max, interpret=False):
    t_max = jnp.broadcast_to(t_max, o.shape[:-1])
    batch, r, g, comps = _tile(o, d, extra=t_max.astype(jnp.float32))
    shape = (g * BVH_SUBLANES, LANES)
    spec = pl.BlockSpec(
        (BVH_SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [spec] * 7,
        out_specs=spec,
        scratch_shapes=[
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.VMEM((BVH_SUBLANES, LANES), jnp.int32),
        ],
    )
    occ = pl.pallas_call(
        _bvh_anyhit_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(node_rows, geom_rows, *comps)
    return (occ.reshape(-1)[:r] > 0).reshape(batch)
