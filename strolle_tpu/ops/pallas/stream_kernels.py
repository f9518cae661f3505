"""Streaming cluster tracing: unbounded scene size, HBM-resident
geometry, double-buffered DMA.

The VMEM-resident kernels (trace_kernels.py brute, cluster_kernels.py)
cap out around ~100k triangles (the [T, 28] rows must fit in ~12 MB of
VMEM). This module removes the cap and the in-kernel culling overhead
in one move:

1. **Cull outside the kernel.** For every (ray tile, cluster) pair a
   conservative *interval-arithmetic* slab test runs in plain XLA: the
   tile's ray origins and directions are reduced to per-axis intervals
   and tested against the cluster AABB; any tile whose direction
   interval spans zero on an axis treats that axis as unconstrained
   (strictly conservative — false positives only, never false
   negatives, so closest-hit results are exact). Cost: O(tiles x K)
   scalar-ish work, microseconds. Coherent tiles (primary/shadow rays)
   cull 60-80% of clusters; incoherent tiles degrade to a full stream,
   which is exactly the brute-force behavior that is measured fastest
   anyway (xbench.py).

2. **Compact to per-tile cluster lists** (argsort entered-first) and
   hand them to the kernel as scalar-prefetch operands — the scalar
   core just walks an index list; there is no vector->scalar reduction
   or branch decision left inside the loop.

3. **Stream rows from HBM.** Triangle rows stay in HBM
   (memory_space=ANY); the kernel double-buffers CLUSTER rows through
   a [2, C/4, 128] VMEM scratch with async DMA, prefetching cluster
   i+1 while intersecting cluster i. Rows are packed FOUR triangles
   per 128-lane row (28 -> 32 floats each, pack4_rows) because Mosaic
   DMA slices must align to the (8,128) tiling — which also means each
   scalar row load feeds four Möller-Trumbore evaluations, improving
   the loop's load:compute ratio over the 28-wide VMEM kernels.

The kernel is find-only: it returns (t, tri, u, v) with all state in
fori-loop REGISTER carries (VMEM-scratch accumulators measured ~10x
slower — every masked store is a full-tile VMEM round trip), and the
winner's shading attributes are resolved outside by ops.hit.surface_at
(one screen-sized gather — cheap relative to a multi-hundred-k-row
stream, and it reuses the full texture/material logic).

This is the production large-scene path: the reference's per-thread
stack traversal (strolle-gpu/src/ray.rs:114-266) becomes "cull
coarsely, then stream dense work through the vector unit" — the shape
that actually fits a (8,128)-lane machine with a software-managed
memory hierarchy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster_kernels import CLUSTER_TRIS, clusterize_bvh, num_clusters  # noqa: F401
from .trace_kernels import LANES, _moller_trumbore

S_SUBLANES = 64
S_TILE = S_SUBLANES * LANES

#: triangles per packed 128-float row
PACK = 4
_REC = 32  # floats per triangle record in the packed layout

_BIG = 1e30


def pack4_rows(geom_rows: jnp.ndarray) -> jnp.ndarray:
    """[T', 28] attribute rows -> [ceil(T'/4), 128] DMA-aligned rows:
    four 32-float records per row (fields at m*32 + [0..27], 4 pad)."""
    t = geom_rows.shape[0]
    pad_t = (-t) % PACK
    if pad_t:
        geom_rows = jnp.concatenate(
            [geom_rows, jnp.zeros((pad_t, geom_rows.shape[1]), geom_rows.dtype)]
        )
    padw = jnp.zeros((geom_rows.shape[0], _REC - 28), geom_rows.dtype)
    rows32 = jnp.concatenate([geom_rows, padw], axis=-1)
    return rows32.reshape(-1, PACK * _REC)


def _interval_slab_entered(clus, o_lo, o_hi, d_lo, d_hi):
    """Conservative slab test: cluster AABBs [K, 8] vs per-tile ray
    intervals [g, 3]. Returns entered [g, K] (bool, conservative).

    Per axis the candidate t at a plane p is (p - o) / d; with o and d
    as intervals the extreme quotients are among the four products of
    interval endpoints of (p - o) and 1/d. When the direction interval
    spans zero the axis is unconstrained (t range = [-inf, +inf])."""
    bmin = clus[:, 0:3][None]  # [1, K, 3]
    bmax = clus[:, 3:6][None]
    o_lo = o_lo[:, None]  # [g, 1, 3]
    o_hi = o_hi[:, None]
    d_lo = d_lo[:, None]
    d_hi = d_hi[:, None]

    spans_zero = (d_lo <= 0.0) & (d_hi >= 0.0)
    safe_lo = jnp.where(spans_zero, 1.0, d_lo)
    safe_hi = jnp.where(spans_zero, 1.0, d_hi)
    i_lo = jnp.minimum(1.0 / safe_lo, 1.0 / safe_hi)
    i_hi = jnp.maximum(1.0 / safe_lo, 1.0 / safe_hi)

    # numerator intervals for the two planes
    n0_lo, n0_hi = bmin - o_hi, bmin - o_lo
    n1_lo, n1_hi = bmax - o_hi, bmax - o_lo

    def imul(a_lo, a_hi, b_lo, b_hi):
        p1 = a_lo * b_lo
        p2 = a_lo * b_hi
        p3 = a_hi * b_lo
        p4 = a_hi * b_hi
        return (
            jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4)),
            jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4)),
        )

    t0_lo, t0_hi = imul(n0_lo, n0_hi, i_lo, i_hi)
    t1_lo, t1_hi = imul(n1_lo, n1_hi, i_lo, i_hi)
    # entry = min(t0, t1) per axis; exit = max. Interval bounds:
    tn_lo = jnp.minimum(t0_lo, t1_lo)  # lower bound of per-axis entry
    tf_hi = jnp.maximum(t0_hi, t1_hi)  # upper bound of per-axis exit
    tn_lo = jnp.where(spans_zero, -_BIG, tn_lo)
    tf_hi = jnp.where(spans_zero, _BIG, tf_hi)

    tn = tn_lo.max(axis=-1)  # conservative entry lower bound
    tf = tf_hi.min(axis=-1)  # conservative exit upper bound
    return (tn <= tf) & (tf >= 0.0)


def cull_lists(clus_rows, o_planes, d_planes, g):
    """Per-tile compacted cluster lists.

    o/d_planes: the 6 [g*S_SUBLANES, LANES] ray component planes (the
    kernel's own input layout). Returns (idx [g, K] i32 entered-first,
    counts [g] i32)."""
    k = clus_rows.shape[0]

    def tile_minmax(p):
        v = p.reshape(g, S_TILE)
        return v.min(axis=1), v.max(axis=1)

    o_lo = jnp.stack([tile_minmax(p)[0] for p in o_planes], axis=-1)
    o_hi = jnp.stack([tile_minmax(p)[1] for p in o_planes], axis=-1)
    d_lo = jnp.stack([tile_minmax(p)[0] for p in d_planes], axis=-1)
    d_hi = jnp.stack([tile_minmax(p)[1] for p in d_planes], axis=-1)

    entered = _interval_slab_entered(clus_rows, o_lo, o_hi, d_lo, d_hi)
    counts = entered.sum(axis=1).astype(jnp.int32)
    # stable sort: entered clusters first, preserving front-to-back
    # (BVH/row) order within each group
    idx = jnp.argsort(~entered, axis=1, stable=True).astype(jnp.int32)
    return idx, counts


def _stream_surface_kernel(
    idx_ref, cnt_ref,  # scalar prefetch: [g, K] i32, [g] i32
    tri_hbm,  # [K*C/4, 128] packed rows in HBM (memory_space=ANY)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_out, tri_out, u_out, v_out,
    buf, sems,
):
    shape = (S_SUBLANES, LANES)
    g = pl.program_id(0)
    n = cnt_ref[g]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def get_dma(slot, i):
        k = idx_ref[g, i]
        return pltpu.make_async_copy(
            tri_hbm.at[
                pl.ds(k * (CLUSTER_TRIS // PACK), CLUSTER_TRIS // PACK)
            ],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n > 0)
    def _():
        get_dma(0, 0).start()

    def loop(i, carry):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n)
        def _():
            get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        get_dma(slot, i).wait()
        first = idx_ref[g, i] * CLUSTER_TRIS

        def body(j, c):
            bt, btri, bu, bv = c
            packed = buf[slot, j]
            for m in range(PACK):
                row = [packed[m * _REC + k] for k in range(9)]
                t, u, v, _hit = _moller_trumbore(
                    row, ox, oy, oz, dx, dy, dz
                )
                better = t < bt
                bt = jnp.where(better, t, bt)
                btri = jnp.where(better, first + j * PACK + m, btri)
                bu = jnp.where(better, u, bu)
                bv = jnp.where(better, v, bv)
            return bt, btri, bu, bv

        return jax.lax.fori_loop(0, CLUSTER_TRIS // PACK, body, carry)

    init = (
        jnp.full(shape, jnp.inf, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    bt, btri, bu, bv = jax.lax.fori_loop(0, n, loop, init)
    t_out[:] = bt
    tri_out[:] = btri
    u_out[:] = bu
    v_out[:] = bv


def _stream_anyhit_kernel(
    idx_ref, cnt_ref,
    tri_hbm,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    occ_out,
    buf, sems,
):
    shape = (S_SUBLANES, LANES)
    g = pl.program_id(0)
    n = cnt_ref[g]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]

    def get_dma(slot, i):
        k = idx_ref[g, i]
        return pltpu.make_async_copy(
            tri_hbm.at[
                pl.ds(k * (CLUSTER_TRIS // PACK), CLUSTER_TRIS // PACK)
            ],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n > 0)
    def _():
        get_dma(0, 0).start()

    def cond(carry):
        i, occ = carry
        return (i < n) & jnp.any((occ == 0) & (tmax > 0.0))

    def loop(carry):
        i, occ = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n)
        def _():
            get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        get_dma(slot, i).wait()

        def body(j, o_acc):
            packed = buf[slot, j]
            for m in range(PACK):
                row = [packed[m * _REC + k] for k in range(9)]
                t, _u, _v, _hit = _moller_trumbore(
                    row, ox, oy, oz, dx, dy, dz
                )
                o_acc = o_acc | (t < tmax).astype(jnp.int32)
            return o_acc

        occ = jax.lax.fori_loop(0, CLUSTER_TRIS // PACK, body, occ)
        return i + 1, occ

    final, occ = jax.lax.while_loop(
        cond, loop, (0, jnp.zeros(shape, jnp.int32))
    )

    # drain: if the loop exited early (all lanes occluded), the DMA for
    # cluster `final` is still in flight — wait so the semaphore is
    # clean when the kernel returns
    @pl.when(final < n)
    def _():
        get_dma(jax.lax.rem(final, 2), final).wait()

    occ_out[:] = occ


def _tile(o, d, extra=None):
    batch = o.shape[:-1]
    r = 1
    for s in batch:
        r *= s
    of = o.reshape(r, 3)
    df = d.reshape(r, 3)
    pad = (-r) % S_TILE
    if pad:
        of = jnp.concatenate([of, jnp.zeros((pad, 3), of.dtype)])
        df = jnp.concatenate(
            [df, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], df.dtype), (pad, 1))]
        )
    g = (r + pad) // S_TILE

    def plane(a):
        return a.reshape(g * S_SUBLANES, LANES)

    comps = [plane(of[:, i]) for i in range(3)] + [plane(df[:, i]) for i in range(3)]
    if extra is not None:
        e = extra.reshape(r)
        if pad:
            e = jnp.concatenate([e, jnp.zeros((pad,), e.dtype)])
        comps.append(plane(e))
    return batch, r, g, comps


def _ray_sort_keys(clus_rows, o, d):
    """Coherence keys: direction bins (major) + quantized origin cell.

    Incoherent ray sets (GI bounce rays, reference-mode bounces) defeat
    per-tile culling — a tile of 8k random rays enters every cluster.
    Sorting rays so each tile shares a direction cone and an origin
    neighborhood restores the cull rate; results are scattered back to
    the caller's order, so this is invisible semantically.

    MEASURED OFF by default: on this toolchain the permutation gathers
    cost far more than the restored culling saves (uniform-soup
    xbench: 1M tris 69 -> 1300 ms with sorting) — XLA-side gathers are
    the slowest op on TPU (ops/gather.py). Revisit only with an
    in-kernel permutation or for scenes with strong occlusion
    structure."""
    flat_o = o.reshape(-1, 3)
    flat_d = d.reshape(-1, 3)
    lo = clus_rows[:, 0:3].min(axis=0)
    hi = clus_rows[:, 3:6].max(axis=0)
    span = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(
        ((flat_o - lo) / span * 8.0).astype(jnp.int32), 0, 7
    )  # 3 bits/axis
    dbin = jnp.clip(((flat_d + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    # direction-major: tiles share a cone first, then an origin cell
    key = (
        (((dbin[:, 0] * 4 + dbin[:, 1]) * 4 + dbin[:, 2]) << 9)
        | (cell[:, 0] << 6)
        | (cell[:, 1] << 3)
        | cell[:, 2]
    )
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    return perm, inv


def _pad_rows(clus_rows, geom_rows):
    need = clus_rows.shape[0] * CLUSTER_TRIS
    if geom_rows.shape[0] < need:
        geom_rows = jnp.concatenate(
            [
                geom_rows,
                jnp.zeros(
                    (need - geom_rows.shape[0], geom_rows.shape[1]),
                    geom_rows.dtype,
                ),
            ]
        )
    return geom_rows


@partial(jax.jit, static_argnames=("interpret", "sort_rays"))
def stream_trace_surface_pallas(clus_rows, geom_rows, o, d, interpret=False,
                                sort_rays=False):
    """HBM-streaming cluster-culled closest hit. Scene size bounded by
    HBM, not VMEM. Find-only: returns {t, hit, u, v, tri}; resolve
    attributes with ops.hit.surface_at. ``sort_rays`` (default off —
    see _ray_sort_keys) groups rays by direction cone + origin cell
    before tiling; output order is unchanged."""
    batch = o.shape[:-1]
    if sort_rays:
        perm, inv = _ray_sort_keys(clus_rows, o, d)
        o = jnp.take(o.reshape(-1, 3), perm, axis=0)
        d = jnp.take(d.reshape(-1, 3), perm, axis=0)
    geom_rows = pack4_rows(_pad_rows(clus_rows, geom_rows))
    _, r, g, comps = _tile(o, d)
    idx, counts = cull_lists(clus_rows, comps[0:3], comps[3:6], g)

    shape = (g * S_SUBLANES, LANES)
    spec = pl.BlockSpec(
        (S_SUBLANES, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    f32 = jax.ShapeDtypeStruct(shape, jnp.float32)
    i32 = jax.ShapeDtypeStruct(shape, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [spec] * 6,
        out_specs=[spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, CLUSTER_TRIS // PACK, PACK * _REC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    t, tri, u, v = pl.pallas_call(
        _stream_surface_kernel,
        out_shape=(f32, i32, f32, f32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, counts, geom_rows, *comps)

    from .trace_kernels import _reshape_i32

    def restore(flat):
        if sort_rays:
            flat = jnp.take(flat, inv)
        return flat.reshape(batch)

    t = restore(t.reshape(-1)[:r])
    u = restore(u.reshape(-1)[:r])
    v = restore(v.reshape(-1)[:r])
    tri_i = restore(_reshape_i32(tri, r, (r,)))
    hit_b = tri_i >= 0
    return {
        "t": t,
        "hit": hit_b,
        "u": u,
        "v": v,
        "tri": jnp.where(hit_b, tri_i, -1),
    }


@partial(jax.jit, static_argnames=("interpret", "sort_rays"))
def stream_trace_anyhit_pallas(
    clus_rows, geom_rows, o, d, t_max, interpret=False, sort_rays=False
):
    batch = o.shape[:-1]
    t_max = jnp.broadcast_to(t_max, batch)
    if sort_rays:
        perm, inv = _ray_sort_keys(clus_rows, o, d)
        o = jnp.take(o.reshape(-1, 3), perm, axis=0)
        d = jnp.take(d.reshape(-1, 3), perm, axis=0)
        t_max = jnp.take(t_max.reshape(-1), perm)
    geom_rows = pack4_rows(_pad_rows(clus_rows, geom_rows))
    _, r, g, comps = _tile(o, d, extra=t_max.astype(jnp.float32))
    idx, counts = cull_lists(clus_rows, comps[0:3], comps[3:6], g)

    shape = (g * S_SUBLANES, LANES)
    spec = pl.BlockSpec(
        (S_SUBLANES, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [spec] * 7,
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((2, CLUSTER_TRIS // PACK, PACK * _REC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    occ = pl.pallas_call(
        _stream_anyhit_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, counts, geom_rows, *comps)
    flat = occ.reshape(-1)[:r]
    if sort_rays:
        flat = jnp.take(flat, inv)
    return (flat > 0).reshape(batch)
