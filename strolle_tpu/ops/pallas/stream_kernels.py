"""Streaming cluster tracing: unbounded scene size, HBM-resident
geometry, double-buffered DMA, front-to-back early termination.

The VMEM-resident kernels (trace_kernels.py brute, cluster_kernels.py)
cap out around ~100k triangles (the [T, 28] rows must fit in ~12 MB of
VMEM). This module removes the cap and — since round 4 — the linear
cost per ray, replacing the reference's per-thread stack traversal
(strolle-gpu/src/ray.rs:114-266) with a two-level hierarchy shaped for
a (8,128)-lane machine:

1. **Cull + order outside the kernel.** For every (ray tile, cluster)
   pair a conservative *interval-arithmetic* slab test runs in plain
   XLA: the tile's ray origins and directions are reduced to per-axis
   intervals and tested against the cluster AABB (strictly
   conservative — false positives only, so results stay exact). The
   same test yields a conservative LOWER BOUND on each cluster's entry
   distance; entered clusters are sorted by it, giving each tile a
   front-to-back cluster list (the moral equivalent of the
   reference's near-child-first traversal order, ray.rs:140-166).

2. **Early termination inside the kernel.** The per-tile walk is a
   while loop that stops as soon as the next cluster's entry lower
   bound exceeds every lane's current best hit — for closest-hit with
   front-to-back order this is the step that makes cost per ray scale
   with what the ray can actually see, not with scene size. Each
   lane's best-t starts at its *scene-AABB exit distance* (not +inf),
   so rays that miss everything — and the tile-padding lanes — cannot
   hold the loop open past the geometry they overlap.

3. **Per-lane cluster re-test, then per-SUB-BLOCK re-test.** The
   tile-interval cull is coarse (false positives); each walked cluster
   is slab-tested per lane against the current best-t and skipped
   entirely when no lane can improve (compute skip; the prefetched
   DMA still lands, which is the right trade — the stream is
   compute-bound, not bandwidth-bound). An ENTERED cluster then walks
   its SUB sub-blocks (CLUSTER_TRIS/SUB triangles each) with the same
   per-lane slab test against a finer AABB table, so the dense
   Möller-Trumbore loop only runs over the sub-blocks some lane can
   actually improve in — a third hierarchy level that cuts the dense
   work per entered cluster by the fraction of the cluster the tile's
   frustum actually clips.

4. **Stream rows from HBM.** Triangle rows stay in HBM
   (memory_space=ANY); the kernel double-buffers CLUSTER rows through
   a [2, C/4, 128] VMEM scratch with async DMA, prefetching cluster
   i+1 while testing/intersecting cluster i (slot i%2 holds the
   current rows, slot (i+1)%2 receives the prefetch; the one
   outstanding DMA is drained after the loop). Rows are packed FOUR
   triangles per 128-lane row (28 -> 32 floats each, pack4_rows)
   because Mosaic DMA slices must align to the (8,128) tiling — which
   also means each scalar row load feeds four Möller-Trumbore
   evaluations.

The kernel is find-only: it returns (t, tri, u, v) with all state in
loop REGISTER carries (VMEM-scratch accumulators measured ~10x
slower), and the winner's shading attributes are resolved outside by
ops.hit.surface_at (one screen-sized gather — cheap relative to the
stream, and it reuses the full texture/material logic).

Anyhit rays additionally cull with their t_max: the tile list keeps
only clusters entered before the tile's largest t_max, and per-lane
t_max is clipped to the scene-AABB exit so unbounded shadow rays
(sun/sky) terminate with the geometry too.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster_kernels import (  # noqa: F401
    CLUSTER_TRIS,
    _cluster_aabb_any,
    _inv_dirs,
    clusterize_bvh,
    num_clusters,
)
from .trace_kernels import LANES, _moller_trumbore

#: Ray tile = S_SUBLANES x 128 lanes. Small tiles make the per-tile
#: cull + per-lane best-t pretest bite (tight ray-interval frustum ->
#: few clusters enter); too small and the while-loop/DMA overhead per
#: tile dominates. Swept on the 262k soup, 486k coherent rays,
#: device-resident scene, floor-subtracted (sweep_stream.py r5):
#: 8 sublanes -> 70 ms, 16 -> 33 ms, 32 -> 26 ms, 64 -> 32 ms.
S_SUBLANES = 32
S_TILE = S_SUBLANES * LANES

#: Pixel block mapped to one ray tile (BLOCK_H * BLOCK_W == S_TILE).
BLOCK_H = 64
BLOCK_W = 64

#: triangles per packed 128-float row
PACK = 4
_REC = 32  # floats per triangle record in the packed layout

#: Sub-blocks per cluster (third hierarchy level). Each entered
#: cluster's dense loop is split into SUB conditionally-skipped spans
#: of CLUSTER_TRIS/SUB triangles, gated by a per-lane slab test
#: against a finer AABB ([K*SUB, 8] VMEM table). 32-triangle
#: sub-blocks cost ~8 packed-row iterations per entered span vs one
#: extra vector slab test per span — the span skip wins whenever the
#: tile's frustum clips less than ~7/8 of the cluster.
SUB = 8

_BIG = 1e30


def sub_aabbs(clus_rows, geom_rows) -> jnp.ndarray:
    """[K*SUB, 8] sub-block AABB rows (lo3 hi3 pad2) from the raw
    [T, 28] attribute rows (v0/e1/e2 in columns 0:9, pack_geometry).

    Rows past T (padding) replicate the LAST REAL row's box: the box
    only has to cover triangles that can hit, and padded rows are
    degenerate (zeros — Möller-Trumbore misses them), so edge
    replication keeps the tail sub-blocks tight instead of inflating
    them with a sentinel. (An "inverted" lo > hi empty-box encoding
    would test as an infinite slab under the Tavian min/max test —
    always entered — so it is not an option.)
    """
    k = clus_rows.shape[0]
    need = k * CLUSTER_TRIS
    v0 = geom_rows[:, 0:3]
    p1 = v0 + geom_rows[:, 3:6]
    p2 = v0 + geom_rows[:, 6:9]
    lo = jnp.minimum(v0, jnp.minimum(p1, p2))
    hi = jnp.maximum(v0, jnp.maximum(p1, p2))
    t = geom_rows.shape[0]
    if t < need:
        lo = jnp.concatenate(
            [lo, jnp.broadcast_to(lo[-1:], (need - t, 3))]
        )
        hi = jnp.concatenate(
            [hi, jnp.broadcast_to(hi[-1:], (need - t, 3))]
        )
    lo = lo[:need].reshape(k * SUB, CLUSTER_TRIS // SUB, 3).min(axis=1)
    hi = hi[:need].reshape(k * SUB, CLUSTER_TRIS // SUB, 3).max(axis=1)
    pad = jnp.zeros((k * SUB, 2), lo.dtype)
    return jnp.concatenate([lo, hi, pad], axis=-1)


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


def _interval_slab(clus, o_lo, o_hi, d_lo, d_hi):
    """Conservative slab test: cluster AABBs [K, 8] vs per-tile ray
    intervals [g, 3]. Returns (entered [g, K] bool, tn_lo [g, K] f32 —
    a conservative lower bound on any tile ray's entry distance).

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
    entered = (tn <= tf) & (tf >= 0.0)

    # Direction-free distance bound: for a ray starting inside the
    # tile's origin box, the entry parameter satisfies
    # t * |d| >= dist(origin_box, cluster_box), so
    # t >= dist / max|d|. INCOHERENT tiles (GI/reference bounce rays —
    # every direction interval spans zero) collapse the slab bound to
    # 0, which killed front-to-back ordering and early termination;
    # their ORIGINS stay screen-block coherent, so this euclidean bound
    # keeps the walk ordered by distance from the origin block and the
    # loop closes as soon as every lane's closest hit is nearer than
    # the next cluster (measured: the whole fix is what makes dungeon
    # bounce traces terminate after the nearby corridors instead of
    # walking the level).
    gap = jnp.maximum(
        jnp.maximum(bmin - o_hi, o_lo - bmax), 0.0
    )  # [g, K, 3]
    dist = jnp.sqrt(jnp.sum(gap * gap, axis=-1))
    dmax = jnp.maximum(jnp.abs(d_lo), jnp.abs(d_hi))  # [g, 1, 3]
    dnorm_hi = jnp.sqrt(jnp.sum(dmax * dmax, axis=-1))  # [g, 1]
    tn_dist = dist / jnp.maximum(dnorm_hi, 1e-20)

    return entered, jnp.maximum(jnp.maximum(tn, tn_dist), 0.0)


def _tile_minmax(p, g):
    v = p.reshape(g, S_TILE)
    return v.min(axis=1), v.max(axis=1)


#: SMEM budget for the per-tile cluster lists. The lists live in SMEM
#: for ALL grid steps at once (scalar prefetch: [g, L] i32 idx +
#: [g, L] f32 tmins = 8 bytes/entry), so L adapts to the grid size —
#: see _list_cap. Tiles whose cull admits more than L clusters are
#: encoded as OVERFLOW (count -1) and walk every cluster in index
#: order instead; the per-lane best-t pretest still skips almost all
#: of them, so overflow degrades gracefully — but it costs a full
#: K-length pretest walk, so the cap matters (262k soup @1M tris: a
#: fixed 128 cap left 56% of tiles in overflow).
_LIST_SMEM_BUDGET = 700_000


def _list_cap(g: int, k: int) -> int:
    return int(max(64, min(512, _LIST_SMEM_BUDGET // (8 * max(g, 1)), k)))


def cull_lists(clus_rows, o_planes, d_planes, g, tmax_plane=None):
    """Per-tile compacted, FRONT-TO-BACK-ordered cluster lists.

    o/d_planes: the 6 [g*S_SUBLANES, LANES] ray component planes (the
    kernel's own input layout). ``tmax_plane``: optional anyhit range
    plane — clusters entered past the tile's largest t_max are culled.
    Returns (idx [g, L] i32, first min(count, L) entries sorted by
    conservative entry distance; counts [g] i32 with -1 encoding
    "overflow: walk all K in index order"; tmins [g, L] f32 aligned
    with idx — diagnostics/tests only, the kernel does not read it)."""
    o_lo = jnp.stack([_tile_minmax(p, g)[0] for p in o_planes], axis=-1)
    o_hi = jnp.stack([_tile_minmax(p, g)[1] for p in o_planes], axis=-1)
    d_lo = jnp.stack([_tile_minmax(p, g)[0] for p in d_planes], axis=-1)
    d_hi = jnp.stack([_tile_minmax(p, g)[1] for p in d_planes], axis=-1)

    entered, tn_lo = _interval_slab(clus_rows, o_lo, o_hi, d_lo, d_hi)
    if tmax_plane is not None:
        _, tmax_hi = _tile_minmax(tmax_plane, g)
        entered = entered & (tn_lo <= tmax_hi[:, None])
    counts = entered.sum(axis=1).astype(jnp.int32)
    # front-to-back: entered clusters sorted by entry lower bound,
    # non-entered pushed to the end (_BIG keys)
    key = jnp.where(entered, tn_lo, _BIG)
    order = jnp.argsort(key, axis=1, stable=True)
    tmins = jnp.take_along_axis(key, order, axis=1)
    lcap = _list_cap(g, order.shape[1])
    counts = jnp.where(counts > lcap, -1, counts)
    return order[:, :lcap].astype(jnp.int32), counts, tmins[:, :lcap]


def scene_tcap(clus_rows, o_planes, d_planes):
    """Per-ray best-t initialization: the ray's exit distance from the
    global scene AABB (plus slack). No triangle lies beyond it, so it
    is a sound cap — and it is what keeps miss rays (and tile-padding
    lanes) from defeating the front-to-back early termination."""
    lo = clus_rows[:, 0:3].min(axis=0)
    hi = clus_rows[:, 3:6].max(axis=0)
    ox, oy, oz = o_planes
    dx, dy, dz = d_planes
    idx, idy, idz = _inv_dirs(dx, dy, dz)
    t0x, t1x = (lo[0] - ox) * idx, (hi[0] - ox) * idx
    t0y, t1y = (lo[1] - oy) * idy, (hi[1] - oy) * idy
    t0z, t1z = (lo[2] - oz) * idz, (hi[2] - oz) * idz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    miss = (tn > tf) | (tf < 0.0)
    return jnp.where(miss, 0.0, tf * 1.0001 + 1e-4)


def _stream_surface_kernel(
    idx_ref, cnt_ref, tmin_ref,  # scalar prefetch: [g, L] i32, [g] i32
    #                              (-1 = overflow), [g, L] f32
    clus_ref,  # [K, 8] cluster AABB rows in VMEM
    subs_ref,  # [K*SUB, 8] sub-block AABB rows in VMEM
    tri_hbm,  # [K*C/4, 128] packed rows in HBM (memory_space=ANY)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tcap_ref,
    t_out, tri_out, u_out, v_out,
    buf, sems,
):
    g = pl.program_id(0)
    n_enc = cnt_ref[g]
    overflow = n_enc < 0
    k_total = clus_ref.shape[0]
    lmax = idx_ref.shape[1] - 1
    n = jnp.where(overflow, k_total, n_enc)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_x, inv_y, inv_z = _inv_dirs(dx, dy, dz)

    def k_of(i):
        # overflow tiles walk every cluster in index order; normal
        # tiles walk their front-to-back sorted list. Clamped so the
        # pipelined prefetch of i+1 == n stays in range.
        kk = jnp.where(overflow, i, idx_ref[g, jnp.minimum(i, lmax)])
        # max(.., 0) guards the k_total == 0 corner: the unconditional
        # priming DMA would otherwise compute offset -1 (advisor r4)
        return jnp.maximum(jnp.minimum(kk, k_total - 1), 0)

    def dma(slot, i):
        k = k_of(i)
        return pltpu.make_async_copy(
            tri_hbm.at[
                pl.ds(k * (CLUSTER_TRIS // PACK), CLUSTER_TRIS // PACK)
            ],
            buf.at[slot],
            sems.at[slot],
        )

    def cond(carry):
        i, bt, _btri, _bu, _bv = carry
        # front-to-back BREAK: stop once the next cluster's entry lower
        # bound is past every lane's best hit (sorted lists only;
        # overflow tiles have no sorted bound and rely on the per-lane
        # pretest below)
        return (i < n) & (
            overflow | (tmin_ref[g, jnp.minimum(i, lmax)] <= jnp.max(bt))
        )

    def loop(carry):
        i, bt, btri, bu, bv = carry
        k = k_of(i)
        slot = jax.lax.rem(i, 2)

        # software pipeline: slot i%2 was filled by the previous
        # iteration (or the pre-loop start); kick off cluster i+1 into
        # the other slot BEFORE testing/intersecting cluster i, so the
        # next fetch rides under this iteration's compute
        dma(1 - slot, i + 1).start()

        # per-lane slab test against the CURRENT best-t: skipped
        # clusters cost one vector test (the prefetched rows simply go
        # unread — the stream is compute-bound, not bandwidth-bound;
        # bt starts at the scene-AABB exit, so miss lanes and tile
        # padding terminate with the geometry too)
        enter = _cluster_aabb_any(
            clus_ref[k], ox, oy, oz, inv_x, inv_y, inv_z, bt
        )
        first = k * CLUSTER_TRIS
        dma(slot, i).wait()

        def dense(c):
            # third hierarchy level: walk the cluster's SUB sub-blocks,
            # slab-testing each against the running best-t; the dense
            # Möller-Trumbore loop only runs over sub-blocks some lane
            # can still improve in
            def sub_walk(s, c2):
                enter_s = _cluster_aabb_any(
                    subs_ref[k * SUB + s],
                    ox, oy, oz, inv_x, inv_y, inv_z, c2[0],
                )

                def sub_dense(c3):
                    def body(j, c4):
                        bt2, btri2, bu2, bv2 = c4
                        packed = buf[slot, j]
                        for m in range(PACK):
                            row = [
                                packed[m * _REC + kk] for kk in range(9)
                            ]
                            t, u, v, _hit = _moller_trumbore(
                                row, ox, oy, oz, dx, dy, dz
                            )
                            better = t < bt2
                            bt2 = jnp.where(better, t, bt2)
                            btri2 = jnp.where(
                                better, first + j * PACK + m, btri2
                            )
                            bu2 = jnp.where(better, u, bu2)
                            bv2 = jnp.where(better, v, bv2)
                        return bt2, btri2, bu2, bv2

                    rps = CLUSTER_TRIS // PACK // SUB
                    return jax.lax.fori_loop(
                        s * rps, (s + 1) * rps, body, c3
                    )

                return jax.lax.cond(
                    enter_s, sub_dense, lambda c3: c3, c2
                )

            return jax.lax.fori_loop(0, SUB, sub_walk, c)

        bt, btri, bu, bv = jax.lax.cond(
            enter, dense, lambda c: c, (bt, btri, bu, bv)
        )
        return i + 1, bt, btri, bu, bv

    shape = (S_SUBLANES, LANES)
    dma(0, 0).start()  # prime the pipeline
    init = (
        0,
        tcap_ref[:],  # best-t starts at the scene-AABB exit distance
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    i_f, bt, btri, bu, bv = jax.lax.while_loop(cond, loop, init)
    # drain the one outstanding prefetch (started for cluster i_f by
    # the last iteration, or the pre-loop start when no iteration ran)
    dma(jax.lax.rem(i_f, 2), i_f).wait()

    t_out[:] = bt
    tri_out[:] = btri
    u_out[:] = bu
    v_out[:] = bv


def _stream_anyhit_kernel(
    idx_ref, cnt_ref, tmin_ref,
    clus_ref,
    subs_ref,
    tri_hbm,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    occ_out,
    buf, sems,
):
    shape = (S_SUBLANES, LANES)
    g = pl.program_id(0)
    n_enc = cnt_ref[g]
    overflow = n_enc < 0
    k_total = clus_ref.shape[0]
    lmax = idx_ref.shape[1] - 1
    n = jnp.where(overflow, k_total, n_enc)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]  # pre-clipped to the scene-AABB exit (wrapper)
    inv_x, inv_y, inv_z = _inv_dirs(dx, dy, dz)

    def k_of(i):
        kk = jnp.where(overflow, i, idx_ref[g, jnp.minimum(i, lmax)])
        # max(.., 0) guards the k_total == 0 corner: the unconditional
        # priming DMA would otherwise compute offset -1 (advisor r4)
        return jnp.maximum(jnp.minimum(kk, k_total - 1), 0)

    def dma(slot, i):
        k = k_of(i)
        return pltpu.make_async_copy(
            tri_hbm.at[
                pl.ds(k * (CLUSTER_TRIS // PACK), CLUSTER_TRIS // PACK)
            ],
            buf.at[slot],
            sems.at[slot],
        )

    def cond(carry):
        i, occ = carry
        live = jnp.where(occ > 0, 0.0, tmax)
        # stop when every lane is occluded/exhausted, or (sorted lists)
        # the next cluster starts past every live lane's range
        return (i < n) & (
            (overflow & jnp.any(live > 0.0))
            | (tmin_ref[g, jnp.minimum(i, lmax)] <= jnp.max(live))
        )

    def loop(carry):
        i, occ = carry
        k = k_of(i)
        slot = jax.lax.rem(i, 2)
        dma(1 - slot, i + 1).start()  # pipeline: prefetch next cluster
        live = jnp.where(occ > 0, 0.0, tmax)
        enter = _cluster_aabb_any(
            clus_ref[k], ox, oy, oz, inv_x, inv_y, inv_z, live
        )
        dma(slot, i).wait()

        def dense(occ_in):
            def sub_walk(s, o2):
                live2 = jnp.where(o2 > 0, 0.0, tmax)
                enter_s = _cluster_aabb_any(
                    subs_ref[k * SUB + s],
                    ox, oy, oz, inv_x, inv_y, inv_z, live2,
                )

                def sub_dense(o3):
                    def body(j, o_acc):
                        packed = buf[slot, j]
                        for m in range(PACK):
                            row = [
                                packed[m * _REC + kk] for kk in range(9)
                            ]
                            t, _u, _v, _hit = _moller_trumbore(
                                row, ox, oy, oz, dx, dy, dz
                            )
                            o_acc = o_acc | (t < tmax).astype(jnp.int32)
                        return o_acc

                    rps = CLUSTER_TRIS // PACK // SUB
                    return jax.lax.fori_loop(
                        s * rps, (s + 1) * rps, body, o3
                    )

                return jax.lax.cond(
                    enter_s, sub_dense, lambda o3: o3, o2
                )

            return jax.lax.fori_loop(0, SUB, sub_walk, occ_in)

        occ = jax.lax.cond(enter, dense, lambda oc: oc, occ)
        return i + 1, occ

    dma(0, 0).start()  # prime the pipeline
    i_f, occ = jax.lax.while_loop(
        cond, loop, (0, jnp.zeros(shape, jnp.int32))
    )
    dma(jax.lax.rem(i_f, 2), i_f).wait()  # drain outstanding prefetch

    occ_out[:] = occ


def _tile(o, d, extra=None):
    """Flattens rays to [g * S_SUBLANES, LANES] component planes.

    Tile padding REPLICATES the last real ray (not a zero ray): padded
    lanes then behave exactly like a real lane, so they can never hold
    the early-termination loop open (their results are dropped)."""
    batch = o.shape[:-1]
    r = 1
    for s in batch:
        r *= s
    of = o.reshape(r, 3)
    df = d.reshape(r, 3)
    pad = (-r) % S_TILE
    if pad:
        of = jnp.concatenate([of, jnp.broadcast_to(of[-1:], (pad, 3))])
        df = jnp.concatenate([df, jnp.broadcast_to(df[-1:], (pad, 3))])
    g = (r + pad) // S_TILE

    def plane(a):
        return a.reshape(g * S_SUBLANES, LANES)

    comps = [plane(of[:, i]) for i in range(3)] + [plane(df[:, i]) for i in range(3)]
    if extra is not None:
        e = extra.reshape(r)
        if pad:
            e = jnp.concatenate([e, jnp.broadcast_to(e[-1:], (pad,))])
        comps.append(plane(e))
    return batch, r, g, comps


def _blockify(batch):
    """For 2-D [H, W] ray batches: maps rays to BLOCK x BLOCK pixel
    blocks so each kernel tile sees a spatially tight ray frustum
    (row-major tiling would hand every tile a full-width strip whose
    direction fan defeats the cull). Pure layout transform — a pad +
    reshape + transpose, NOT a data-dependent sort. Returns
    (to_blocks, from_blocks, padded_count) or None for non-2D
    batches."""
    if len(batch) != 2:
        return None
    h, w = batch
    bh, bw = BLOCK_H, BLOCK_W
    ph, pw = (-h) % bh, (-w) % bw
    hp, wp = h + ph, w + pw

    def to_blocks(x):
        if ph or pw:
            pad = ((0, ph), (0, pw)) + ((0, 0),) * (x.ndim - 2)
            x = jnp.pad(x, pad, mode="edge")
        x = x.reshape(hp // bh, bh, wp // bw, bw, *x.shape[2:])
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape(hp * wp, *x.shape[4:])

    def from_blocks(flat):
        y = flat.reshape(hp // bh, wp // bw, bh, bw)
        y = jnp.swapaxes(y, 1, 2).reshape(hp, wp)
        return y[:h, :w]

    return to_blocks, from_blocks, hp * wp


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
    """HBM-streaming cluster-culled closest hit with front-to-back
    early termination. Scene size bounded by HBM, not VMEM. Find-only:
    returns {t, hit, u, v, tri}; resolve attributes with
    ops.hit.surface_at. ``sort_rays`` (default off — see
    _ray_sort_keys) groups rays by direction cone + origin cell before
    tiling; output order is unchanged."""
    batch = o.shape[:-1]
    blk = None if sort_rays else _blockify(batch)
    if sort_rays:
        perm, inv = _ray_sort_keys(clus_rows, o, d)
        o = jnp.take(o.reshape(-1, 3), perm, axis=0)
        d = jnp.take(d.reshape(-1, 3), perm, axis=0)
    if blk is not None:
        to_b, from_b, _rp = blk
        o = to_b(o)
        d = to_b(d)
    subs = sub_aabbs(clus_rows, geom_rows)
    geom_rows = pack4_rows(_pad_rows(clus_rows, geom_rows))
    _, r, g, comps = _tile(o, d)
    idx, counts, tmins = cull_lists(clus_rows, comps[0:3], comps[3:6], g)
    tcap = scene_tcap(clus_rows, comps[0:3], comps[3:6])

    shape = (g * S_SUBLANES, LANES)
    spec = pl.BlockSpec(
        (S_SUBLANES, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    f32 = jax.ShapeDtypeStruct(shape, jnp.float32)
    i32 = jax.ShapeDtypeStruct(shape, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cluster AABBs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sub-block AABBs
            pl.BlockSpec(memory_space=pl.ANY),  # triangle rows in HBM
        ]
        + [spec] * 7,
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
    )(idx, counts, tmins, clus_rows, subs, geom_rows, *comps, tcap)

    from .trace_kernels import _reshape_i32

    def restore(flat):
        if blk is not None:
            return from_b(flat)
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
    blk = None if sort_rays else _blockify(batch)
    if sort_rays:
        perm, inv = _ray_sort_keys(clus_rows, o, d)
        o = jnp.take(o.reshape(-1, 3), perm, axis=0)
        d = jnp.take(d.reshape(-1, 3), perm, axis=0)
        t_max = jnp.take(t_max.reshape(-1), perm)
    if blk is not None:
        to_b, from_b, _rp = blk
        o = to_b(o)
        d = to_b(d)
        t_max = to_b(t_max)
    subs = sub_aabbs(clus_rows, geom_rows)
    geom_rows = pack4_rows(_pad_rows(clus_rows, geom_rows))
    _, r, g, comps = _tile(o, d, extra=t_max.astype(jnp.float32))
    # clip unbounded shadow rays to the scene-AABB exit: no occluder
    # lies beyond it, and finite ranges both cull clusters and close
    # the early-termination loop
    tmax_plane = jnp.minimum(
        comps[6], scene_tcap(clus_rows, comps[0:3], comps[3:6])
    )
    comps = comps[:6] + [tmax_plane]
    idx, counts, tmins = cull_lists(
        clus_rows, comps[0:3], comps[3:6], g, tmax_plane=tmax_plane
    )

    shape = (g * S_SUBLANES, LANES)
    spec = pl.BlockSpec(
        (S_SUBLANES, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sub-block AABBs
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        + [spec] * 7,
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
    )(idx, counts, tmins, clus_rows, subs, geom_rows, *comps)
    flat = occ.reshape(-1)[:r]
    if blk is not None:
        return from_b(flat) > 0
    if sort_rays:
        flat = jnp.take(flat, inv)
    return (flat > 0).reshape(batch)
