"""Cluster-culled brute-force tracing — the large-scene hot path.

Design rationale (measured, xbench.py): on TPU the dense row-streaming
brute-force kernel (trace_kernels.py) beats per-node packet BVH
traversal (bvh_kernels.py) through ~16k triangles — regular VPU
compute outruns divergent tree walking far past the GPU-intuition
crossover. The TPU-native way to scale past that is NOT a deeper tree
walk but *coarser culling of the same dense loop*:

* the BVH's leaf ranges partition the reordered triangle array into
  contiguous, spatially coherent spans; merging consecutive leaves
  gives K = ceil(T / CLUSTER_TRIS) clusters, each a contiguous row
  range with an AABB;
* the kernel is ONE flat scalar loop over clusters (no stack, no
  recursion): tile-test the cluster AABB against the whole ray tile
  (vector op + any-reduce), and only when some lane can hit does the
  dense Möller-Trumbore row loop run over that cluster's rows;
* the AABB test uses the tile's *current best-t*, so clusters behind
  already-found hits are skipped as the loop progresses (front-to-back
  in BVH order ≈ spatial order).

Per ray tile the work is O(K + touched_tris) with brute-force
constants, instead of O(T) (brute) or O(union of node visits) (packet
BVH). Against the reference's per-thread stack traversal
(strolle-gpu/src/ray.rs:114-266) this trades per-ray early-exit
precision for perfectly regular vector work — the right trade on a
(8,128)-lane machine.

Attribute resolve mirrors trace_kernels._surface_closest_kernel: a
second cluster loop that only enters clusters actually holding some
lane's winning triangle and where-selects the winner's attributes —
zero XLA gathers.

Cluster extraction (clusterize_bvh) is pure jnp over the BvhArrays —
it runs inside the jitted stage programs (a few segment-reductions
over node arrays, microseconds) so no host-side plumbing or Scene
layout change is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace_kernels import LANES, _moller_trumbore

#: Rows per cluster. Small enough that one culled cluster saves real
#: work, big enough that the scalar AABB test amortizes (the dense loop
#: costs ~count row-iterations; the test costs ~1). Shared with the
#: streaming kernels, whose per-lane best-t pretest wants FINE
#: clusters (r4 sweep on the 262k soup at 16-sublane tiles:
#: 128 -> 244 ms, 256 -> 120 ms, 384 -> 130 ms, 512 -> 146 ms, old
#: 1024 -> ~990 ms with the round-3 kernel).
CLUSTER_TRIS = 256

#: Ray tile shape: SUBLANES x 128 rays traverse the cluster list
#: together. Matches trace_kernels.SUBLANES so both brute paths see the
#: same tiling.
C_SUBLANES = 64
C_TILE = C_SUBLANES * LANES

_BIG = 1e30


def num_clusters(num_tris: int) -> int:
    return -(-max(num_tris, 1) // CLUSTER_TRIS)


def clusterize_bvh(bvh, num_tris: int, positions=None) -> jnp.ndarray:
    """Geometry (in BVH order) -> [K, 8] rows: bmin(3) bmax(3) first count.

    Clusters are a UNIFORM partition: cluster k covers rows
    [k*CLUSTER_TRIS, (k+1)*CLUSTER_TRIS) — consecutive rows of the
    BVH-reordered triangle array are spatially coherent, which is all
    the AABB needs; leaf boundaries are irrelevant for correctness.
    Uniform ranges give the kernel a STATIC inner trip count, which is
    what lets Mosaic software-pipeline the dense row loop exactly like
    the brute-force kernel (a dynamic-bound loop costs ~2x per row).
    AABBs are one segment-reduction over the vertex array; shapes are
    static in T, so this traces cleanly inside the stage programs.

    ``positions``: [T, 3, 3] triangle vertices in BVH order; falls back
    to the union of the BVH's leaf boxes per uniform bin when omitted.
    """
    k = num_clusters(num_tris)

    if positions is not None:
        t = positions.shape[0]
        pad = k * CLUSTER_TRIS - t
        v = positions.reshape(t, 9)
        if pad:
            v = jnp.concatenate(
                [v, jnp.broadcast_to(v[-1:], (pad, 9))]
            )
        v = v.reshape(k, CLUSTER_TRIS, 3, 3)
        c_min = v.min(axis=(1, 2))
        c_max = v.max(axis=(1, 2))
    else:
        child = bvh.child.reshape(-1)  # [2N]
        lcount = bvh.child_count.reshape(-1)
        bmin = bvh.child_min.reshape(-1, 3)
        bmax = bvh.child_max.reshape(-1, 3)
        is_leaf = child < 0
        first = jnp.where(is_leaf, -(child + 1), 0)
        lcount = jnp.where(is_leaf, lcount, 0)
        # a leaf straddling a bin boundary contributes its box to both
        seg_a = jnp.where(is_leaf, first // CLUSTER_TRIS, k)
        seg_b = jnp.where(
            is_leaf,
            jnp.maximum(first + lcount - 1, first) // CLUSTER_TRIS,
            k,
        )
        masked_min = jnp.where(is_leaf[:, None], bmin, _BIG)
        masked_max = jnp.where(is_leaf[:, None], bmax, -_BIG)
        c_min = jnp.minimum(
            jax.ops.segment_min(masked_min, seg_a, num_segments=k + 1),
            jax.ops.segment_min(masked_min, seg_b, num_segments=k + 1),
        )[:k]
        c_max = jnp.maximum(
            jax.ops.segment_max(masked_max, seg_a, num_segments=k + 1),
            jax.ops.segment_max(masked_max, seg_b, num_segments=k + 1),
        )[:k]

    firsts = jnp.arange(k, dtype=jnp.int32) * CLUSTER_TRIS
    counts = jnp.minimum(num_tris - firsts, CLUSTER_TRIS)
    return jnp.concatenate(
        [
            c_min,
            c_max,
            firsts.astype(jnp.float32)[:, None],
            counts.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )


def _cluster_aabb_any(row, ox, oy, oz, idx, idy, idz, tmax):
    """Does ANY lane's ray enter this cluster's box before its current
    best t? (slab test, Tavian method — ray.rs:273-302 semantics)."""
    t0x = (row[0] - ox) * idx
    t1x = (row[3] - ox) * idx
    t0y = (row[1] - oy) * idy
    t1y = (row[4] - oy) * idy
    t0z = (row[2] - oz) * idz
    t1z = (row[5] - oz) * idz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    return jnp.any((tn <= tf) & (tf >= 0.0) & (tn <= tmax))


def _inv_dirs(dx, dy, dz):
    tiny = 1e-20
    idx = 1.0 / jnp.where(jnp.abs(dx) < tiny, jnp.where(dx >= 0, tiny, -tiny), dx)
    idy = 1.0 / jnp.where(jnp.abs(dy) < tiny, jnp.where(dy >= 0, tiny, -tiny), dy)
    idz = 1.0 / jnp.where(jnp.abs(dz) < tiny, jnp.where(dz >= 0, tiny, -tiny), dz)
    return idx, idy, idz


def _cluster_surface_kernel(
    clus_ref, tri_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_out, tri_out, n_x, n_y, n_z, uv_x, uv_y, mat_out,
    bt_ref, btri_ref, bu_ref, bv_ref,
):
    shape = (C_SUBLANES, LANES)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    idx, idy, idz = _inv_dirs(dx, dy, dz)
    n_clus = clus_ref.shape[0]

    bt_ref[:] = jnp.full(shape, jnp.inf, jnp.float32)
    btri_ref[:] = jnp.full(shape, -1, jnp.int32)
    bu_ref[:] = jnp.zeros(shape, jnp.float32)
    bv_ref[:] = jnp.zeros(shape, jnp.float32)

    # ---- pass 1: find the winning triangle, cluster-culled ------------
    def find_cluster(k, _):
        row = clus_ref[k]
        enter = _cluster_aabb_any(row, ox, oy, oz, idx, idy, idz, bt_ref[:])

        @pl.when(enter)
        def _():
            first = row[6].astype(jnp.int32)
            cnt = row[7].astype(jnp.int32)

            def body(j, _):
                t, u, v, _hit = _moller_trumbore(
                    tri_ref[first + j], ox, oy, oz, dx, dy, dz
                )
                better = (t < bt_ref[:]) & (j < cnt)
                bt_ref[:] = jnp.where(better, t, bt_ref[:])
                btri_ref[:] = jnp.where(better, first + j, btri_ref[:])
                bu_ref[:] = jnp.where(better, u, bu_ref[:])
                bv_ref[:] = jnp.where(better, v, bv_ref[:])
                return 0

            # static trip count (uniform clusters): Mosaic pipelines
            # this exactly like the brute kernel's row loop; the tail
            # cluster masks its padding via (j < cnt)
            jax.lax.fori_loop(0, CLUSTER_TRIS, body, 0)

        return 0

    jax.lax.fori_loop(0, n_clus, find_cluster, 0)

    bt, btri, bu, bv = bt_ref[:], btri_ref[:], bu_ref[:], bv_ref[:]

    # ---- pass 2: attribute resolve, only clusters holding winners -----
    # scratch refs reused as attribute accumulators (n, uv, mat, dsign
    # packed into the four f32 refs sequentially is messier than just
    # carrying them; the fori carries stay in registers)
    def attr_cluster(k, carry):
        row = clus_ref[k]
        firstf = row[6]
        cntf = row[7]
        in_range = (
            (btri >= firstf.astype(jnp.int32))
            & (btri < (firstf + cntf).astype(jnp.int32))
        )
        has = jnp.any(in_range)

        def inner(j, c):
            i = firstf.astype(jnp.int32) + j
            trow = tri_ref[i]
            sel = (btri == i) & (j < cntf.astype(jnp.int32))
            e1x, e1y, e1z = trow[3], trow[4], trow[5]
            e2x, e2y, e2z = trow[6], trow[7], trow[8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            vals = [
                trow[9], trow[10], trow[11],
                trow[12], trow[13], trow[14],
                trow[15], trow[16], trow[17],
                trow[18], trow[19],
                trow[20], trow[21],
                trow[22], trow[23],
                trow[24],
            ]
            out = [jnp.where(sel, v, p) for p, v in zip(c[:-1], vals)]
            out.append(
                jnp.where(sel, jnp.where(det >= 0.0, 1.0, -1.0), c[-1])
            )
            return tuple(out)

        return jax.lax.cond(
            has,
            lambda c: jax.lax.fori_loop(0, CLUSTER_TRIS, inner, c),
            lambda c: c,
            carry,
        )

    zero = jnp.zeros(shape, jnp.float32)
    attrs = jax.lax.fori_loop(
        0, n_clus, attr_cluster, tuple(zero for _ in range(17))
    )
    (
        n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
        u0x, u0y, u1x, u1y, u2x, u2y, mat, dsign,
    ) = attrs

    w = 1.0 - bu - bv
    nx = w * n0x + bu * n1x + bv * n2x
    ny = w * n0y + bu * n1y + bv * n2y
    nz = w * n0z + bu * n1z + bv * n2z
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    flip = dsign * inv_len
    t_out[:] = bt
    tri_out[:] = btri
    n_x[:] = nx * flip
    n_y[:] = ny * flip
    n_z[:] = nz * flip
    uv_x[:] = w * u0x + bu * u1x + bv * u2x
    uv_y[:] = w * u0y + bu * u1y + bv * u2y
    mat_out[:] = mat


def _cluster_anyhit_kernel(
    clus_ref, tri_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    occ_out,
    occ_ref,
):
    shape = (C_SUBLANES, LANES)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]
    idx, idy, idz = _inv_dirs(dx, dy, dz)
    n_clus = clus_ref.shape[0]

    occ_ref[:] = jnp.zeros(shape, jnp.int32)

    def cond(k):
        return (k < n_clus) & jnp.any((occ_ref[:] == 0) & (tmax > 0.0))

    def body(k):
        row = clus_ref[k]
        live = jnp.where((occ_ref[:] > 0) | (tmax <= 0.0), 0.0, tmax)
        enter = _cluster_aabb_any(row, ox, oy, oz, idx, idy, idz, live)

        @pl.when(enter)
        def _():
            first = row[6].astype(jnp.int32)
            cnt = row[7].astype(jnp.int32)

            def inner(j, _):
                t, _u, _v, _hit = _moller_trumbore(
                    tri_ref[first + j], ox, oy, oz, dx, dy, dz,
                )
                occ_ref[:] = occ_ref[:] | (
                    (t < tmax) & (j < cnt)
                ).astype(jnp.int32)
                return 0

            jax.lax.fori_loop(0, CLUSTER_TRIS, inner, 0)

        return k + 1

    jax.lax.while_loop(cond, body, 0)
    occ_out[:] = occ_ref[:]


def _tile(o, d, extra=None):
    batch = o.shape[:-1]
    r = 1
    for s in batch:
        r *= s
    of = o.reshape(r, 3)
    df = d.reshape(r, 3)
    pad = (-r) % C_TILE
    if pad:
        of = jnp.concatenate([of, jnp.zeros((pad, 3), of.dtype)])
        df = jnp.concatenate(
            [df, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], df.dtype), (pad, 1))]
        )
    g = (r + pad) // C_TILE

    def plane(a):
        return a.reshape(g * C_SUBLANES, LANES)

    comps = [plane(of[:, i]) for i in range(3)] + [plane(df[:, i]) for i in range(3)]
    if extra is not None:
        e = extra.reshape(r)
        if pad:
            e = jnp.concatenate([e, jnp.zeros((pad,), e.dtype)])
        comps.append(plane(e))
    return batch, r, g, comps


def _pad_geom(clus_rows, geom_rows):
    """Pads the [T',28] rows so the static CLUSTER_TRIS inner loop can
    read the tail cluster's full range (masked lanes see zero rows,
    which never hit: det == 0)."""
    need = clus_rows.shape[0] * CLUSTER_TRIS
    if geom_rows.shape[0] < need:
        geom_rows = jnp.concatenate(
            [
                geom_rows,
                jnp.zeros((need - geom_rows.shape[0], geom_rows.shape[1]),
                          geom_rows.dtype),
            ]
        )
    return geom_rows


@partial(jax.jit, static_argnames=("interpret",))
def cluster_trace_surface_pallas(clus_rows, geom_rows, o, d, interpret=False):
    """Cluster-culled closest hit + in-register attribute resolve.

    Returns dict: t, hit, normal [..,3], uv [..,2], mat_id, tri."""
    geom_rows = _pad_geom(clus_rows, geom_rows)
    batch, r, g, comps = _tile(o, d)
    shape = (g * C_SUBLANES, LANES)
    spec = pl.BlockSpec(
        (C_SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    f32 = jax.ShapeDtypeStruct(shape, jnp.float32)
    i32 = jax.ShapeDtypeStruct(shape, jnp.int32)
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [spec] * 6,
        out_specs=[spec] * 8,
        scratch_shapes=[
            pltpu.VMEM((C_SUBLANES, LANES), jnp.float32),  # bt
            pltpu.VMEM((C_SUBLANES, LANES), jnp.int32),  # btri
            pltpu.VMEM((C_SUBLANES, LANES), jnp.float32),  # bu
            pltpu.VMEM((C_SUBLANES, LANES), jnp.float32),  # bv
        ],
    )
    outs = pl.pallas_call(
        _cluster_surface_kernel,
        out_shape=(f32, i32, f32, f32, f32, f32, f32, f32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(clus_rows, geom_rows, *comps)
    t, tri, nx, ny, nz, ux, uy, mat = outs

    def unpack(a):
        return a.reshape(-1)[:r].reshape(batch)

    from .trace_kernels import _reshape_i32

    tri_i = _reshape_i32(tri, r, batch)
    hit_b = tri_i >= 0
    return {
        "t": unpack(t),
        "hit": hit_b,
        "normal": jnp.stack([unpack(nx), unpack(ny), unpack(nz)], axis=-1),
        "uv": jnp.stack([unpack(ux), unpack(uy)], axis=-1),
        "mat_id": unpack(mat).astype(jnp.int32),
        "tri": jnp.where(hit_b, tri_i, -1),
    }


@partial(jax.jit, static_argnames=("interpret",))
def cluster_trace_anyhit_pallas(
    clus_rows, geom_rows, o, d, t_max, interpret=False
):
    geom_rows = _pad_geom(clus_rows, geom_rows)
    t_max = jnp.broadcast_to(t_max, o.shape[:-1])
    batch, r, g, comps = _tile(o, d, extra=t_max.astype(jnp.float32))
    shape = (g * C_SUBLANES, LANES)
    spec = pl.BlockSpec(
        (C_SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 + [spec] * 7,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((C_SUBLANES, LANES), jnp.int32)],
    )
    occ = pl.pallas_call(
        _cluster_anyhit_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(clus_rows, geom_rows, *comps)
    return (occ.reshape(-1)[:r] > 0).reshape(batch)
