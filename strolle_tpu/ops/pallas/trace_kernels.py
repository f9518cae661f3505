"""Pallas TPU kernels for ray tracing.

Design (SURVEY.md §7.3): rays are processed in tiles of 8x128 lanes
(one VPU register shape) with triangle/BVH data resident in VMEM.
Triangle intersection is *packet* style: one triangle (or BVH node) is
broadcast from VMEM per step and tested against all 1024 rays of the
tile with dense VPU ops — there are no per-lane gathers anywhere, which
is what makes this layout fast on a vector machine.

Two kernels:
* brute-force closest-hit / any-hit over all triangles — optimal for
  small scenes (the reference's Cornell-class content) where streaming
  every triangle through registers beats divergent traversal;
* packet BVH traversal (bvh_kernels.py) for large scenes.

Triangles are pre-packed as [T, 12] rows: v0(3), e1(3), e2(3), pad —
the Möller-Trumbore precomputation done once on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
#: Rays per tile = SUBLANES x 128. Large tiles amortize the per-triangle
#: scalar row loads over more rays (the loop body is load-latency-bound).
SUBLANES = 128
TILE = LANES * SUBLANES

_F32_EPS = 1.1920929e-07


def pack_triangles(positions: jnp.ndarray) -> jnp.ndarray:
    """[T, 3, 3] vertices -> [T, 12] (v0, e1, e2, pad) rows."""
    v0 = positions[:, 0]
    e1 = positions[:, 1] - v0
    e2 = positions[:, 2] - v0
    pad = jnp.zeros((positions.shape[0], 3), positions.dtype)
    return jnp.concatenate([v0, e1, e2, pad], axis=-1)


def pack_geometry(geom) -> jnp.ndarray:
    """Geometry -> [T, 28] rows for the surface kernel:
    v0(3) e1(3) e2(3) n0(3) n1(3) n2(3) uv0(2) uv1(2) uv2(2) mat(1) pad(3).

    Attributes ride next to the intersection data so the kernel can
    resolve the winning triangle's shading attributes in-register —
    XLA-side gathers of geometry arrays are the single slowest
    operation on this toolchain (see ops/gather.py docstring).
    """
    p = geom.positions
    v0 = p[:, 0]
    rows = [
        v0,
        p[:, 1] - v0,
        p[:, 2] - v0,
        geom.normals[:, 0],
        geom.normals[:, 1],
        geom.normals[:, 2],
        geom.uvs[:, 0],
        geom.uvs[:, 1],
        geom.uvs[:, 2],
        geom.material_id.astype(jnp.float32)[:, None],
        jnp.zeros((p.shape[0], 3), jnp.float32),
    ]
    return jnp.concatenate(rows, axis=-1)


def _moller_trumbore(tri_row, ox, oy, oz, dx, dy, dz):
    """One packed triangle row against a full ray tile. Returns
    (t, u, v, hit_mask) with t = +inf on miss."""
    v0x, v0y, v0z = tri_row[0], tri_row[1], tri_row[2]
    e1x, e1y, e1z = tri_row[3], tri_row[4], tri_row[5]
    e2x, e2y, e2z = tri_row[6], tri_row[7], tri_row[8]

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) < _F32_EPS, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))

    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det

    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    hit = (
        (jnp.abs(det) >= _F32_EPS)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return jnp.where(hit, t, jnp.inf), u, v, hit


def _brute_closest_kernel(
    tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, tri_out_ref, u_ref, v_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    n_tris = tri_ref.shape[0]

    def body(i, carry):
        bt, btri, bu, bv = carry
        row = tri_ref[i]
        t, u, v, _ = _moller_trumbore(row, ox, oy, oz, dx, dy, dz)
        better = t < bt
        return (
            jnp.where(better, t, bt),
            jnp.where(better, i, btri),
            jnp.where(better, u, bu),
            jnp.where(better, v, bv),
        )

    init = (
        jnp.full((SUBLANES, LANES), jnp.inf, jnp.float32),
        jnp.full((SUBLANES, LANES), -1, jnp.int32),
        jnp.zeros((SUBLANES, LANES), jnp.float32),
        jnp.zeros((SUBLANES, LANES), jnp.float32),
    )
    bt, btri, bu, bv = jax.lax.fori_loop(0, n_tris, body, init)
    t_ref[:] = bt
    tri_out_ref[:] = btri
    u_ref[:] = bu
    v_ref[:] = bv


def _surface_closest_kernel(
    tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, tri_out_ref, u_ref, v_ref,
    nx_ref, ny_ref, nz_ref, uvx_ref, uvy_ref, mat_ref,
):
    """Closest hit + in-register surface attribute resolve.

    Loop 1 finds the winning triangle (4 carries). Loop 2 re-walks the
    triangle rows and where-selects the winner's vertex normals, uvs,
    material id, and determinant sign, then interpolates — zero gathers
    reach XLA.
    """
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    n_tris = tri_ref.shape[0]

    def find_body(i, carry):
        bt, btri, bu, bv = carry
        t, u, v, _ = _moller_trumbore(tri_ref[i], ox, oy, oz, dx, dy, dz)
        better = t < bt
        return (
            jnp.where(better, t, bt),
            jnp.where(better, i, btri),
            jnp.where(better, u, bu),
            jnp.where(better, v, bv),
        )

    zero = jnp.zeros((SUBLANES, LANES), jnp.float32)
    bt, btri, bu, bv = jax.lax.fori_loop(
        0,
        n_tris,
        find_body,
        (zero + jnp.inf, jnp.full((SUBLANES, LANES), -1, jnp.int32), zero, zero),
    )

    def attr_body(i, carry):
        row = tri_ref[i]
        sel = btri == i
        # det sign for the normal flip (copysign(1, inv_det))
        e1x, e1y, e1z = row[3], row[4], row[5]
        e2x, e2y, e2z = row[6], row[7], row[8]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        out = []
        vals = [
            row[9], row[10], row[11],  # n0
            row[12], row[13], row[14],  # n1
            row[15], row[16], row[17],  # n2
            row[18], row[19],  # uv0
            row[20], row[21],  # uv1
            row[22], row[23],  # uv2
            row[24],  # material id
        ]
        for prev, val in zip(carry[:-1], vals):
            out.append(jnp.where(sel, val, prev))
        out.append(jnp.where(sel, jnp.where(det >= 0.0, 1.0, -1.0), carry[-1]))
        return tuple(out)

    init_attrs = tuple(zero for _ in range(17))
    attrs = jax.lax.fori_loop(0, n_tris, attr_body, init_attrs)
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
    t_ref[:] = bt
    tri_out_ref[:] = btri
    u_ref[:] = bu
    v_ref[:] = bv
    nx_ref[:] = nx * flip
    ny_ref[:] = ny * flip
    nz_ref[:] = nz * flip
    uvx_ref[:] = w * u0x + bu * u1x + bv * u2x
    uvy_ref[:] = w * u0y + bu * u1y + bv * u2y
    mat_ref[:] = mat


def _brute_anyhit_kernel(
    tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    occ_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]
    n_tris = tri_ref.shape[0]

    def body(i, occ):
        t, _, _, _ = _moller_trumbore(tri_ref[i], ox, oy, oz, dx, dy, dz)
        # int32 carry: a bool (i1) loop carry fails Mosaic legalization
        return occ | (t < tmax).astype(jnp.int32)

    occ = jax.lax.fori_loop(
        0, n_tris, body, jnp.zeros((SUBLANES, LANES), jnp.int32)
    )
    occ_ref[:] = occ


def _tile_rays(o, d, extra=None):
    """Flatten + pad rays to [G, 8, 128] per-component planes."""
    batch = o.shape[:-1]
    r = 1
    for s in batch:
        r *= s
    of = o.reshape(r, 3)
    df = d.reshape(r, 3)
    pad = (-r) % TILE
    if pad:
        of = jnp.concatenate([of, jnp.zeros((pad, 3), of.dtype)])
        df = jnp.concatenate(
            [df, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], df.dtype), (pad, 1))]
        )
    g = (r + pad) // TILE

    def plane(a):
        return a.reshape(g * SUBLANES, LANES)

    comps = [plane(of[:, i]) for i in range(3)] + [
        plane(df[:, i]) for i in range(3)
    ]
    if extra is not None:
        e = extra.reshape(r)
        if pad:
            e = jnp.concatenate([e, jnp.zeros((pad,), e.dtype)])
        comps.append(plane(e))
    return batch, r, g, comps


@partial(jax.jit, static_argnames=("interpret",))
def trace_closest_brute_pallas(tri_rows, o, d, interpret=False):
    """Closest hit via the Pallas brute-force kernel.

    tri_rows: [T, 12] from pack_triangles (T padded to a multiple of 8
    with degenerate rows). Returns (t, tri, u, v) over o's batch shape.
    """
    batch, r, g, comps = _tile_rays(o, d)

    ray_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 6,
        out_specs=out_specs,
    )
    shape = (g * SUBLANES, LANES)
    t, tri, u, v = pl.pallas_call(
        _brute_closest_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tri_rows, *comps)

    def unpack(a):
        return a.reshape(-1)[:r].reshape(batch)

    return unpack(t), unpack(tri), unpack(u), unpack(v)


def _reshape_i32(a, r, batch):
    """s32 relayout-through-reshape is pathologically slow on this
    toolchain; bitcast to f32 for the reshape and back."""
    f = jax.lax.bitcast_convert_type(a, jnp.float32)
    f = f.reshape(-1)[:r].reshape(batch)
    return jax.lax.bitcast_convert_type(f, jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def trace_surface_pallas(geom_rows, o, d, interpret=False):
    """Closest hit with in-kernel surface attribute resolve.

    geom_rows: [T, 28] from pack_geometry (T padded to a multiple of 8).
    Returns a dict of per-ray planes over o's batch shape:
    t, tri, u, v, normal [.., 3], uv [.., 2], mat_id.
    """
    batch, r, g, comps = _tile_rays(o, d)

    ray_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 6,
        out_specs=[out_spec] * 10,
    )
    shape = (g * SUBLANES, LANES)
    f32 = jax.ShapeDtypeStruct(shape, jnp.float32)
    outs = pl.pallas_call(
        _surface_closest_kernel,
        out_shape=(
            f32, jax.ShapeDtypeStruct(shape, jnp.int32), f32, f32,
            f32, f32, f32, f32, f32, f32,
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(geom_rows, *comps)
    t, tri, u, v, nx, ny, nz, uvx, uvy, mat = outs

    def unpack(a):
        return a.reshape(-1)[:r].reshape(batch)

    return {
        "t": unpack(t),
        "tri": _reshape_i32(tri, r, batch),
        "u": unpack(u),
        "v": unpack(v),
        "normal": jnp.stack(
            [unpack(nx), unpack(ny), unpack(nz)], axis=-1
        ),
        "uv": jnp.stack([unpack(uvx), unpack(uvy)], axis=-1),
        "mat_id": unpack(mat).astype(jnp.int32),
    }


@partial(jax.jit, static_argnames=("interpret",))
def trace_anyhit_brute_pallas(tri_rows, o, d, t_max, interpret=False):
    """Occlusion query via the Pallas brute-force kernel."""
    t_max = jnp.broadcast_to(t_max, o.shape[:-1])
    batch, r, g, comps = _tile_rays(o, d, extra=t_max.astype(jnp.float32))

    ray_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=pl.BlockSpec(
            (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    shape = (g * SUBLANES, LANES)
    occ = pl.pallas_call(
        _brute_anyhit_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tri_rows, *comps)
    return (occ.reshape(-1)[:r] > 0).reshape(batch)
