"""Reference-mode megakernel: the whole path-tracing bounce loop fused
into ONE Pallas kernel.

The staged formulation (trace kernel -> XLA shading -> trace kernel ...)
spends more than half its frame time on XLA elementwise glue between
kernels: every intermediate [H, W] plane round-trips HBM. Here the full
ref_shading.rs loop — closest hit, material resolve, NEE with a
uniformly-picked light + sphere-sampled shadow ray (any-hit), and the
layered-BRDF continuation (ref_shading.rs:95-176) — runs per ray tile
entirely in VMEM/registers. Rays are (SUBLANES, LANES) planes; triangles,
materials, and lights are broadcast from VMEM rows, so there are no
per-lane gathers anywhere.

RNG is the reference's PCG white noise (noise/white.rs:35-42) stepped
in exactly the same order as models/reference.sample_pixels, so the
megakernel converges to the same estimates as the jnp oracle path.
Gradients do not flow through it (callers stop_gradient + fall back to
the jnp path for differentiation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace_kernels import LANES, SUBLANES, TILE, _tile_rays

_F32_EPS = 1.1920929e-07
NUDGE = 0.01
MIN_ROUGHNESS = 0.089 * 0.089
RANGE_UNLIMITED = 1e30
LIGHT_POINT = 1


def pack_materials(materials) -> jnp.ndarray:
    """[M, 12] rows: base_color(4) emissive(3) metallic roughness
    reflectance pad(2)."""
    m = materials
    return jnp.concatenate(
        [
            m.base_color,
            m.emissive[..., :3],
            m.metallic[:, None],
            m.roughness[:, None],
            m.reflectance[:, None],
            jnp.zeros((m.num_materials, 2), jnp.float32),
        ],
        axis=-1,
    )


def pack_lights(lights) -> jnp.ndarray:
    """[L, 13] rows: pos(3) radius color(3) range kind spot_dir(3)
    spot_angle (matches ops/lights._light_table)."""
    cols = [
        lights.pos,
        lights.radius[:, None],
        lights.color,
        lights.range[:, None],
        lights.kind.astype(jnp.float32)[:, None],
        lights.spot_dir,
        lights.spot_angle[:, None],
    ]
    return jnp.minimum(jnp.concatenate(cols, axis=-1), RANGE_UNLIMITED)


# --- plane-vector helpers (each component is a (SUBLANES, LANES) array) ---


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _onb(nx, ny, nz):
    """Pixar orthonormal basis (ops/math.any_orthonormal_pair)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tx = 1.0 + sign * nx * nx * a
    ty = sign * b
    tz = -sign * nx
    bx = b
    by = sign + ny * ny * a
    bz = -ny
    return (tx, ty, tz), (bx, by, bz)


# --- PCG white noise on u32 planes (noise/white.rs:35-42) -----------------


def _next_u32(state):
    state = state * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = (
        (state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state
    ) * jnp.uint32(277803737)
    return state, (word >> jnp.uint32(22)) ^ word


def _u16_to_f32(x):
    """u32 (< 2^16) -> f32. Mosaic has no u32->f32 cast; bitcast to i32
    (free, value < 2^31 so sign is clean) and use the i32->f32 path."""
    return jax.lax.bitcast_convert_type(x, jnp.int32).astype(jnp.float32)


def _next_f32(state):
    state, word = _next_u32(state)
    hi = _u16_to_f32(word >> jnp.uint32(16))
    lo = _u16_to_f32(word & jnp.uint32(0xFFFF))
    return state, (hi * 65536.0 + lo) / 4294967295.0


def _mod_u32(word, count_f):
    """Exact word % count for small count, via 16-bit split (u32 mod is
    not natively lowered; all intermediates stay < 2^24 so f32 is exact)."""
    hi = _u16_to_f32(word >> jnp.uint32(16))
    lo = _u16_to_f32(word & jnp.uint32(0xFFFF))
    m1 = hi - jnp.floor(hi / count_f) * count_f
    c = 65536.0 - jnp.floor(65536.0 / count_f) * count_f
    x = m1 * c + lo
    return x - jnp.floor(x / count_f) * count_f  # f32 integer in [0, count)


def pack_geometry_bw(geom) -> jnp.ndarray:
    """Geometry -> [T, 24] Baldwin-Weber rows for the megakernel:
    n(3) d0 T1(3) d1 T2(3) d2 n0(3) n1(3) n2(3) mat pad(2).

    Precomputing the barycentric transform planes (Baldwin & Weber,
    "Fast Ray-Triangle Intersections by Coordinate Transformation")
    drops the per-ray cross products of Möller-Trumbore: the inner loop
    becomes three plane evaluations (~25% fewer VPU ops). n is the
    UNnormalized geometric normal e1 x e2, so sign(n . d) carries the
    same orientation information as Möller-Trumbore's determinant
    (det = -n . d), which triangle.rs:64-113 uses for the normal flip.
    """
    p = geom.positions
    a, b, c = p[:, 0], p[:, 1], p[:, 2]
    e1 = b - a
    e2 = c - a
    n = jnp.cross(e1, e2)
    denom = jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), 1e-30)
    t1 = jnp.cross(e2, n) / denom
    t2 = jnp.cross(n, e1) / denom
    rows = [
        n,
        jnp.sum(n * a, axis=-1, keepdims=True),  # d0
        t1,
        -jnp.sum(t1 * a, axis=-1, keepdims=True),  # d1
        t2,
        -jnp.sum(t2 * a, axis=-1, keepdims=True),  # d2
        geom.normals[:, 0],
        geom.normals[:, 1],
        geom.normals[:, 2],
        geom.material_id.astype(jnp.float32)[:, None],
        jnp.zeros((p.shape[0], 2), jnp.float32),
    ]
    return jnp.concatenate(rows, axis=-1)


def _bw_isect(row, ox, oy, oz, dx, dy, dz):
    """One Baldwin-Weber row against a ray tile. Returns
    (t, u, v, nd) with t = +inf on miss; MT's det == -nd."""
    nx_, ny_, nz_ = row[0], row[1], row[2]
    nd = nx_ * dx + ny_ * dy + nz_ * dz
    no = nx_ * ox + ny_ * oy + nz_ * oz
    miss_plane = jnp.abs(nd) < _F32_EPS
    t = (row[3] - no) / jnp.where(miss_plane, 1.0, nd)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    u = row[4] * px + row[5] * py + row[6] * pz + row[7]
    v = row[8] * px + row[9] * py + row[10] * pz + row[11]
    hit = (
        jnp.logical_not(miss_plane)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return jnp.where(hit, t, jnp.inf), u, v, nd


# --- BRDF pieces (ops/brdf.py in plane form) ------------------------------


def _ggx_distribution(n_dot_h, a):
    a2 = a * a
    dd = (n_dot_h * a2 - n_dot_h) * n_dot_h + 1.0
    return a2 / (jnp.pi * dd * dd)


def _specular_eval(
    bc_r, bc_g, bc_b, metallic, roughness, reflectance,
    nx, ny, nz, lx, ly, lz, vx, vy, vz,
):
    a = jnp.clip(roughness, MIN_ROUGHNESS, 1.0)
    hx, hy, hz = _normalize3(lx + vx, ly + vy, lz + vz)
    n_dot_l = _saturate(_dot3(nx, ny, nz, lx, ly, lz))
    n_dot_h = _saturate(_dot3(nx, ny, nz, hx, hy, hz))
    l_dot_h = _saturate(_dot3(lx, ly, lz, hx, hy, hz))
    n_dot_v = _saturate(_dot3(nx, ny, nz, vx, vy, vz))

    d = _ggx_distribution(n_dot_h, a)
    k = a * a / 2.0
    g = (n_dot_v / (n_dot_v * (1.0 - k) + k)) * (
        n_dot_l / (n_dot_l * (1.0 - k) + k)
    )
    f0_base = 0.16 * reflectance * reflectance * (1.0 - metallic)
    f0r = f0_base + bc_r * metallic
    f0g = f0_base + bc_g * metallic
    f0b = f0_base + bc_b * metallic
    f90 = _saturate((f0r + f0g + f0b) * (50.0 * 0.33))
    x = jnp.maximum(1.0 - l_dot_h, 0.001)
    x2 = x * x
    p = x2 * x2 * x
    fr = f0r + (f90 - f0r) * p
    fg = f0g + (f90 - f0g) * p
    fb = f0b + (f90 - f0b) * p

    scale = d * g / jnp.maximum(4.0 * n_dot_l * n_dot_v, 1e-8)
    ok = (metallic > 0.0) & (n_dot_l > 0.0) & (n_dot_v > 0.0)
    zero = jnp.zeros_like(scale)
    return (
        jnp.where(ok, scale * fr, zero),
        jnp.where(ok, scale * fg, zero),
        jnp.where(ok, scale * fb, zero),
    )


#: Inner-loop unroll factor: the per-iteration scalar row load +
#: broadcast has latency Mosaic can only hide across independent
#: iterations; 8-wide unrolling measured ~22% faster than 1-wide on
#: Cornell (the selects chain, but the intersection math pipelines);
#: full unroll regresses (I-cache / scheduling pressure).
UNROLL = 8


def _unrolled_fori(n: int, body, init):
    """fori_loop unrolled UNROLL-wide with a peeled remainder."""
    k = UNROLL
    if n < 2 * k:
        return jax.lax.fori_loop(0, n, body, init)

    def wide(i, carry):
        for j in range(k):
            carry = body(k * i + j, carry)
        return carry

    carry = jax.lax.fori_loop(0, n // k, wide, init)
    for r in range(n - n % k, n):
        carry = body(r, carry)
    return carry


def _ref_megakernel_body(depth: int, flat: bool = False, no_metal: bool = False):
    """Kernel body, specialized per scene shape (shader permutations):
    ``flat`` — all triangles have identical unit vertex normals, so the
    find loop carries 3 normal planes instead of 9 and skips barycentric
    interpolation; ``no_metal`` — no referenced material has
    metallic > 0, so the GGX specular lobe (NEE representative-point
    eval + NDF continuation sampling) drops out entirely. RNG draws are
    kept in both variants so the PCG stream matches the jnp oracle."""
    def kernel(
        lcount_ref,  # SMEM (1, 1) i32
        tri_ref,  # [T, 24] Baldwin-Weber rows (pack_geometry_bw)
        mat_ref,  # [M, 12] material rows
        light_ref,  # [L, 13] light rows
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # ray planes
        st_ref,  # u32 state plane
        r_ref, g_ref, b_ref,  # output color planes
    ):
        n_tris = tri_ref.shape[0]
        n_mats = mat_ref.shape[0]
        n_lights = light_ref.shape[0]

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        state = st_ref[:]

        shape = ox.shape
        zero = jnp.zeros(shape, jnp.float32)
        col_r, col_g, col_b = zero, zero, zero
        thr_r = jnp.ones(shape, jnp.float32)
        thr_g = jnp.ones(shape, jnp.float32)
        thr_b = jnp.ones(shape, jnp.float32)
        alive = jnp.ones(shape, jnp.int32)

        lcount = lcount_ref[0, 0]
        lcount_f = jnp.maximum(lcount, 1).astype(jnp.float32)
        has_lights = (lcount > 0).astype(jnp.int32)

        for bounce in range(depth + 1):
            # --- closest hit + attribute resolve (one fused loop) -------
            if flat:
                # n0 rows are the unit geometric normal; no barycentric
                # interpolation, and u/v are not needed downstream.
                def find_body(i, carry):
                    bt, nx, ny, nz, mat, dsign = carry
                    row = tri_ref[i]
                    t, _, _, nd = _bw_isect(row, ox, oy, oz, dx, dy, dz)
                    better = t < bt
                    sel = lambda a_new, a_old: jnp.where(better, a_new, a_old)
                    return (
                        sel(t, bt),
                        sel(row[12], nx), sel(row[13], ny), sel(row[14], nz),
                        sel(row[21], mat),
                        # MT det = -nd, flip = copysign(1, det)
                        sel(jnp.where(nd <= 0.0, 1.0, -1.0), dsign),
                    )

                bt, nx, ny, nz, mat, dsign = _unrolled_fori(
                    n_tris, find_body,
                    (zero + jnp.inf, zero, zero, zero, zero, zero),
                )
                nx, ny, nz = nx * dsign, ny * dsign, nz * dsign
            else:
                def find_body(i, carry):
                    (bt, bu, bv, n0x, n0y, n0z, n1x, n1y, n1z,
                     n2x, n2y, n2z, mat, dsign) = carry
                    row = tri_ref[i]
                    t, u, v, nd = _bw_isect(row, ox, oy, oz, dx, dy, dz)
                    better = t < bt
                    sel = lambda a_new, a_old: jnp.where(better, a_new, a_old)
                    return (
                        sel(t, bt), sel(u, bu), sel(v, bv),
                        sel(row[12], n0x), sel(row[13], n0y), sel(row[14], n0z),
                        sel(row[15], n1x), sel(row[16], n1y), sel(row[17], n1z),
                        sel(row[18], n2x), sel(row[19], n2y), sel(row[20], n2z),
                        sel(row[21], mat),
                        # MT det = -nd, flip = copysign(1, det)
                        sel(jnp.where(nd <= 0.0, 1.0, -1.0), dsign),
                    )

                init = (zero + jnp.inf, zero, zero) + tuple(
                    zero for _ in range(10)
                ) + (zero,)
                (bt, bu, bv, n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
                 mat, dsign) = _unrolled_fori(n_tris, find_body, init)

                w = 1.0 - bu - bv
                nx = w * n0x + bu * n1x + bv * n2x
                ny = w * n0y + bu * n1y + bv * n2y
                nz = w * n0z + bu * n1z + bv * n2z
                nx, ny, nz = _normalize3(nx, ny, nz)
                nx, ny, nz = nx * dsign, ny * dsign, nz * dsign

            is_some = jnp.isfinite(bt).astype(jnp.int32)
            alive = alive & is_some

            bts = jnp.where(is_some > 0, bt, 0.0)
            px = ox + dx * bts + nx * NUDGE
            py = oy + dy * bts + ny * NUDGE
            pz = oz + dz * bts + nz * NUDGE

            # --- material resolve (loop over rows, select) --------------
            mat_cols = [0, 1, 2, 4, 5, 6] if no_metal else [
                0, 1, 2, 4, 5, 6, 7, 8, 9
            ]

            def mat_body(i, carry):
                row = mat_ref[i]
                sel = mat == i.astype(jnp.float32)
                return tuple(
                    jnp.where(sel, row[c], prev)
                    for prev, c in zip(carry, mat_cols)
                )

            mat_vals = jax.lax.fori_loop(
                0, n_mats, mat_body, tuple(zero for _ in mat_cols)
            )
            if no_metal:
                bc_r, bc_g, bc_b, em_r, em_g, em_b = mat_vals
                metallic = zero
                roughness = jnp.ones(shape, jnp.float32)
                reflectance = zero
            else:
                (bc_r, bc_g, bc_b, em_r, em_g, em_b, metallic, roughness,
                 reflectance) = mat_vals
            if bounce > 0 and not no_metal:
                roughness = jnp.maximum(roughness, 0.75 * 0.75)

            alive_f = (alive > 0).astype(jnp.float32)
            col_r = col_r + alive_f * thr_r * em_r
            col_g = col_g + alive_f * thr_g * em_g
            col_b = col_b + alive_f * thr_b * em_b

            # --- NEE: pick 1 light uniformly (ref_shading.rs:135-154) ---
            state, word = _next_u32(state)
            lid = _mod_u32(word, lcount_f)

            def light_body(i, carry):
                row = light_ref[i]
                sel = lid == i.astype(jnp.float32)
                out = []
                for prev, val in zip(
                    carry,
                    [row[0], row[1], row[2], row[3], row[4], row[5],
                     row[6], row[7], row[8], row[9], row[10], row[11],
                     row[12]],
                ):
                    out.append(jnp.where(sel, val, prev))
                return tuple(out)

            (lpx, lpy, lpz, lrad, lcr, lcg, lcb, lrange, lkind,
             sdx, sdy, sdz, sangle) = jax.lax.fori_loop(
                0, n_lights, light_body, tuple(zero for _ in range(13))
            )

            # sphere-sampled shadow ray origin (light.rs:209-215)
            state, u0 = _next_f32(state)
            state, u1 = _next_f32(state)
            state, u2 = _next_f32(state)
            phi = u0 * (2.0 * jnp.pi)
            cos_t = jnp.clip(u1 * 2.0 - 1.0, -1.0, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
            rr = jnp.sqrt(u2)
            sphx = rr * sin_t * jnp.cos(phi)
            sphy = rr * sin_t * jnp.sin(phi)
            sphz = rr * cos_t
            sox = lpx + lrad * sphx
            soy = lpy + lrad * sphy
            soz = lpz + lrad * sphz
            thx, thy, thz = px - sox, py - soy, pz - soz
            slen = jnp.sqrt(
                jnp.maximum(thx * thx + thy * thy + thz * thz, 1e-20)
            )
            sdx_r, sdy_r, sdz_r = thx / slen, thy / slen, thz / slen

            def any_body(i, occ):
                t, _, _, _ = _bw_isect(
                    tri_ref[i], sox, soy, soz, sdx_r, sdy_r, sdz_r
                )
                return occ | (t < slen).astype(jnp.int32)

            occ = _unrolled_fori(
                n_tris, any_body, jnp.zeros(shape, jnp.int32)
            )

            # Light::radiance (light.rs:143-207)
            lvx, lvy, lvz = lpx - px, lpy - py, lpz - pz
            tpx, tpy, tpz = _normalize3(-lvx, -lvy, -lvz)
            sdnx, sdny, sdnz = _normalize3(sdx, sdy, sdz)
            cosang = jnp.clip(_dot3(sdnx, sdny, sdnz, tpx, tpy, tpz), -1.0, 1.0)
            # acos polynomial (Mosaic has no acos; max abs err ~1e-4 on
            # the spot cone, used only by spot lights): acos(x) ~=
            # sqrt(1-|x|)*(c0 + c1|x| + c2 x^2 + c3 |x|^3), reflected.
            ax = jnp.abs(cosang)
            poly = 1.5707288 + ax * (-0.2121144 + ax * (0.074261 - 0.0187293 * ax))
            acos_pos = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * poly
            angle = jnp.where(cosang >= 0.0, acos_pos, jnp.pi - acos_pos)
            q = angle / jnp.maximum(sangle, 1e-6)
            spot_f = _saturate(1.0 - q * q * q)
            f_angle = jnp.where(lkind == float(LIGHT_POINT), 1.0, spot_f)

            l2 = lvx * lvx + lvy * lvy + lvz * lvz
            inv_r2 = 1.0 / jnp.maximum(lrange * lrange, 1e-12)
            factor = l2 * inv_r2
            smooth = _saturate(1.0 - factor * factor)
            atten = smooth * smooth / jnp.maximum(l2, 1e-4)
            f_dist = jnp.where(lrange >= RANGE_UNLIMITED, 1.0, atten)

            lnx, lny, lnz = _normalize3(lvx, lvy, lvz)
            f_cos = _saturate(_dot3(nx, ny, nz, lnx, lny, lnz))

            diff_k = (1.0 - metallic) / jnp.pi
            dbr, dbg, dbb = bc_r * diff_k, bc_g * diff_k, bc_b * diff_k

            vx, vy, vz = -dx, -dy, -dz
            if no_metal:
                # _specular_eval gates on metallic > 0 (brdf.rs:125-139)
                sbr = sbg = sbb = zero
            else:
                # representative-point sphere specular (light.rs:170-201)
                ndv2 = _dot3(-vx, -vy, -vz, nx, ny, nz)
                rx = -vx - 2.0 * ndv2 * nx
                ry = -vy - 2.0 * ndv2 * ny
                rz = -vz - 2.0 * ndv2 * nz
                lr_dot = _dot3(lvx, lvy, lvz, rx, ry, rz)
                ctx = lr_dot * rx - lvx
                cty = lr_dot * ry - lvy
                ctz = lr_dot * rz - lvz
                ct_len2 = jnp.maximum(ctx * ctx + cty * cty + ctz * ctz, 1e-20)
                tt = _saturate(lrad * jax.lax.rsqrt(ct_len2))
                clx = lvx + ctx * tt
                cly = lvy + cty * tt
                clz = lvz + ctz * tt
                inv_len = jax.lax.rsqrt(
                    jnp.maximum(clx * clx + cly * cly + clz * clz, 1e-20)
                )
                cr = jnp.clip(roughness, MIN_ROUGHNESS, 1.0)
                i_rough = cr / _saturate(cr + lrad * 0.5 * inv_len)
                spx, spy, spz = clx * inv_len, cly * inv_len, clz * inv_len
                sbr, sbg, sbb = _specular_eval(
                    bc_r, bc_g, bc_b, metallic, roughness, reflectance,
                    nx, ny, nz, spx, spy, spz, vx, vy, vz,
                )
                ir2 = i_rough * i_rough
                sbr, sbg, sbb = ir2 * sbr, ir2 * sbg, ir2 * sbb

            rad_k = f_angle * f_dist * f_cos
            nee_scale = lcount_f  # 1 / light_pdf
            take = (
                alive_f
                * has_lights.astype(jnp.float32)
                * (1.0 - occ.astype(jnp.float32))
                * nee_scale
            )
            col_r = col_r + take * thr_r * lcr * rad_k * (dbr + sbr)
            col_g = col_g + take * thr_g * lcg * rad_k * (dbg + sbg)
            col_b = col_b + take * thr_b * lcb * rad_k * (dbb + sbb)

            # --- layered BRDF continuation (ref_shading.rs:158-176) -----
            if bounce < depth:
                state, pick = _next_f32(state)
                state, ra = _next_f32(state)
                state, rb = _next_f32(state)
                (tx, ty, tz), (bx_, by_, bz_) = _onb(nx, ny, nz)

                if not no_metal:
                    use_spec = pick < metallic

                    # specular lobe (NDF sampling, brdf.rs:82-113)
                    a = jnp.clip(roughness, MIN_ROUGHNESS, 1.0)
                    a2 = a * a
                    cos_th = jnp.sqrt(
                        jnp.maximum((1.0 - ra) / ((a2 - 1.0) * ra + 1.0), 0.0)
                    )
                    sin_th = jnp.sqrt(jnp.maximum(1.0 - cos_th * cos_th, 0.0))
                    sphi = rb * jnp.pi * 2.0
                    cp, sp = jnp.cos(sphi), jnp.sin(sphi)
                    hx = tx * (sin_th * cp) + bx_ * (sin_th * sp) + nx * cos_th
                    hy = ty * (sin_th * cp) + by_ * (sin_th * sp) + ny * cos_th
                    hz = tz * (sin_th * cp) + bz_ * (sin_th * sp) + nz * cos_th
                    n_dot_h = _saturate(_dot3(nx, ny, nz, hx, hy, hz))
                    h_dot_v = _saturate(_dot3(hx, hy, hz, vx, vy, vz))
                    sdx2, sdy2, sdz2 = _normalize3(
                        2.0 * h_dot_v * hx - vx,
                        2.0 * h_dot_v * hy - vy,
                        2.0 * h_dot_v * hz - vz,
                    )
                    s_pdf = (
                        _ggx_distribution(n_dot_h, a)
                        * n_dot_h
                        / jnp.maximum(4.0 * h_dot_v, 1e-8)
                    )
                    srr, srg, srb = _specular_eval(
                        bc_r, bc_g, bc_b, metallic, roughness, reflectance,
                        nx, ny, nz, sdx2, sdy2, sdz2, vx, vy, vz,
                    )

                # diffuse lobe (hemisphere, white.rs:78-88: ra=cos, rb=phi)
                d_cos = ra
                d_sin = jnp.sqrt(jnp.maximum(1.0 - d_cos * d_cos, 0.0))
                dphi = 2.0 * jnp.pi * rb
                dcp, dsp = jnp.cos(dphi), jnp.sin(dphi)
                ddx = (tx * dcp + bx_ * dsp) * d_sin + nx * d_cos
                ddy = (ty * dcp + by_ * dsp) * d_sin + ny * d_cos
                ddz = (tz * dcp + bz_ * dsp) * d_sin + nz * d_cos
                d_pdf = jnp.full(shape, 1.0 / jnp.pi, jnp.float32)

                if no_metal:
                    # metallic == 0 everywhere: pick < 0 never selects
                    # the specular lobe (brdf.rs:125-139)
                    ndx, ndy, ndz = ddx, ddy, ddz
                    pdf = d_pdf
                    rad_r, rad_g, rad_b = dbr, dbg, dbb
                else:
                    ndx = jnp.where(use_spec, sdx2, ddx)
                    ndy = jnp.where(use_spec, sdy2, ddy)
                    ndz = jnp.where(use_spec, sdz2, ddz)
                    pdf = jnp.where(
                        use_spec,
                        s_pdf / jnp.maximum(metallic, 1e-8),
                        d_pdf / jnp.maximum(1.0 - metallic, 1e-8),
                    )
                    rad_r = jnp.where(use_spec, srr, dbr)
                    rad_g = jnp.where(use_spec, srg, dbg)
                    rad_b = jnp.where(use_spec, srb, dbb)

                alive = alive & (pdf > 0.0).astype(jnp.int32)
                cosw = _dot3(ndx, ndy, ndz, nx, ny, nz)
                scale = cosw / jnp.maximum(pdf, 1e-20)
                thr_r = thr_r * scale * rad_r
                thr_g = thr_g * scale * rad_g
                thr_b = thr_b * scale * rad_b

                keep = (alive > 0)
                ox, oy, oz = px, py, pz
                dx = jnp.where(keep, ndx, dx)
                dy = jnp.where(keep, ndy, dy)
                dz = jnp.where(keep, ndz, dz)

        r_ref[:] = col_r
        g_ref[:] = col_g
        b_ref[:] = col_b

    return kernel


@partial(jax.jit, static_argnames=("depth", "interpret", "flat", "no_metal"))
def trace_sample_megakernel(
    tri_rows, mat_rows, light_rows, lcount, o, d, state0,
    depth: int = 5, interpret: bool = False,
    flat: bool = False, no_metal: bool = False,
):
    """One path-traced sample per ray, fully in-kernel.

    tri_rows [T, 24] (pack_geometry_bw, T % 8 == 0), mat_rows [M, 12],
    light_rows [L, 13], lcount i32 scalar, o/d [..., 3], state0 u32 over
    o's batch shape (wnoise_new states). Returns radiance [..., 3].
    ``flat``/``no_metal`` select specialized kernel variants (see
    _ref_megakernel_body).
    """
    batch, r, g, comps = _tile_rays(o, d)
    st = state0.reshape(-1)
    pad = (-st.shape[0]) % TILE
    if pad:
        st = jnp.concatenate([st, jnp.zeros((pad,), st.dtype)])
    st = st.reshape(g * SUBLANES, LANES)

    plane_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lcount (1,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tris
            pl.BlockSpec(memory_space=pltpu.VMEM),  # materials
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lights
        ]
        + [plane_spec] * 7,
        out_specs=[plane_spec] * 3,
    )
    shape = (g * SUBLANES, LANES)
    f32 = jax.ShapeDtypeStruct(shape, jnp.float32)
    cr, cg, cb = pl.pallas_call(
        _ref_megakernel_body(depth, flat=flat, no_metal=no_metal),
        out_shape=(f32, f32, f32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(lcount, jnp.int32).reshape(1, 1),
        tri_rows,
        mat_rows,
        light_rows,
        *comps,
        st,
    )

    def unpack(a):
        return a.reshape(-1)[:r].reshape(batch)

    return jnp.stack([unpack(cr), unpack(cg), unpack(cb)], axis=-1)
