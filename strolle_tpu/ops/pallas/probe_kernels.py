"""Pallas spatial-probe kernel: the ReSTIR neighbor search fused into
one VMEM-resident stencil pass.

The DI/GI spatial-resampling passes probe up to 8 neighbors per pixel
at shared per-try offsets (ops/offsets.py): in XLA each try costs a
dynamic-slice + select chain over the whole mirror-padded field stack,
and every one of those ops round-trips HBM — measured 8-19 ms per pass
at 800x608 (the realtime pipeline's dominant screen-space cost,
VERDICT r4 task 1). Here the whole probe runs in ONE kernel:

* each grid block DMAs a HALO'D WINDOW of the mirror-padded field
  stack into VMEM (halo = the search radius, so every tap of every try
  is VMEM-resident);
* per try, the V=levels*variants candidate taps are dynamic slices of
  the window (per-(try,variant) scalar offsets from SMEM) combined
  with a per-pixel select — registers, no HBM traffic;
* the adaptive-radius level walk, similarity gates, and (GI) the
  reconnection-shift Jacobian evaluate in-register, and the kernel
  returns each pixel's chosen offset + accept mask (+ clamped
  Jacobian), bit-compatible with the jnp probe loop it replaces
  (tests/test_probe_kernels.py asserts equality in interpret mode).

The payload fetch and the reservoir merge stay outside: the payload
gather is one row-batched take (ops/gather.py), and the merge is
fusable elementwise work. Reference semantics:
di_spatial_resampling.rs:55-99, gi_spatial_resampling.rs:66-120.

STATUS — measured, and OFF by default (STROLLE_PROBE_KERNEL=1 opts
in). In isolation the kernel beats the XLA shifted-select probe
(di 3.1 ms vs ~5.5, gi 6.4 ms vs ~14 at 800x608, marginal protocol) —
but embedded in the DI/GI stage programs the stage gets SLOWER
(di 23 -> 32 ms, gi 34 -> 38 ms net of dispatch floor, pbench r5):
the custom call is a fusion/layout barrier, its operand carries a
{2,1,0} layout constraint the producer must materialize, and the
halo'd window DMAs serialize against the grid. The jnp probe fuses
into the surrounding stage instead. Kept (with its bit-equality
tests) as a validated building block; revisit if Mosaic gains
layout-preserving custom calls or the stage programs stop fusing."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 32  # block rows (sublane multiple)
BW = 128  # block cols (one lane tile)

_U32 = jnp.uint32


def _next_u32(state):
    """ops.rng.next_u32, replicated verbatim (white.rs:35-42)."""
    state = state * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return state, (word >> _U32(22)) ^ word


def _mirror(v, n):
    """camera.contain_xy on one axis: low edge reflect, high symmetric."""
    v = jnp.where(v < 0, -v, v)
    return jnp.where(v >= n, 2 * n - v - 1, v)


def _probe_kernel(
    dy_ref, dx_ref, seed_ref,  # scalar prefetch: i32[tries*V], i32[tries*V], u32[1]
    stack_hbm,  # f32[P, rows_p, cols_p] mirror-padded field stack (ANY)
    *refs,
    mode: str,
    tries: int,
    n_var: int,
    n_lvls: int,
    margin: int,
    height: int,
    width: int,
    whp: int,
    wwp: int,
    n_tap: int,
    depth_tol: float,
    normal_min: float,
    jac_reject: float,
    jac_clamp: float,
):
    if mode == "gi":
        oy_out, ox_out, fnd_out, jac_out, win, sem = refs
    else:
        oy_out, ox_out, fnd_out, win, sem = refs
    m = margin
    v = n_lvls * n_var
    by = pl.program_id(0)
    bx = pl.program_id(1)

    cp = pltpu.make_async_copy(
        stack_hbm.at[:, pl.ds(by * BH, whp), pl.ds(bx * BW, wwp)], win, sem
    )
    cp.start()
    cp.wait()

    ii = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
    ys = by * BH + ii
    xs = bx * BW + jj
    state = (
        seed_ref[0]
        ^ (_U32(48619) * xs.astype(_U32))
        ^ (_U32(95461) * ys.astype(_U32))
    )

    # Every window read goes through an 8-aligned sublane slice + rolls
    # (Mosaic vector loads need provably aligned sublane starts; a
    # static-but-unaligned lane start is no better than a dynamic one).
    # Rolls run per 2-D plane: rolling the whole 3-D stack at once
    # keeps ~P*window intermediates live and blows the 16 MB VMEM
    # scoped-allocation budget at P=18 (measured).
    def shifted_plane(p, s8, r, c):
        bp = win[p, pl.ds(s8, BH + 8), :]
        bp = pltpu.roll(bp, jax.lax.rem(BH + 8 - r, BH + 8), axis=0)
        wwn = bp.shape[-1]
        bp = pltpu.roll(bp, jax.lax.rem(wwn - c, wwn), axis=1)
        return bp[:BH, :BW]

    s8c = (m // 8) * 8
    rc = m - s8c

    def center(p):
        return shifted_plane(p, s8c, rc, m)

    c_depth = center(0)
    c_nx, c_ny, c_nz = center(1), center(2), center(3)
    if mode == "gi":
        c_px, c_py, c_pz = center(15), center(16), center(17)

    zero_i = jnp.zeros((BH, BW), jnp.int32)
    zero_f = jnp.zeros((BH, BW), jnp.float32)
    level = zero_i
    done = zero_i > 0
    oy_r, ox_r = zero_i, zero_i
    jac_r = zero_f

    for t in range(tries):
        state, word = _next_u32(state)
        sel = level * n_var + (word % _U32(n_var)).astype(jnp.int32)

        # fori_loop over variants, not an unrolled chain: the offsets
        # are SMEM scalars indexable by the traced loop counter, and
        # the loop keeps only ONE variant's roll temporaries live —
        # the unrolled form let the scheduler hoist all V*P shifted
        # planes and blow the VMEM scoped-allocation budget.
        def variant_body(kk, carry):
            taps_c, oy_c, ox_c = carry
            dyk = dy_ref[t * v + kk]
            dxk = dx_ref[t * v + kk]
            s = m + dyk
            s8 = (s // 8) * 8
            r = s - s8
            c = m + dxk
            mk = sel == kk
            taps_c = tuple(
                jnp.where(mk, shifted_plane(p, s8, r, c), a)
                for p, a in enumerate(taps_c)
            )
            return (
                taps_c,
                jnp.where(mk, dyk, oy_c),
                jnp.where(mk, dxk, ox_c),
            )

        # by try t the level walk has descended <= t levels, so only
        # the first n_var*(t+1) table entries are reachable
        taps, oy_t, ox_t = jax.lax.fori_loop(
            0, min(n_var * (t + 1), v), variant_body,
            ((zero_f,) * n_tap, zero_i, zero_i),
        )

        # contain_xy mirror: a tap can land back on the center pixel
        x2 = _mirror(xs + ox_t, width)
        y2 = _mirror(ys + oy_t, height)
        same = (x2 == xs) & (y2 == ys)

        t_depth = taps[0]
        t_some = taps[4] > 0.5
        t_m = taps[5]
        depth_bad = jnp.abs(t_depth - c_depth) > depth_tol * c_depth
        ndot = (taps[1] * c_nx + taps[2] * c_ny) + taps[3] * c_nz
        normal_bad = ndot < normal_min
        gate_fail = ~t_some | depth_bad | normal_bad
        shrink = ~done & ~same & gate_fail
        level = jnp.where(shrink, jnp.minimum(level + 1, n_lvls - 1), level)
        accept = ~done & ~same & ~gate_fail & (t_m > 0.0)

        if mode == "gi":
            # reconnection-shift Jacobian (gi.rs:135-159), evaluated on
            # the tapped candidate geometry vs the CENTER hit point
            v2x, v2y, v2z = taps[9], taps[10], taps[11]
            v2nx, v2ny, v2nz = taps[12], taps[13], taps[14]

            def part(px, py, pz):
                vx, vy, vz = px - v2x, py - v2y, pz - v2z
                d2 = (vx * vx + vy * vy) + vz * vz
                d = jnp.sqrt(d2)
                inv = 1.0 / jnp.maximum(d, 1e-20)
                cos = jnp.clip(
                    (v2nx * (vx * inv) + v2ny * (vy * inv))
                    + v2nz * (vz * inv),
                    0.0,
                    1.0,
                )
                return d, cos

            nd, nc = part(c_px, c_py, c_pz)
            od, oc = part(taps[6], taps[7], taps[8])
            xj = nc * od * od
            yj = oc * nd * nd
            j = jnp.where(yj == 0.0, 0.0, xj / jnp.where(yj == 0.0, 1.0, yj))
            exists = (v2x != 0.0) | (v2y != 0.0) | (v2z != 0.0)
            j = jnp.where(exists, j, 1.0)
            jac_ok = (j >= 1.0 / jac_reject) & (j <= jac_reject)
            accept = accept & jac_ok
            jac_r = jnp.where(
                accept, jnp.clip(j, 1.0 / jac_clamp, jac_clamp), jac_r
            )

        oy_r = jnp.where(accept, oy_t, oy_r)
        ox_r = jnp.where(accept, ox_t, ox_r)
        done = done | accept

    oy_out[:] = oy_r
    ox_out[:] = ox_r
    fnd_out[:] = done.astype(jnp.int32)
    if mode == "gi":
        jac_out[:] = jac_r


def _mirror_pad_stack(stack, m):
    from ...ops.offsets import mirror_pad

    return mirror_pad(stack, m)


@partial(
    jax.jit,
    static_argnames=(
        "mode", "tries", "n_var", "n_lvls", "margin",
        "depth_tol", "normal_min", "jac_reject", "jac_clamp", "interpret",
    ),
)
def probe_spatial_pallas(
    stack,  # f32[P, H, W]: depth nx ny nz some m (+gi: v1*3 v2*3 v2n*3 point*3)
    dy_tab,  # i32[tries * V] shared offset tables, V = n_lvls * n_var
    dx_tab,
    seed,  # u32 scalar
    *,
    mode: str,
    tries: int,
    n_var: int,
    n_lvls: int,
    margin: int,
    depth_tol: float,
    normal_min: float,
    jac_reject: float = 10.0,
    jac_clamp: float = 3.0,
    interpret: bool = False,
):
    """Fused spatial probe. Returns (oy, ox, found[, jac]) as [H, W]
    planes: each pixel's chosen neighbor offset (0 where none accepted)
    and accept mask; ``jac`` (gi mode) is the clamped reconnection
    Jacobian of the accepted candidate."""
    p, h, w = stack.shape
    m = margin
    n_tap = 15 if mode == "gi" else 6

    gh = -(-h // BH)
    gw = -(-w // BW)
    # +8 rows: the kernel's tap slice starts at the 8-aligned floor of
    # (margin + dy) and spans BH + 8 rows before rolling the residual
    whp = -(-(BH + 2 * m + 8) // 8) * 8
    wwp = -(-(BW + 2 * m) // 128) * 128
    rows_p = (gh - 1) * BH + whp
    cols_p = (gw - 1) * BW + wwp

    padded = _mirror_pad_stack(stack, m)
    padded = jnp.pad(
        padded,
        (
            (0, 0),
            (0, rows_p - (h + 2 * m)),
            (0, cols_p - (w + 2 * m)),
        ),
    )

    out_shapes = [
        jax.ShapeDtypeStruct((gh * BH, gw * BW), jnp.int32),  # oy
        jax.ShapeDtypeStruct((gh * BH, gw * BW), jnp.int32),  # ox
        jax.ShapeDtypeStruct((gh * BH, gw * BW), jnp.int32),  # found
    ]
    if mode == "gi":
        out_shapes.append(
            jax.ShapeDtypeStruct((gh * BH, gw * BW), jnp.float32)
        )

    out_spec = pl.BlockSpec((BH, BW), lambda i, j, *_: (i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec] * len(out_shapes),
        scratch_shapes=[
            pltpu.VMEM((p, whp, wwp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = partial(
        _probe_kernel,
        mode=mode,
        tries=tries,
        n_var=n_var,
        n_lvls=n_lvls,
        margin=m,
        height=h,
        width=w,
        whp=whp,
        wwp=wwp,
        n_tap=n_tap,
        depth_tol=depth_tol,
        normal_min=normal_min,
        jac_reject=jac_reject,
        jac_clamp=jac_clamp,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(
        dy_tab.astype(jnp.int32),
        dx_tab.astype(jnp.int32),
        jnp.asarray(seed, jnp.uint32).reshape(1),
        padded,
    )
    outs = [o[:h, :w] for o in outs]
    oy, ox, found = outs[0], outs[1], outs[2] > 0
    if mode == "gi":
        return oy, ox, found, outs[3]
    return oy, ox, found
