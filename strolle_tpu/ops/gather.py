"""Gather strategies tuned for the TPU compiler.

Screen-space neighbor fetches dominate the ReSTIR + SVGF stages, and
how a gather is *expressed* changes its cost by an order of magnitude
on TPU. Measured at 800x608 under the materialized-output protocol
(obench.py, round 5 — every number here is marginal cost inside one
jitted program, dispatch cancelled):

* one per-field flat take (``jnp.take`` of an [H*W] vector):
  **4.2-5.4 ms each** — the gather engine walks rows on the scalar
  core, and N fields cost N times that. This was the round-1..4
  design and the reason the realtime pipeline ran at seconds/frame.
* one row-batched take (``jnp.take(matrix[H*W, C], idx, axis=0)``):
  **~1.7 ms for C<=8, ~5 ms flat for C up to 128** — the per-row cost
  is fixed (the fetch granularity is a full lane tile), so batching
  every field of a stage into ONE matrix makes the per-field cost
  ~0.04-0.2 ms. Pack + unpack relayouts around the take are absorbed
  by XLA fusion (pack_unpack32 probe: 5.6 ms total vs 4.9 for the
  bare take).
* TABLE SIZE matters as much as channel count (measured round 5,
  486k indices): a take over a small table ([8.4k, 25] geometry rows)
  costs **~0.8 ms**, while the same take over an atlas-sized table
  (4.2M rows) costs **5-10 ms** (f32 C=4: 5.0, C=16: 10.0; u32 C=4:
  4.9). Big-table gathers are why texture sampling packs RGBA8
  corners into u32 rows (ops/texture.py).
* static pad+slice shifts: ~0.02 ms; k-way shifted selects (8 shifts
  + wheres): ~0.014 ms; both are pure-bandwidth VPU work.
* 2-D advanced indexing (``arr[cy, cx]``): ~5 ms — same engine as the
  flat take, never better.

So: express *fixed-offset* taps as shifts, *arbitrary* per-pixel taps
as ONE row-batched take per (index, stage) pair.

Integer fields: f32 bit-patterns are NOT preserved through the gather
path (NaN payloads canonicalize to 0x7fc00000 and denormals flush to
zero — measured on the chip), so i32/bool fields ride the f32 matrix
by VALUE (exact for |v| < 2^24; ids/triangle indices/bitmasks all
qualify) while full-range u32 fields (RNG states) are gathered through
a second u32-typed matrix.

For small tables (lights) a one-hot matmul runs on the MXU instead and
fuses cleanly with elementwise producers/consumers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Above this many rows the one-hot matrix is too large; fall back.
ONEHOT_MAX_ROWS = 256


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [T, K] fetched at idx [...] -> [..., K]."""
    t, k = table.shape
    if t <= ONEHOT_MAX_ROWS:
        onehot = (
            idx[..., None] == jnp.arange(t, dtype=idx.dtype)
        ).astype(table.dtype)
        return jnp.matmul(onehot, table, preferred_element_type=table.dtype)
    return jnp.take(table, idx, axis=0)


def gather_at(pos_y, pos_x, *arrays):
    """Fetch several screen-space arrays at per-pixel integer coords.

    ``arrays`` are [H, W] or [H, W, C]; ``pos_y``/``pos_x`` are [H, W]
    int32 (assumed already clamped in-bounds). Returns the fetched
    arrays with their original trailing shapes and dtypes.
    """
    flat, specs = pack_screen(*arrays)
    return take_screen(flat, specs, pos_y, pos_x)


def _is_u32(dtype) -> bool:
    return dtype == jnp.uint32


def pack_screen(*arrays):
    """Pack [H, W(, C)] arrays into one [H*W, C_total] f32 matrix (plus
    a u32 matrix when u32 fields are present) for row-batched takes.

    Pack ONCE per filter pass, then `take_screen` per tap: each tap is
    then ONE gather instruction regardless of field count (module doc).
    i32/bool fields are value-converted to f32 (exact below 2^24 — the
    id/bitmask contract); u32 fields keep their own matrix.
    """
    h, w = arrays[0].shape[:2]
    f32_cols = []
    u32_cols = []
    specs = []  # (kind, dtype, channels-or-None, start)
    for a in arrays:
        dtype = a.dtype
        cols = u32_cols if _is_u32(dtype) else f32_cols
        kind = "u32" if _is_u32(dtype) else "f32"
        start = len(cols)
        if a.ndim == 2:
            c = None
            a2 = a.reshape(h * w)
            cols.append(a2 if kind == "u32" else a2.astype(jnp.float32))
        else:
            c = a.shape[-1]
            a2 = a.reshape(h * w, c)
            for k in range(c):
                col = a2[:, k]
                cols.append(col if kind == "u32" else col.astype(jnp.float32))
        specs.append((kind, dtype, c, start))
    fmat = jnp.stack(f32_cols, axis=-1) if f32_cols else None
    umat = jnp.stack(u32_cols, axis=-1) if u32_cols else None
    return (fmat, umat), (h, w, tuple(specs))


def gather_tree(tree, pos_y, pos_x):
    """Fetch a whole screen-space pytree (Surface, reservoirs, tuples
    of several of them, ...) at per-pixel integer coords via ONE
    row-batched take (two when u32 leaves are present)."""
    leaves, treedef = jax.tree.flatten(tree)
    flat, specs = pack_screen(*leaves)
    out = take_screen(flat, specs, pos_y, pos_x)
    return jax.tree.unflatten(treedef, out)


def take_screen(flat, specs, pos_y, pos_x):
    """Fetch all packed arrays at integer coords; see module doc.

    Coordinates are assumed in-bounds (callers clamp); the take runs in
    ``mode="clip"`` so no out-of-bounds branch is emitted.
    """
    fmat, umat = flat
    h, w, field_specs = specs
    idx = (pos_y * w + pos_x).reshape(-1)
    fg = (
        jnp.take(fmat, idx, axis=0, mode="clip") if fmat is not None else None
    )
    ug = (
        jnp.take(umat, idx, axis=0, mode="clip") if umat is not None else None
    )
    results = []
    for kind, dtype, c, start in field_specs:
        g = ug if kind == "u32" else fg
        n = 1 if c is None else c
        piece = g[:, start : start + n]
        if kind == "f32" and dtype != jnp.float32:
            if dtype == jnp.bool_:
                piece = piece > 0.5
            else:
                piece = piece.astype(dtype)
        if c is None:
            piece = piece.reshape(h, w)
        else:
            piece = piece.reshape(h, w, c)
        results.append(piece)
    return results


def _shift_edge(a: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """shifted[y, x] = a[min(y + sy, H-1), min(x + sx, W-1)] for small
    static sy/sx >= 0, as edge-pad + static slice (pure-bandwidth)."""
    if sy == 0 and sx == 0:
        return a
    h, w = a.shape[:2]
    pad = ((0, sy), (0, sx)) + ((0, 0),) * (a.ndim - 2)
    p = jnp.pad(a, pad, mode="edge")
    start = (sy, sx) + (0,) * (a.ndim - 2)
    limit = (sy + h, sx + w) + p.shape[2:]
    return jax.lax.slice(p, start, limit)


def take_bilinear(arrays, py, px):
    """The 4 bilinear corner taps (floor/ceil per axis) of several
    screen arrays at fractional coords, via ONE row-batched take.

    Each field is packed together with its x+1 / y+1 / x+1,y+1 shifted
    variants and gathered once at the (clamped) floor corner; the ceil
    taps are the shifted variants, with a per-pixel select falling back
    to the unshifted variant where the floor corner was left/top
    clamped (so an in-bounds ceil tap at the image border is exact).

    Caveats (harmless by construction, see restir/primary.py): where a
    coordinate is integral, the ceil tap returns the +1 neighbor rather
    than duplicating the floor tap — its bilinear weight is exactly 0
    there; where the ceil tap itself is out of bounds its value is the
    edge clamp — callers mask those taps via their own bounds checks.

    Returns (taps, fy, fx): ``taps[corner][field]`` with corner order
    (floor,floor), (floor_y,ceil_x), (ceil_y,floor_x), (ceil_y,ceil_x).
    """
    h, w = arrays[0].shape[:2]
    variants = []
    for sy in (0, 1):
        for sx in (0, 1):
            for a in arrays:
                variants.append(_shift_edge(a, sy, sx))
    flat, specs = pack_screen(*variants)
    fy = jnp.floor(py).astype(jnp.int32)
    fx = jnp.floor(px).astype(jnp.int32)
    by = jnp.clip(fy, 0, h - 1)
    bx = jnp.clip(fx, 0, w - 1)
    res = take_screen(flat, specs, by, bx)
    n = len(arrays)
    g = [res[i * n : (i + 1) * n] for i in range(4)]  # (0,0),(0,1),(1,0),(1,1)
    ey = fy >= 0  # base not top-clamped: the +1 variant IS the ceil tap
    ex = fx >= 0

    def sel(cond, aa, bb):
        return [
            jnp.where(cond[..., None] if a.ndim == 3 else cond, a, b)
            for a, b in zip(aa, bb)
        ]

    tap_ff = g[0]
    tap_fc = sel(ex, g[1], g[0])
    tap_cf = sel(ey, g[2], g[0])
    tap_cc = sel(ex, sel(ey, g[3], g[1]), sel(ey, g[2], g[0]))
    return (tap_ff, tap_fc, tap_cf, tap_cc), fy, fx
