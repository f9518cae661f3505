"""Gather strategies tuned for the TPU compiler.

Screen-space neighbor fetches dominate the ReSTIR + SVGF stages, and
how a gather is *expressed* changes its cost by 3 orders of magnitude
on TPU (all numbers measured at 800x608):

* 2-D advanced indexing (``arr[cy, cx]``) fused into surrounding
  elementwise work lowers to a scalar-core loop: ~185 ms per a-trous
  wavelet pass.
* Packing all fields into one [H*W, K] matrix makes the gather fast
  but the column-slice unpack produces T(1,128)-tiled slices plus a
  relayout copy per field: ~20 ms/pass.
* Index chains containing a [H,1]/[1,W] broadcast iota (arange +
  broadcasting, or meshgrid) poison the computation with T(1,128)
  layouts: ~5 ms per gather. Use `jax.lax.broadcasted_iota` (see
  camera.screen_xy).
* Per-field flat takes ([H*W(,C)] arrays, one shared linear index)
  keep every layout native — the reshapes back to [H, W(, C)] are
  bitcasts — and run at HBM bandwidth: ~0.05 ms per gather.

For small tables (lights) a one-hot matmul runs on the MXU instead and
fuses cleanly with elementwise producers/consumers.
"""

from __future__ import annotations

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


def pack_screen(*arrays):
    """Flatten [H, W(, C)] arrays to per-channel [H*W] vectors.

    Flatten ONCE per filter pass, then `take_screen` per tap. Channels
    are split into separate flat vectors and bools are widened to f32:
    a gather producing [N, C] gets a transposed {0,1} output layout
    (~30 ms each, measured) and a pred-typed gather stages through
    scalar memory S(1) (~12 ms each); per-channel f32/i32 [N] takes hit
    the fast path.
    """
    h, w = arrays[0].shape[:2]
    flat = []
    specs = []  # (channels-or-None, dtype)
    for a in arrays:
        dtype = a.dtype
        if a.dtype == jnp.bool_:
            a = a.astype(jnp.float32)
        if a.ndim == 2:
            flat.append(a.reshape(h * w))
            specs.append((None, dtype))
        else:
            c = a.shape[-1]
            af = a.reshape(h * w, c)
            flat.append(tuple(af[:, k] for k in range(c)))
            specs.append((c, dtype))
    return tuple(flat), (h, w, tuple(specs))


def gather_tree(tree, pos_y, pos_x):
    """Fetch a whole screen-space pytree (Surface, reservoirs, ...) at
    per-pixel integer coords via per-leaf flat takes."""
    import jax

    leaves, treedef = jax.tree.flatten(tree)
    flat, specs = pack_screen(*leaves)
    out = take_screen(flat, specs, pos_y, pos_x)
    return jax.tree.unflatten(treedef, out)


def take_screen(flat, specs, pos_y, pos_x):
    """Fetch all flattened arrays at integer coords; see module doc."""
    h, w, field_specs = specs
    idx = (pos_y * w + pos_x).reshape(-1)
    results = []
    for a, (c, dtype) in zip(flat, field_specs):
        if c is None:
            piece = jnp.take(a, idx).reshape(h, w)
        else:
            piece = jnp.stack(
                [jnp.take(col, idx).reshape(h, w) for col in a], axis=-1
            )
        if dtype == jnp.bool_:
            piece = piece > 0.5
        results.append(piece)
    return results
