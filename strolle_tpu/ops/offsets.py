"""Shared-offset spatial probing — the TPU-native neighbor search.

The reference's spatial-resampling passes probe neighbors at per-pixel
random disk offsets (di_spatial_resampling.rs:55-99). A per-pixel
arbitrary-offset fetch is a hardware gather (~1.7-5 ms per tap at
800x608, ops/gather.py); probing 8 tries x several fields that way
costs tens of ms per pass.

The TPU-native reformulation: each try draws a SMALL TABLE of shared
offsets (one per radius level x direction variant, fresh per pass),
every pixel picks a table entry (its adaptive radius level + a random
direction variant), and the fetch becomes a per-pixel SELECT over
dynamically-shifted copies of the field stack — pad + dynamic_slice +
where, all pure-bandwidth VPU work (~0.02 ms per shifted select,
obench.py). Out-of-bounds taps mirror exactly like camera.contain_xy
(low edge reflect, high edge symmetric), so tap values always match
`contain_xy(x + dx, y + dy)`.

Statistics: the offset DISTRIBUTION per pixel is unchanged (uniform
disk at the pixel's current search radius); what changes is that
pixels sharing a (level, variant) pair in a given try probe the same
direction, i.e. offsets are correlated across pixels within one frame
(fresh draws each pass/frame decorrelate temporally). Resampling
stays unbiased — MIS weights are evaluated from the actually-chosen
neighbor exactly as before — and the convergence oracles
(tests/test_restir.py) hold; the deviation is pinned in
tests/test_deviations.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng


def mirror_pad(a: jnp.ndarray, m: int) -> jnp.ndarray:
    """Pad [H, W] (or [C, H, W] on the last two dims) by ``m`` with the
    contain_xy mirror rule: low edge 'reflect' (index -k -> k), high
    edge 'symmetric' (index n+k -> n-1-k). Requires m < dim."""
    ax_h = a.ndim - 2
    ax_w = a.ndim - 1

    def pad_axis(x, ax):
        n = x.shape[ax]
        lo = jax.lax.slice_in_dim(x, 1, m + 1, axis=ax)
        lo = jnp.flip(lo, axis=ax)
        hi = jax.lax.slice_in_dim(x, n - m, n, axis=ax)
        hi = jnp.flip(hi, axis=ax)
        return jnp.concatenate([lo, x, hi], axis=ax)

    return pad_axis(pad_axis(a, ax_h), ax_w)


def draw_offset_table(seed, radii, variants: int, margin: int | None = None):
    """Draw ``len(radii) * variants`` shared disk offsets: entry
    ``l * variants + j`` is a uniform-disk sample of radius
    ``radii[l]`` rounded to integer pixels (clipped to ``margin`` —
    relevant only when the viewport is smaller than the search radius).
    Returns (dy, dx): two i32[V] arrays (read per-entry as traced
    scalars for dynamic_slice)."""
    nl = len(radii)
    v = nl * variants
    lvl = jnp.arange(v, dtype=jnp.uint32) // jnp.uint32(variants)
    state = rng.wnoise_new(seed, jnp.arange(v, dtype=jnp.uint32), lvl)
    state, disk = rng.sample_disk(state)
    r = jnp.asarray(radii, jnp.float32)[(lvl).astype(jnp.int32)]
    dx = (disk[..., 0] * r).astype(jnp.int32)
    dy = (disk[..., 1] * r).astype(jnp.int32)
    if margin is not None:
        dx = jnp.clip(dx, -margin, margin)
        dy = jnp.clip(dy, -margin, margin)
    return dy, dx


def probe_margin(base_radius: float, h: int, w: int) -> int:
    """Largest usable pad margin: the search radius, capped so the
    mirror pad stays valid on viewports smaller than the radius."""
    return max(1, min(int(base_radius), h - 1, w - 1))


class SharedOffsetTaps:
    """Mirror-padded [C, H+2m, W+2m] stacks of screen fields (f32, plus
    a u32 stack when needed) fetched at per-pixel table offsets via
    dynamic_slice + select."""

    def __init__(self, arrays, margin: int):
        h, w = arrays[0].shape[:2]
        self.h, self.w, self.m = h, w, margin
        f32_planes = []
        u32_planes = []
        self.specs = []  # (kind, dtype, channels-or-None, start)
        for a in arrays:
            is_u32 = a.dtype == jnp.uint32
            planes = u32_planes if is_u32 else f32_planes
            kind = "u32" if is_u32 else "f32"
            start = len(planes)
            if a.ndim == 2:
                c = None
                planes.append(a if is_u32 else a.astype(jnp.float32))
            else:
                c = a.shape[-1]
                for k in range(c):
                    col = a[..., k]
                    planes.append(col if is_u32 else col.astype(jnp.float32))
            self.specs.append((kind, a.dtype, c, start))
        self.fstack = (
            mirror_pad(jnp.stack(f32_planes, 0), margin) if f32_planes else None
        )
        self.ustack = (
            mirror_pad(jnp.stack(u32_planes, 0), margin) if u32_planes else None
        )

    def take(self, dy, dx, sel, kmax: int | None = None):
        """Fetch all fields at per-pixel offsets ``(dy[sel], dx[sel])``
        (mirrored at edges). ``dy``/``dx`` are the i32[V] offset table;
        ``sel`` is i32[H, W]. Returns fields with original shapes.

        ``kmax``: static bound on the reachable selector range — the
        adaptive-radius walk can only have descended ``nth`` levels by
        try ``nth``, so early tries need only the first
        ``variants * (nth + 1)`` table entries; skipping the rest cuts
        the slice+select chain ~30% with identical results."""
        h, w, m = self.h, self.w, self.m
        v = dy.shape[0] if kmax is None else min(kmax, dy.shape[0])

        def combine(stack):
            if stack is None:
                return None
            c = stack.shape[0]
            acc = jnp.zeros((c, h, w), stack.dtype)
            for k in range(v):
                sh = jax.lax.dynamic_slice(
                    stack, (0, m + dy[k], m + dx[k]), (c, h, w)
                )
                acc = jnp.where((sel == k)[None], sh, acc)
            return acc

        facc = combine(self.fstack)
        uacc = combine(self.ustack)
        results = []
        for kind, dtype, c, start in self.specs:
            g = uacc if kind == "u32" else facc
            if c is None:
                piece = g[start]
            else:
                piece = jnp.moveaxis(g[start : start + c], 0, -1)
            if kind == "f32" and dtype != jnp.float32:
                piece = piece > 0.5 if dtype == jnp.bool_ else piece.astype(dtype)
            results.append(piece)
        return results

    def offset_of(self, dy, dx, sel, kmax: int | None = None):
        """The per-pixel (dy, dx) the selector resolves to."""
        v = dy.shape[0] if kmax is None else min(kmax, dy.shape[0])
        oy = jnp.zeros(sel.shape, jnp.int32)
        ox = jnp.zeros(sel.shape, jnp.int32)
        for k in range(v):
            oy = jnp.where(sel == k, dy[k], oy)
            ox = jnp.where(sel == k, dx[k], ox)
        return oy, ox


def radius_levels(base: float, floor: float = 5.0) -> tuple[float, ...]:
    """The adaptive-radius ladder: base, base/2, ... clamped at floor
    (di_spatial_resampling.rs radius *= 0.5 with min 5)."""
    out = [base]
    while out[-1] * 0.5 > floor:
        out.append(out[-1] * 0.5)
    out.append(floor)
    return tuple(out)
