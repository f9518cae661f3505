"""Weighted-reservoir sampling in SoA form.

Re-derivation of strolle-gpu/src/reservoir.rs + reservoir/di.rs as
batched array ops: a DiReservoirs pytree holds one reservoir per pixel,
and update/merge/normalize are masked elementwise transforms. No Vec4
serialization — slots are just pytree values handed between stage
functions (the di[0..2] wiring of SURVEY.md §3.3 becomes dataflow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import math as vm, rng
from ..utils.pytree import pytree_dataclass

#: LightId::sky() analogue; -1 keeps gathers in-bounds-clampable.
LIGHT_SKY = -1


@jax.custom_jvp
def resampling_weight(w, pdf, norm_num, norm_denom):
    """ReSTIR unbiased-contribution weight W = w*num/(pdf*denom) with
    the BASELINE-required custom differentiation rule for reservoir
    resampling: its derivative is defined as ZERO. The resampling
    statistics (RIS weight sums, MIS weights, target pdfs) are treated
    as fixed decisions; gradients flow straight-through the selected
    sample's continuous radiance instead (SURVEY.md §7.5). A naive
    autodiff through the weight chain is both high-variance and
    NaN-prone (divisions by target pdfs that can approach 0).

    Implementation note: expressed as a custom JVP with a symbolic-zero
    tangent rather than a custom VJP whose bwd materializes zero
    cotangents — reverse-mode transposition then propagates symbolic
    zeros, where the materialized-zeros form drove XLA:CPU's kernel
    emitter into an "Unknown MLIR failure" when fused into the DI
    sampling loop's backward program (jax 0.9.0)."""
    denom = pdf * norm_denom
    return jnp.where(
        denom == 0.0, 0.0, w * norm_num / jnp.where(denom == 0.0, 1.0, denom)
    )


@resampling_weight.defjvp
def _resampling_weight_jvp(primals, tangents):
    out = resampling_weight(*primals)
    return out, jnp.zeros_like(out)


@pytree_dataclass
class DiReservoirs:
    """Per-pixel DI reservoirs (reservoir/di.rs DiReservoir+DiSample)."""

    m: jnp.ndarray  # f32[...]
    w: jnp.ndarray  # f32[...]
    pdf: jnp.ndarray  # f32[...]  sample.pdf (target pdf at own pixel)
    confidence: jnp.ndarray  # f32[...]
    light_id: jnp.ndarray  # i32[...]
    light_point: jnp.ndarray  # f32[..., 3]
    is_occluded: jnp.ndarray  # bool[...]

    @property
    def is_empty(self) -> jnp.ndarray:
        return self.m == 0.0

    @staticmethod
    def empty(shape) -> "DiReservoirs":
        z = jnp.zeros(shape, jnp.float32)
        return DiReservoirs(
            m=z,
            w=z,
            pdf=z,
            confidence=z,
            light_id=jnp.zeros(shape, jnp.int32),
            light_point=jnp.zeros(shape + (3,), jnp.float32),
            is_occluded=jnp.zeros(shape, bool),
        )

    def gather(self, *idx) -> "DiReservoirs":
        """Fetch reservoirs at integer index arrays (e.g. [y, x])."""
        return DiReservoirs(
            m=self.m[idx],
            w=self.w[idx],
            pdf=self.pdf[idx],
            confidence=self.confidence[idx],
            light_id=self.light_id[idx],
            light_point=self.light_point[idx],
            is_occluded=self.is_occluded[idx],
        )


def select(mask: jnp.ndarray, a: DiReservoirs, b: DiReservoirs) -> DiReservoirs:
    """Elementwise reservoir select: a where mask else b."""
    mk = mask[..., None]
    return DiReservoirs(
        m=jnp.where(mask, a.m, b.m),
        w=jnp.where(mask, a.w, b.w),
        pdf=jnp.where(mask, a.pdf, b.pdf),
        confidence=jnp.where(mask, a.confidence, b.confidence),
        light_id=jnp.where(mask, a.light_id, b.light_id),
        light_point=jnp.where(mk, a.light_point, b.light_point),
        is_occluded=jnp.where(mask, a.is_occluded, b.is_occluded),
    )


def select_sample(mask, a: DiReservoirs, b: DiReservoirs) -> DiReservoirs:
    """Replace only the *sample* fields (pdf/light/occlusion) of b by a
    where mask — reservoir statistics (m, w) stay b's."""
    mk = mask[..., None]
    return b.replace(
        pdf=jnp.where(mask, a.pdf, b.pdf),
        light_id=jnp.where(mask, a.light_id, b.light_id),
        light_point=jnp.where(mk, a.light_point, b.light_point),
        is_occluded=jnp.where(mask, a.is_occluded, b.is_occluded),
        confidence=jnp.where(mask, a.confidence, b.confidence),
    )


def update(state, res: DiReservoirs, cand: DiReservoirs, weight, enabled=None):
    """Reservoir::update (reservoir.rs:24-39): stream one candidate in.

    `cand`'s sample fields are the candidate; its m/w are ignored.
    Returns (rng_state, reservoirs, accepted_mask). Lanes with
    ``enabled == False`` are untouched (their RNG still advances, like
    a masked-out GPU thread would not — we advance uniformly for
    lockstep replayability; disabled lanes simply discard).
    """
    weight = jnp.asarray(weight, jnp.float32)
    if enabled is None:
        enabled = jnp.ones(weight.shape, bool)
    m = res.m + 1.0
    w = res.w + weight
    state, u = rng.next_f32(state)
    accept = (u * w < weight) & enabled
    out = res.replace(
        m=jnp.where(enabled, m, res.m), w=jnp.where(enabled, w, res.w)
    )
    out = select_sample(accept, cand, out)
    return state, out, accept


def merge(state, res: DiReservoirs, rhs: DiReservoirs, pdf, enabled=None):
    """Reservoir::merge (reservoir.rs:41-53)."""
    ok = rhs.m > 0.0
    if enabled is not None:
        ok = ok & enabled
    res2 = res.replace(m=jnp.where(ok, res.m + rhs.m - 1.0, res.m))
    state, out, accepted = update(state, res2, rhs, rhs.w * rhs.m * pdf, ok)
    return state, out, accepted


def clamp_m(res: DiReservoirs, max_m: float) -> DiReservoirs:
    return res.replace(m=jnp.minimum(res.m, max_m))


def clamp_w(res: DiReservoirs, max_w: float) -> DiReservoirs:
    return res.replace(w=jnp.minimum(res.w, max_w))


def norm(res: DiReservoirs, pdf, norm_num, norm_denom) -> DiReservoirs:
    norm_num = jnp.broadcast_to(jnp.asarray(norm_num, jnp.float32), res.w.shape)
    norm_denom = jnp.broadcast_to(
        jnp.asarray(norm_denom, jnp.float32), res.w.shape
    )
    return res.replace(w=resampling_weight(res.w, pdf, norm_num, norm_denom))


def norm_avg(res: DiReservoirs, pdf) -> DiReservoirs:
    return norm(res, pdf, 1.0, res.m)


def norm_mis(res: DiReservoirs, pdf) -> DiReservoirs:
    return norm(res, pdf, 1.0, 1.0)
