"""Pairwise defensive MIS for reservoir merges.

Verbatim math from strolle-gpu/src/reservoir/mis.rs:96-144 as batched
elementwise ops: confidence discount m = rhs_m * min over both
directions of saturate(min(q1/q0, 1)^8), and defensive weights that
give the canonical (lhs) sample a bonus t = lhs_m/(lhs_m+rhs_m).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import math as vm


class MisResult(NamedTuple):
    m: jnp.ndarray
    lhs_pdf: jnp.ndarray
    lhs_mis: jnp.ndarray
    rhs_pdf: jnp.ndarray
    rhs_mis: jnp.ndarray


def _mis(x, y):
    s = x + y
    return jnp.where(s == 0.0, 0.0, x / jnp.where(s == 0.0, 1.0, s))


def _m(q0, q1):
    ratio = jnp.minimum(q1 / jnp.where(q0 <= 0.0, 1.0, q0), 1.0)
    val = vm.saturate(ratio**8.0)
    return jnp.where(q0 <= 0.0, 1.0, val)


def mis_eval(
    lhs_m,
    rhs_m,
    rhs_jacobian,
    lhs_lhs_pdf,
    lhs_rhs_pdf,
    rhs_lhs_pdf,
    rhs_rhs_pdf,
) -> MisResult:
    m = rhs_m * jnp.minimum(
        _m(rhs_rhs_pdf, rhs_lhs_pdf), _m(lhs_rhs_pdf, lhs_lhs_pdf)
    )

    t = _mis(lhs_m, rhs_m)

    lhs_mis = t + (1.0 - t) * _mis(lhs_m * lhs_lhs_pdf, rhs_m * lhs_rhs_pdf)
    rhs_mis = (1.0 - t) * _mis(
        rhs_m * rhs_rhs_pdf * rhs_jacobian, lhs_m * rhs_lhs_pdf
    )

    return MisResult(
        m=m,
        lhs_pdf=lhs_lhs_pdf,
        lhs_mis=lhs_mis,
        rhs_pdf=rhs_lhs_pdf,
        rhs_mis=rhs_mis,
    )
