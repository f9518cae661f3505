"""Checkpoint / resume of renderer state (SURVEY.md §5.4).

The reference has no persistence; its only carried state is temporal
(reservoirs, moments, accumulators). Here every piece of carried state
is a pytree — ``RenderState`` (ReSTIR + denoiser history), the
reference-mode accumulator, and differentiable-fit train state — so
checkpointing is one orbax save/restore. This is what makes long
differentiable optimization runs (examples/fit_materials.py) resumable
across preemptions on multi-host TPU jobs.

States contain custom pytree nodes (pytree_dataclass types), so we
serialize the *leaves* (orbax-friendly flat list) and rebuild with the
caller's treedef on restore — the structure itself is code, not data.

Usage::

    save(path, {"state": render_state, "frame": 120})
    restored = restore(path, {"state": fresh_state, "frame": 0})
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str | os.PathLike, state: Any, *, force: bool = True) -> None:
    """Writes a pytree checkpoint (any mix of jax/np arrays and python
    scalars; custom pytree nodes welcome) to directory ``path``."""
    leaves = jax.tree.leaves(state)
    payload = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
    path = os.path.abspath(os.fspath(path))
    _checkpointer().save(path, payload, force=force)


def restore(path: str | os.PathLike, target: Any) -> Any:
    """Reads a checkpoint saved by :func:`save`. ``target`` supplies
    the pytree structure (e.g. a freshly-init state of the same shape);
    leaves are restored as jax arrays with the target's dtypes."""
    path = os.path.abspath(os.fspath(path))
    payload = _checkpointer().restore(path)
    leaves = [payload[k] for k in sorted(payload)]
    t_leaves, treedef = jax.tree.flatten(target)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, target has {len(t_leaves)}"
        )
    out = []
    for saved, tgt in zip(leaves, t_leaves):
        arr = jax.numpy.asarray(saved)
        if hasattr(tgt, "dtype"):
            arr = arr.astype(tgt.dtype)
        out.append(arr)
    return jax.tree.unflatten(treedef, out)


def latest_step(root: str | os.PathLike) -> int | None:
    """For step-numbered layouts (``<root>/<step>/``): the newest step
    present, or None."""
    root = os.fspath(root)
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None
