"""Host-side tracing / profiling / scene stats (SURVEY.md §5.1, §5.5).

Re-creates the reference's three observability mechanisms:

* ``measure(name)`` — per-stage wall timers, the analogue of
  ``utils::measure`` (strolle/src/utils/metrics.rs:3-37). Enabled by
  the ``STROLLE_TPU_METRICS`` env var; ``STROLLE_TPU_METRIC_THRESHOLD``
  (seconds, float) filters out fast stages like the reference's
  humantime threshold. Emits ``metric(name)=duration`` at DEBUG level.
* ``scene_stats(scene)`` — per-tick entity counts, the analogue of
  ``STROLLE_STATS=1`` (strolle/src/lib.rs:156,385-394). Enabled by
  ``STROLLE_TPU_STATS``.
* ``device_trace(dir)`` — a ``jax.profiler`` trace context for kernel-
  level TPU profiling (the reference has no GPU-side profiling at all;
  the closest analogue is its BVH heatmap, kept as models/heatmap.py).

All three are no-ops unless explicitly enabled, so they never sit on
the hot path.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict

log = logging.getLogger("strolle_tpu")

_ENABLED = bool(os.environ.get("STROLLE_TPU_METRICS"))
_THRESHOLD = float(os.environ.get("STROLLE_TPU_METRIC_THRESHOLD", "0") or 0)
_STATS = bool(os.environ.get("STROLLE_TPU_STATS"))

#: Cumulative (total_seconds, calls) per metric name, for summaries.
totals: dict[str, list[float]] = defaultdict(lambda: [0.0, 0])


def enabled() -> bool:
    return _ENABLED


def enable(on: bool = True, threshold: float | None = None) -> None:
    global _ENABLED, _THRESHOLD
    _ENABLED = on
    if threshold is not None:
        _THRESHOLD = threshold


@contextlib.contextmanager
def measure(name: str):
    """``with measure("tick.bvh"): ...`` — times the block and logs
    ``metric(tick.bvh)=12.3ms`` when metrics are enabled and the
    duration exceeds the threshold."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        tot = totals[name]
        tot[0] += dt
        tot[1] += 1
        if dt >= _THRESHOLD:
            log.debug("metric(%s)=%.3fms", name, dt * 1e3)


def metric(name: str, t0: float) -> None:
    """Manual form: ``t0 = time.perf_counter(); ...; metric(name, t0)``
    (utils/metrics.rs:24-37)."""
    if not _ENABLED:
        return
    dt = time.perf_counter() - t0
    tot = totals[name]
    tot[0] += dt
    tot[1] += 1
    if dt >= _THRESHOLD:
        log.debug("metric(%s)=%.3fms", name, dt * 1e3)


def summary() -> dict[str, dict[str, float]]:
    """Cumulative timings: {name: {total_s, calls, mean_ms}}."""
    return {
        k: {"total_s": v[0], "calls": v[1], "mean_ms": v[0] / max(v[1], 1) * 1e3}
        for k, v in totals.items()
    }


def scene_stats(scene, frame: int | None = None) -> dict[str, int] | None:
    """Logs entity counts like STROLLE_STATS=1 (lib.rs:385-394); returns
    the dict (or None when disabled)."""
    if not _STATS:
        return None
    stats = {
        "triangles": int(scene.geometry.num_triangles),
        "materials": int(scene.materials.num_materials),
        "lights": int(scene.lights.count),
        "bvh_nodes": 0 if scene.bvh is None else int(scene.bvh.num_nodes),
    }
    log.info("stats%s: %s", "" if frame is None else f"[frame {frame}]", stats)
    return stats


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Profile the enclosed device work with jax.profiler (viewable in
    TensorBoard / xprof). Usage: ``with device_trace('/tmp/trace'): ...``"""
    import jax

    with jax.profiler.trace(log_dir):
        yield
