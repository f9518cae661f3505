"""Headline benchmark: Mrays/s/chip on the 800x600 reference path tracer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever backend the environment provides (the axon TPU chip
under the driver; CPU if forced). The reference publishes no numbers
(BASELINE.md), so vs_baseline is measured against the previous round's
recording when available (BENCH_r*.json), else 1.0.
"""

from __future__ import annotations

import glob
import json
import re
import time

import jax
import jax.numpy as jnp

WIDTH, HEIGHT = 800, 608  # 800x600 rounded to row-tile multiple
DEPTH = 4  # bounces after the primary hit
FRAMES = 8


def rays_per_frame(width: int, height: int, depth: int) -> int:
    """Traced ray segments per frame in reference mode: per bounce one
    closest-hit + one NEE shadow ray (camera_controller.rs:101-111
    dispatches trace+shade per bounce)."""
    return width * height * (depth + 1) * 2


def main() -> None:
    from strolle_tpu.models.reference import render_reference, init_accumulator
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera
    from strolle_tpu.bvh import scene_with_bvh

    scene = scene_with_bvh(cornell_box())
    camera = cornell_camera(WIDTH, HEIGHT)
    acc = init_accumulator(camera)

    # compile + warmup
    img, acc = render_reference(
        scene, camera, acc, jnp.uint32(0), depth=DEPTH, include_sky=False
    )
    img.block_until_ready()

    t0 = time.perf_counter()
    for f in range(FRAMES):
        img, acc = render_reference(
            scene, camera, acc, jnp.uint32(f + 1), depth=DEPTH, include_sky=False
        )
    img.block_until_ready()
    dt = time.perf_counter() - t0

    ms_per_frame = dt / FRAMES * 1e3
    mrays = rays_per_frame(WIDTH, HEIGHT, DEPTH) * FRAMES / dt / 1e6

    # real-time pipeline (ReSTIR DI+GI + SVGF), steady-state ms/frame
    from strolle_tpu.models.restir import RenderConfig, init_state, render_frame

    cfg = RenderConfig()
    state = init_state(camera)
    ch, state = render_frame(scene, camera, state, jnp.uint32(0), cfg)
    ch["image"].block_until_ready()
    t0 = time.perf_counter()
    for f in range(20):
        ch, state = render_frame(scene, camera, state, jnp.uint32(f + 1), cfg)
    ch["image"].block_until_ready()
    restir_ms = (time.perf_counter() - t0) / 20 * 1e3

    prev = None
    for path in sorted(
        glob.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        try:
            with open(path) as f:
                rec = json.load(f)
            if rec.get("unit") == "Mrays/s":
                prev = rec["value"]
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": (
                    f"reference-mode Mrays/s/chip @{WIDTH}x{HEIGHT} d{DEPTH} "
                    f"({ms_per_frame:.1f} ms/frame; realtime ReSTIR+SVGF "
                    f"pipeline {restir_ms:.2f} ms/frame)"
                ),
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / prev, 3) if prev else 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
