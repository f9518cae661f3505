"""Headline benchmark: Mrays/s/chip on the 800x600 reference path tracer,
plus the dungeon scene (packet-BVH + textures path), the realtime
ReSTIR+SVGF pipeline, and a 1080p full-pipeline run (BASELINE staged
config 5).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. The
headline value stays the Cornell reference-mode Mrays/s so vs_baseline
is comparable across rounds (BENCH_r*.json); all other measurements are
embedded in the metric string.

Runs on whatever backend the environment provides (the axon TPU chip
under the driver; CPU if forced).
"""

from __future__ import annotations

import glob
import json
import re
import time

import jax
import jax.numpy as jnp

import os

_cache_dir = os.environ.get(
    "STROLLE_JAX_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_strolle_tpu"),
)
try:  # best-effort: a read-only home must not kill the bench
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except OSError:
    pass

WIDTH, HEIGHT = 800, 608  # 800x600 rounded to row-tile multiple
DEPTH = 4  # bounces after the primary hit
FRAMES = 8
HD_WIDTH, HD_HEIGHT = 1920, 1088  # 1080p rounded to row-tile multiple


def rays_per_frame(width: int, height: int, depth: int) -> int:
    """Traced ray segments per frame in reference mode: per bounce one
    closest-hit + one NEE shadow ray (camera_controller.rs:101-111
    dispatches trace+shade per bounce)."""
    return width * height * (depth + 1) * 2


TRIALS = 3  # best-of: the tunneled chip shows 1.5-2x run-to-run jitter


def bench_reference(scene, camera, depth=DEPTH, frames=FRAMES,
                    include_sky=False):
    from strolle_tpu.models.reference import render_reference, init_accumulator

    acc = init_accumulator(camera)
    img, acc = render_reference(
        scene, camera, acc, jnp.uint32(0), depth=depth,
        include_sky=include_sky,
    )
    img.block_until_ready()
    best = float("inf")
    for trial in range(TRIALS):
        t0 = time.perf_counter()
        for f in range(frames):
            img, acc = render_reference(
                scene, camera, acc, jnp.uint32(f + 1), depth=depth,
                include_sky=include_sky,
            )
        img.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    ms = best / frames * 1e3
    mrays = rays_per_frame(camera.width, camera.height, depth) * frames / best / 1e6
    return mrays, ms


def bench_realtime(scene, camera, frames=20, include_sky=False, luts=None):
    from strolle_tpu.models.restir import RenderConfig, init_state, render_frame

    cfg = RenderConfig(include_sky=include_sky)
    state = init_state(camera)
    ch, state = render_frame(scene, camera, state, jnp.uint32(0), cfg, luts=luts)
    ch["image"].block_until_ready()
    best = float("inf")
    for trial in range(TRIALS):
        t0 = time.perf_counter()
        for f in range(frames):
            ch, state = render_frame(
                scene, camera, state, jnp.uint32(f + 1), cfg, luts=luts
            )
        ch["image"].block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / frames * 1e3


def main() -> None:
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera
    from strolle_tpu.scene.demo import dungeon, dungeon_camera
    from strolle_tpu.bvh import scene_with_bvh

    # --- Cornell (megakernel path; headline metric) ---------------------
    cornell = scene_with_bvh(cornell_box())
    cam = cornell_camera(WIDTH, HEIGHT)
    c_mrays, c_ms = bench_reference(cornell, cam)
    c_rt = bench_realtime(cornell, cam)

    # --- dungeon (8.4k textured tris: packet-BVH kernels + atlas) -------
    dg = scene_with_bvh(dungeon())
    dcam = dungeon_camera(WIDTH, HEIGHT)
    d_mrays, d_ms = bench_reference(dg, dcam)
    from strolle_tpu.sky.atmosphere import luts_for

    luts = luts_for(0.35)
    dg_sun = dg.replace(sun_altitude=jnp.asarray(0.35, jnp.float32))
    d_rt = bench_realtime(dg_sun, dcam, include_sky=True, luts=luts)

    # --- 1080p full pipeline (BASELINE staged config 5) ------------------
    hd_cam = dungeon_camera(HD_WIDTH, HD_HEIGHT)
    hd_rt = bench_realtime(dg_sun, hd_cam, frames=10, include_sky=True,
                           luts=luts)

    # --- 262k-tri soup: the HBM-streaming large-scene path ---------------
    import sys

    sys.path.insert(0, ".")
    from xbench import rays as xrays, soup_scene

    big = soup_scene(262144)
    o, d = xrays(coherent=True)
    from strolle_tpu.ops.trace import trace_surface

    fn = jax.jit(lambda s, o, d: trace_surface(s, o, d).depth)
    fn(big, o, d).block_until_ready()
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(big, o, d)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 5)
    big_mrays = o.shape[0] * o.shape[1] / best / 1e6

    prev = None
    for path in sorted(
        glob.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        try:
            with open(path) as f:
                rec = json.load(f)
            if "parsed" in rec:
                rec = rec["parsed"]
            if rec.get("unit") == "Mrays/s":
                prev = rec["value"]
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": (
                    f"reference-mode Mrays/s/chip @{WIDTH}x{HEIGHT} d{DEPTH} "
                    f"Cornell ({c_ms:.1f} ms/frame; realtime {c_rt:.2f} ms) | "
                    f"dungeon 8.4k-tri textured: {d_mrays:.0f} Mrays/s "
                    f"({d_ms:.1f} ms/frame; realtime+sky {d_rt:.2f} ms) | "
                    f"1080p realtime+sky {hd_rt:.2f} ms/frame | "
                    f"262k-tri soup closest-hit {big_mrays:.0f} Mrays/s "
                    f"(HBM-streaming kernel)"
                ),
                "value": round(c_mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(c_mrays / prev, 3) if prev else 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
