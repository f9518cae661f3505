"""Fused-frame ablation on Cornell (trace cost negligible there):
marginal ms/frame of render_frame_fused under config ablations, to
attribute the screen-space budget. Uses bench.bench_realtime.

Run: python abench.py [full|nogi|nodi|noden|digi0 ...]
"""

from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

from bench import WIDTH, HEIGHT, bench_realtime


def main():
    import dataclasses
    import time

    from strolle_tpu.scene.cornell import cornell_box, cornell_camera
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.models.restir import (
        RenderConfig, init_state, render_frame_fused,
    )
    from strolle_tpu.sky.atmosphere import luts_for
    from strolle_tpu.config import DEFAULT_TUNING

    scene = scene_with_bvh(cornell_box())
    cam = cornell_camera(WIDTH, HEIGHT)
    luts = luts_for(float(scene.sun_altitude))

    variants = {
        "full": RenderConfig(),
        "nogi": RenderConfig(needs_gi=False),
        "nodi": RenderConfig(needs_di=False),
        "noden": RenderConfig(denoise=False),
        "nospat": RenderConfig(tuning=dataclasses.replace(
            DEFAULT_TUNING, di_spatial_samples=0, gi_spatial_samples=0,
        )),
        "nocand": RenderConfig(tuning=dataclasses.replace(
            DEFAULT_TUNING, di_candidates=1,
        )),
    }
    names = sys.argv[1:] or list(variants)

    state0 = init_state(cam)
    import statistics

    for name in names:
        cfg = variants[name]

        def chain(n, f0):
            f = f0
            state = state0
            t0 = time.perf_counter()
            for _ in range(n):
                f += 1
                ch, state = render_frame_fused(
                    scene, cam, state, jnp.uint32(f), cfg, luts
                )
            np.asarray(ch["image"])
            return time.perf_counter() - t0

        chain(1, 0)
        chain(9, 1000)
        short = [chain(3, 2000 + 100 * i) for i in range(2)]
        long = [chain(9, 5000 + 100 * i) for i in range(2)]
        med_s = statistics.median(short)
        med_l = statistics.median(long)
        if med_l <= 1.1 * med_s:
            print(f"{name:8s}: ELISION?", flush=True)
            continue
        per = (med_l - med_s) / 6 * 1e3
        print(f"{name:8s}: {per:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
