"""Micro-bench: di_sampling alone on the dungeon (16 lights), marginal
per-call cost vs candidate count. Run: python dibench.py [n_cand ...]"""

from __future__ import annotations

import dataclasses
import statistics
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from strolle_tpu.config import DEFAULT_TUNING

W, H = 800, 608
REPS = 5


def main():
    from strolle_tpu.scene.demo import dungeon, dungeon_camera
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.models.restir import _stage_prelude, init_state
    from strolle_tpu.restir.di import di_sampling
    from strolle_tpu.sky.atmosphere import luts_for

    scene = scene_with_bvh(dungeon())
    cam = dungeon_camera(W, H)
    luts = luts_for(0.35)
    state = init_state(cam)
    surf, reproj, sky, bn1, bn2 = _stage_prelude(
        scene, cam, state.prev_camera, state.prev_surface, state.frame,
        luts, True, None,
    )
    jax.block_until_ready(surf.depth)

    for nc in [int(a) for a in (sys.argv[1:] or ["16", "4", "1"])]:
        tuning = dataclasses.replace(DEFAULT_TUNING, di_candidates=nc)

        @partial(jax.jit, static_argnames=("n",))
        def chain(seed0, n, tuning=tuning):
            def body(i, acc):
                r = di_sampling(
                    scene, cam, surf, seed0 + i.astype(jnp.uint32), bn1,
                    tuning,
                )
                return acc + r.w.sum() + r.light_id.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(chain(jnp.uint32(0), REPS))
        float(chain(jnp.uint32(1), 3 * REPS))
        short, long = [], []
        for b in range(3):
            t0 = time.perf_counter()
            float(chain(jnp.uint32(10 + b), REPS))
            short.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(chain(jnp.uint32(100 + b), 3 * REPS))
            long.append(time.perf_counter() - t0)
        med_s, med_l = statistics.median(short), statistics.median(long)
        per = (med_l - med_s) / (2 * REPS)
        print(f"di_sampling candidates={nc:3d}: {per*1e3:7.2f} ms/call",
              flush=True)


if __name__ == "__main__":
    main()
