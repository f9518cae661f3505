"""shard_map overhead bound on the real chip (VERDICT r4 task 7):
reference tracer + realtime frame under a mesh of ONE device vs
unsharded, marginal two-chain protocol. Run on the default (TPU)
backend: python shbench.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

from strolle_tpu.scene.cornell import cornell_box, cornell_camera
from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.models.reference import trace_sample
from strolle_tpu.models.restir import RenderConfig, init_state, render_frame_fused
from strolle_tpu.parallel.sharding import make_mesh, render_sample_sharded
from strolle_tpu.parallel.frame_sharding import (
    init_state_sharded, render_frame_sharded, replicate_scene,
)
from strolle_tpu.sky.atmosphere import luts_for

W, H, DEPTH = 800, 608, 4


def marginal_ms(run_chain, n_short=3, n_long=9, trials=3):
    run_chain(1, 0)  # warm
    run_chain(n_long, 90)
    short = [run_chain(n_short, 100 + 10 * i) for i in range(trials)]
    long = [run_chain(n_long, 200 + 10 * i) for i in range(trials)]
    ms, ml = statistics.median(short), statistics.median(long)
    assert ml > ms, (ms, ml)
    return (ml - ms) / (n_long - n_short) * 1e3


def main() -> None:
    scene = scene_with_bvh(cornell_box())
    cam = cornell_camera(W, H)
    luts = luts_for(float(scene.sun_altitude))
    mesh = make_mesh(1)

    plain_fn = jax.jit(
        lambda s, sd: trace_sample(s, cam, sd, depth=DEPTH, include_sky=False)
    )

    def ref_plain(n, s0):
        t0 = time.perf_counter()
        acc = None
        for i in range(n):
            img = plain_fn(scene, jnp.uint32(s0 + i))
            acc = img if acc is None else acc + img
        float(acc.sum())
        return time.perf_counter() - t0

    def ref_sharded(n, s0):
        t0 = time.perf_counter()
        acc = None
        for i in range(n):
            img = render_sample_sharded(
                mesh, scene, cam, jnp.uint32(s0 + i), DEPTH, False
            )
            acc = img if acc is None else acc + img
        float(acc.sum())
        return time.perf_counter() - t0

    a = marginal_ms(ref_plain)
    b = marginal_ms(ref_sharded)
    print(f"reference @800x608 d4: unsharded {a:.2f} ms/sample, "
          f"mesh-of-1 shard_map {b:.2f} ms/sample, "
          f"overhead {(b - a) / a:+.1%}", flush=True)

    cfg = RenderConfig()
    state0 = init_state(cam)

    def rt_plain(n, s0):
        t0 = time.perf_counter()
        st = state0
        for i in range(n):
            ch, st = render_frame_fused(
                scene, cam, st, jnp.uint32(s0 + i), cfg, luts
            )
        np.asarray(ch["image"])
        return time.perf_counter() - t0

    scene_rep = replicate_scene(mesh, scene)
    state_sh = init_state_sharded(mesh, cam)

    def rt_sharded(n, s0):
        t0 = time.perf_counter()
        st = state_sh
        for i in range(n):
            ch, st = render_frame_sharded(
                mesh, scene_rep, cam, st, jnp.uint32(s0 + i), cfg, luts=luts
            )
        np.asarray(ch["image"])
        return time.perf_counter() - t0

    c = marginal_ms(rt_plain)
    d = marginal_ms(rt_sharded)
    print(f"realtime @800x608: unsharded fused {c:.2f} ms/frame, "
          f"mesh-of-1 sharded {d:.2f} ms/frame, "
          f"overhead {(d - c) / c:+.1%}", flush=True)


if __name__ == "__main__":
    main()
