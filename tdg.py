"""Strategy A/B on the dungeon (8.4k tris): stream vs cluster vs
packet-BVH kernels for closest-hit and anyhit, coherent + bounce rays.

Marginal-chain protocol (kbench.py): n traces chained inside one jit
with seed-perturbed rays, scalar checksum fetched; per-call cost is
the marginal between two chain lengths.

Run: python tdg.py [stream|cluster|packet ...]
"""

from __future__ import annotations

import statistics
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

W, H = 800, 608
REPS = 6


def rays_coherent(cam):
    from strolle_tpu.camera import primary_rays

    return primary_rays(cam)


def rays_bounce(seed=3):
    # screen-block-coherent origins, sphere-uniform directions — the
    # GI bounce distribution
    rs = np.random.RandomState(seed)
    o = np.zeros((H, W, 3), np.float32)
    o[..., 0] = np.linspace(-3, 3, W)[None, :]
    o[..., 1] = 1.0 + np.linspace(0, 2, H)[:, None]
    o[..., 2] = np.linspace(-3, 3, H)[:, None]
    d = rs.normal(size=(H, W, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def measure(fn, label):
    @partial(jax.jit, static_argnames=("n",))
    def chain(seed, n):
        def body(i, acc):
            return acc + fn(seed + i.astype(jnp.uint32))

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
    if med_l <= 1.05 * med_s:
        print(f"{label}: ELISION? short={med_s*1e3:.1f} long={med_l*1e3:.1f}")
        return
    per = (med_l - med_s) / (2 * REPS)
    print(f"{label}: {per*1e3:.2f} ms/call", flush=True)


def main():
    from strolle_tpu.scene.demo import dungeon, dungeon_camera
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.ops import trace as T

    scene = scene_with_bvh(dungeon())
    cam = dungeon_camera(W, H)
    o_c, d_c = rays_coherent(cam)
    o_b, d_b = rays_bounce()
    tmax = jnp.full((H, W), 100.0, jnp.float32)

    strategies = sys.argv[1:] or ["stream", "cluster"]
    for strat in strategies:
        T.BIG_SCENE_STRATEGY = strat

        def cl_c(s, o=o_c, d=d_c):
            eps = (s.astype(jnp.float32) % 7.0) * 1e-4
            h = T._trace_closest_opaque(scene, o + eps, d)
            return jnp.where(jnp.isfinite(h.t), h.t, 0.0).sum()

        def cl_b(s, o=o_b, d=d_b):
            eps = (s.astype(jnp.float32) % 7.0) * 1e-4
            h = T._trace_closest_opaque(scene, o + eps, d)
            return jnp.where(jnp.isfinite(h.t), h.t, 0.0).sum()

        def ah(s, o=o_c, d=d_c):
            eps = (s.astype(jnp.float32) % 7.0) * 1e-4
            occ = T._trace_anyhit_opaque(scene, o + eps, d, tmax)
            return occ.astype(jnp.float32).sum()

        measure(cl_c, f"{strat:8s} closest coherent")
        measure(cl_b, f"{strat:8s} closest bounce  ")
        measure(ah, f"{strat:8s} anyhit coherent ")


if __name__ == "__main__":
    main()
