"""Layout probe: cost of vec3 math expressed on [H,W,3] arrays vs
three [H,W] scalar planes, and basic plane-op costs. Marginal-chain
protocol. Run: python vbench.py"""

from __future__ import annotations

import statistics
import time
from functools import partial

import jax
import jax.numpy as jnp

W, H = 800, 608
REPS = 20


def measure(fn, label, reps=REPS):
    @partial(jax.jit, static_argnames=("n",))
    def chain(seed, n):
        def body(i, acc):
            return acc + fn(seed + i.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(jnp.float32(0), reps))
    float(chain(jnp.float32(1), 3 * reps))
    short, long = [], []
    for b in range(3):
        t0 = time.perf_counter()
        float(chain(jnp.float32(10 + b), reps))
        short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(jnp.float32(100 + b), 3 * reps))
        long.append(time.perf_counter() - t0)
    med_s, med_l = statistics.median(short), statistics.median(long)
    per = (med_l - med_s) / (2 * reps)
    print(f"{label}: {per*1e3:7.3f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    a3 = jax.random.normal(key, (H, W, 3))
    b3 = jax.random.normal(key, (H, W, 3)) + 1.0
    ax, ay, az = [a3[..., i] + 0.0 for i in range(3)]
    bx, by, bz = [b3[..., i] + 0.0 for i in range(3)]
    a3 = jax.device_put(a3)
    b3 = jax.device_put(b3)

    def dot_vec(s):
        v = a3 + s
        # 10 chained dot+normalize rounds on [H,W,3]
        out = jnp.zeros((H, W))
        for _ in range(10):
            d = jnp.sum(v * b3, axis=-1)
            v = v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1) + 1.0)[..., None]
            out = out + d
        return out.sum()

    def dot_pln(s):
        vx, vy, vz = ax + s, ay, az
        out = jnp.zeros((H, W))
        for _ in range(10):
            d = vx * bx + vy * by + vz * bz
            r = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz + 1.0)
            vx, vy, vz = vx * r, vy * r, vz * r
            out = out + d
        return out.sum()

    measure(dot_vec, "10x dot+norm [H,W,3]   ")
    measure(dot_pln, "10x dot+norm 3 planes  ")

    def many_elemwise(s):
        v = ax + s
        for _ in range(50):
            v = v * 1.0001 + 0.1
        return v.sum()

    measure(many_elemwise, "50x fused elemwise 1pl ")

    def transcend(s):
        v = ax + s
        out = jnp.zeros((H, W))
        for _ in range(10):
            out = out + jnp.exp(-jnp.abs(v) * 0.1) + jnp.arccos(
                jnp.clip(v * 0.1, -0.99, 0.99)
            )
            v = v + 0.01
        return out.sum()

    measure(transcend, "10x exp+arccos 1 plane ")


if __name__ == "__main__":
    main()
