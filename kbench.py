"""Quick kernel-iteration bench: times the reference megakernel alone.

Not part of the driver benchmark (bench.py is); this exists to iterate
on kernel variants without paying bench.py's full pipeline compile.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

WIDTH, HEIGHT = 800, 608
DEPTH = 4
REPS = 10


def main() -> None:
    from functools import partial

    from strolle_tpu.models.reference import trace_sample
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera
    from strolle_tpu.bvh import scene_with_bvh

    scene = scene_with_bvh(cornell_box())
    camera = cornell_camera(WIDTH, HEIGHT)

    # bench.py protocol: chain samples INSIDE one jit and fetch a
    # scalar checksum — unfetched dispatch chains are elided by the
    # tunnel, and fresh seeds defeat its same-value dispatch cache.
    @partial(jax.jit, static_argnames=("n",))
    def chain(scene, seed0, n):
        def body(i, acc):
            return acc + trace_sample(
                scene, camera, seed0 + i.astype(jnp.uint32),
                depth=DEPTH, include_sky=False,
            ).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    import statistics

    float(chain(scene, jnp.uint32(0), REPS))
    float(chain(scene, jnp.uint32(1), 4 * REPS))
    short = []
    long = []
    for block in range(5):
        t0 = time.perf_counter()
        float(chain(scene, jnp.uint32(10 + block), REPS))
        short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(scene, jnp.uint32(100 + block), 4 * REPS))
        long.append(time.perf_counter() - t0)
    # marginal cost cancels the host sync round-trip
    med_s, med_l = statistics.median(short), statistics.median(long)
    assert med_l > 1.1 * med_s, (
        f"long chain {med_l*1e3:.1f} ms not > short {med_s*1e3:.1f} ms * 1.1 "
        "— dispatch elision suspected (advisor r4)"
    )
    per = (med_l - med_s) / (3 * REPS)

    rays = WIDTH * HEIGHT * (DEPTH + 1) * 2
    print(f"{per * 1e3:.2f} ms/sample  {rays / per / 1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
