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

    fn = jax.jit(
        partial(trace_sample, depth=DEPTH, include_sky=False)
    )
    img = fn(scene, camera, jnp.uint32(0))
    img.block_until_ready()

    import statistics

    # seeds never repeat across blocks: repeated same-value dispatches
    # can be served from a cache through the remote tunnel (bench.py
    # measurement-protocol note) and best-of would pick the fake block
    times = []
    f = 0
    for block in range(5):
        t0 = time.perf_counter()
        for _ in range(REPS):
            f += 1
            img = fn(scene, camera, jnp.uint32(f))
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)

    rays = WIDTH * HEIGHT * (DEPTH + 1) * 2 * REPS
    print(f"{med / REPS * 1e3:.2f} ms/sample  {rays / med / 1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
