"""Dev bench: realtime pipeline ms/frame (materialized-output protocol
— see bench.py module docstring: unfetched dispatch chains are elided
by the tunnel, so the final image must be np.asarray'd each trial)."""

import time

import numpy as np
import jax, jax.numpy as jnp
from strolle_tpu.scene.cornell import cornell_box, cornell_camera
from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.models.restir import render_frame, init_state, RenderConfig

scene = scene_with_bvh(cornell_box())
cam = cornell_camera(800, 608)
state = init_state(cam)
cfg = RenderConfig()
t0 = time.perf_counter()
ch, state = render_frame(scene, cam, state, jnp.uint32(0), cfg)
np.asarray(ch["image"])
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
f = 0
for trial in range(3):
    t0 = time.perf_counter()
    N = 3
    for _ in range(N):
        f += 1
        ch, state = render_frame(scene, cam, state, jnp.uint32(f), cfg)
    np.asarray(ch["image"])
    dt = (time.perf_counter() - t0) / N
    print(f"restir frame: {dt*1e3:.2f} ms  ({1/dt:.1f} FPS) @800x608", flush=True)
