"""Dev bench: the FUSED whole-frame realtime pipeline ms/frame
(models.restir.render_frame_fused) under the materialized-output
protocol. Compare with rbench.py (per-stage dispatch)."""

import sys
import time

import numpy as np
import jax, jax.numpy as jnp
from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.models.restir import (
    RenderConfig, init_state, render_frame_fused,
)
from strolle_tpu.sky.atmosphere import luts_for

which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
if which == "cornell":
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera

    scene = scene_with_bvh(cornell_box())
    cam = cornell_camera(800, 608)
    cfg = RenderConfig()
else:
    from strolle_tpu.scene.demo import dungeon, dungeon_camera

    scene = scene_with_bvh(dungeon())
    scene = scene.replace(sun_altitude=jnp.asarray(0.35, jnp.float32))
    cam = dungeon_camera(800, 608)
    cfg = RenderConfig(include_sky=True)

luts = luts_for(float(scene.sun_altitude))
state = init_state(cam)
t0 = time.perf_counter()
ch, state = render_frame_fused(scene, cam, state, jnp.uint32(0), cfg, luts)
np.asarray(ch["image"])
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
f = 0
for trial in range(3):
    t0 = time.perf_counter()
    N = 4
    for _ in range(N):
        f += 1
        ch, state = render_frame_fused(scene, cam, state, jnp.uint32(f), cfg, luts)
    np.asarray(ch["image"])
    dt = (time.perf_counter() - t0) / N
    print(f"fused frame: {dt*1e3:.2f} ms  ({1/dt:.1f} FPS) @800x608", flush=True)
