import time
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
ch["image"].block_until_ready()
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
for trial in range(3):
    t0 = time.perf_counter()
    N = 20
    for f in range(N):
        ch, state = render_frame(scene, cam, state, jnp.uint32(f + 1), cfg)
    ch["image"].block_until_ready()
    dt = (time.perf_counter() - t0) / N
    print(f"restir frame: {dt*1e3:.2f} ms  ({1/dt:.1f} FPS) @800x608", flush=True)
