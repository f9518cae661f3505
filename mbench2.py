"""Ablation: fused frame cost with parts toggled off."""
import time
import numpy as np
import jax, jax.numpy as jnp
from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.models.restir import RenderConfig, init_state, render_frame_fused
from strolle_tpu.sky.atmosphere import luts_for
from strolle_tpu.scene.cornell import cornell_box, cornell_camera

scene = scene_with_bvh(cornell_box())
cam = cornell_camera(800, 608)
luts = luts_for(float(scene.sun_altitude))

def run(name, cfg):
    state = init_state(cam)
    ch, st = render_frame_fused(scene, cam, state, jnp.uint32(0), cfg, luts)
    np.asarray(ch["image"])
    f = 0
    best = 1e9
    for trial in range(2):
        t0 = time.perf_counter()
        N = 4
        s = state
        for _ in range(N):
            f += 1
            ch, s = render_frame_fused(scene, cam, s, jnp.uint32(f), cfg, luts)
        np.asarray(ch["image"])
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:24s} {best*1e3:8.2f} ms", flush=True)

run("full", RenderConfig())
run("no_gi", RenderConfig(needs_gi=False))
run("no_di", RenderConfig(needs_di=False))
run("no_denoise", RenderConfig(denoise=False))
run("di_only_nodenoise", RenderConfig(needs_gi=False, denoise=False))
run("neither", RenderConfig(needs_di=False, needs_gi=False, denoise=False))
