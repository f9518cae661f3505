"""Stage-by-stage profile of the ReSTIR pipeline on TPU."""
import time
from functools import partial
import jax, jax.numpy as jnp
from strolle_tpu.scene.cornell import cornell_box, cornell_camera
from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.camera import screen_grid
from strolle_tpu.models.restir import init_state, derive_seed
from strolle_tpu.restir import di as di_mod
from strolle_tpu.restir import gi as gi_mod
from strolle_tpu.restir.primary import primary_pass, build_reprojection_map
from strolle_tpu.denoise.svgf import denoise_channel
from strolle_tpu.ops import bluenoise

scene = scene_with_bvh(cornell_box())
cam = cornell_camera(800, 608)
state = init_state(cam)
seed = jnp.uint32(3)
frame = state.frame
grid = screen_grid(cam)

def timeit(name, fn, *args, **kw):
    f = jax.jit(fn)
    out = f(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:24s} {(time.perf_counter()-t0)/5*1e3:9.2f} ms", flush=True)
    return out

surf, velocity = timeit("primary_pass", primary_pass, scene, cam, cam)
reproj = timeit("reprojection_map", build_reprojection_map, cam, surf, state.prev_surface, velocity)
bn = timeit("bluenoise", lambda f: bluenoise.sample_pair_screen(608, 800, f), frame)
bn_first = jnp.stack([bn[0], bn[1]], -1)
bn_second = jnp.stack([bn[2], bn[3]], -1)
a = timeit("di_sampling", di_mod.di_sampling, scene, cam, surf, seed, bn_first)
b = timeit("di_temporal", di_mod.di_temporal, scene, cam, surf, state.prev_surface, reproj, a, state.di_prev, seed)
c = timeit("di_spatial", partial(di_mod.di_spatial, scene, cam), surf, b, seed, frame)
sky = jnp.zeros((608, 800, 3), jnp.float32)
dd, ds, dp = timeit("di_resolving", partial(di_mod.di_resolving, scene, cam), surf, c, sky)
gi_out = timeit("gi_pipeline", partial(gi_mod.gi_pipeline, scene, cam), surf, state.prev_surface, reproj, state.gi_prev, seed, frame, bn_second, None)
gd = gi_out[0]
den = timeit("svgf_di", partial(denoise_channel, kind="di"), dd, surf, reproj, state.di_diff_denoiser, frame)
