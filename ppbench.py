"""Pass-level micro-bench: marginal per-call cost of each ReSTIR/SVGF
pass on the TPU, with representative inputs. Finer-grained than
pbench.py's 5 coarse stages. Run: python ppbench.py [cornell|dungeon]"""

from __future__ import annotations

import statistics
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

W, H = 800, 608
REPS = 5


def measure(fn, label, reps=REPS):
    """fn(i:int tracer) -> scalar; chained inside one jit."""

    @partial(jax.jit, static_argnames=("n",))
    def chain(seed, n):
        def body(i, acc):
            return acc + fn(seed + i.astype(jnp.uint32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(jnp.uint32(0), reps))
    float(chain(jnp.uint32(1), 3 * reps))
    short, long = [], []
    for b in range(3):
        t0 = time.perf_counter()
        float(chain(jnp.uint32(10 + b), reps))
        short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(jnp.uint32(100 + b), 3 * reps))
        long.append(time.perf_counter() - t0)
    med_s, med_l = statistics.median(short), statistics.median(long)
    per = (med_l - med_s) / (2 * reps)
    print(f"{label:26s}: {per*1e3:7.2f} ms", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.sky.atmosphere import luts_for

    if which == "cornell":
        from strolle_tpu.scene.cornell import cornell_box, cornell_camera

        scene = scene_with_bvh(cornell_box())
        cam = cornell_camera(W, H)
    else:
        from strolle_tpu.scene.demo import dungeon, dungeon_camera

        scene = scene_with_bvh(dungeon())
        cam = dungeon_camera(W, H)
    scene = scene.replace(sun_altitude=jnp.asarray(0.35, jnp.float32))
    luts = luts_for(0.35)

    from strolle_tpu.models import restir as R
    from strolle_tpu.restir import di as DI, gi as GI
    from strolle_tpu.restir import reservoir as rsv
    from strolle_tpu.config import DEFAULT_TUNING as TN

    state = R.init_state(cam)
    cfg = R.RenderConfig(include_sky=True)
    # two real frames for representative temporal state
    ch, state = R.render_frame(scene, cam, state, jnp.uint32(0), cfg,
                               luts=luts)
    ch, state = R.render_frame(scene, cam, state, jnp.uint32(1), cfg,
                               luts=luts)
    jax.block_until_ready(ch["image"])

    surf, reproj, sky, bn1, bn2 = R._stage_prelude(
        scene, cam, state.prev_camera, state.prev_surface, state.frame,
        luts, True, None,
    )
    di_prev = state.di_prev
    gi_prev = state.gi_prev
    fr = state.frame

    def chk(r):
        leaves = jax.tree.leaves(r)
        return sum(
            l.astype(jnp.float32).sum() for l in leaves
            if l.dtype != jnp.uint32
        )

    a = DI.di_sampling(scene, cam, surf, jnp.uint32(7), bn1, TN)
    b = DI.di_temporal(scene, cam, surf, state.prev_surface, reproj, a,
                       di_prev, jnp.uint32(8), TN)
    c = DI.di_spatial(scene, cam, surf, b, jnp.uint32(9), fr, TN)

    measure(lambda i: chk(DI.di_sampling(
        scene, cam, surf, i, bn1, TN)), "di_sampling")
    measure(lambda i: chk(DI.di_temporal(
        scene, cam, surf, state.prev_surface, reproj, a, di_prev, i, TN,
    )), "di_temporal")
    measure(lambda i: chk(DI.di_spatial(
        scene, cam, surf, b, i, fr, TN)), "di_spatial")
    measure(lambda i: chk(DI.di_resolving(
        scene, cam, surf, c, sky)), "di_resolving")

    rep, rep_surf = GI.gi_reproject(cam, surf, reproj, gi_prev,
                                    state.prev_surface)
    cand = GI.gi_sampling(scene, cam, surf, rep, jnp.uint32(11),
                          jnp.uint32(12), fr, luts, None, TN)
    t = GI.gi_temporal(scene, cam, surf, state.prev_surface, reproj, cand,
                       rep, jnp.uint32(13), fr, TN, rep_surf)

    measure(lambda i: chk(GI.gi_reproject(
        cam, surf, reproj, gi_prev, state.prev_surface)[0]), "gi_reproject")
    measure(lambda i: chk(GI.gi_sampling(
        scene, cam, surf, rep, i, i + jnp.uint32(1), fr, luts, None, TN,
    )), "gi_sampling")
    measure(lambda i: chk(GI.gi_temporal(
        scene, cam, surf, state.prev_surface, reproj, cand, rep, i, fr,
        TN, rep_surf)), "gi_temporal")
    measure(lambda i: chk(GI.gi_spatial(
        scene, cam, surf, t, i, fr, TN)), "gi_spatial")
    measure(lambda i: chk(GI.gi_preview(
        scene, cam, surf, t, t, i, TN.gi_spatial_radius, TN)), "gi_preview")

    from strolle_tpu.denoise import svgf as SV

    di_sam = jnp.stack([c.w, c.w, c.w], -1)
    measure(lambda i: chk(SV.denoise_pair(
        di_sam + i.astype(jnp.float32) * 1e-6, di_sam, surf, reproj,
        state.di_diff_denoiser, state.gi_diff_denoiser, fr, tuning=TN,
    )[0][0]), "svgf denoise_pair")


if __name__ == "__main__":
    main()
