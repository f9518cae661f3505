"""Fine-grained profile of the dungeon trace path (dev bench).

Times each layer of the trace stack alone under the marginal-chain
materialized protocol: a jitted fori_loop runs the op n times with an
iteration-dependent perturbation (so XLA cannot CSE the calls), ends in
a fetched checksum, and the per-call cost is the marginal between two
chain lengths (cancels the host sync round-trip).

Run: python tprof.py [dungeon|cornell]
"""

from __future__ import annotations

import statistics
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TRIALS = 3


def marginal_ms(make_step, n_short=2, n_long=8):
    """make_step() -> (step_fn, init_carry); step(i, carry) -> carry.
    Returns per-call ms."""
    step, init = make_step()

    @partial(jax.jit, static_argnames=("n",))
    def chain(init, n):
        c = jax.lax.fori_loop(0, n, step, init)
        return jax.tree.leaves(c)[0].sum()

    float(chain(init, n_short))  # compile
    float(chain(init, n_long))

    def run(n):
        t0 = time.perf_counter()
        float(chain(init, n))
        return time.perf_counter() - t0

    short = [run(n_short) for _ in range(TRIALS)]
    long = [run(n_long) for _ in range(TRIALS)]
    ms = statistics.median(short)
    ml = statistics.median(long)
    return (ml - ms) / (n_long - n_short) * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "dungeon"
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.camera import pixel_rays, screen_grid

    if which == "cornell":
        from strolle_tpu.scene.cornell import cornell_box, cornell_camera

        scene = scene_with_bvh(cornell_box())
        cam = cornell_camera(800, 608)
    else:
        from strolle_tpu.scene.demo import dungeon, dungeon_camera

        scene = scene_with_bvh(dungeon())
        cam = dungeon_camera(800, 608)

    print(f"scene: {which}  tris={scene.geometry.num_triangles} "
          f"has_alpha={scene.has_alpha} atlas={scene.atlas is not None}")

    grid = screen_grid(cam)
    o0, d0 = pixel_rays(cam, grid)
    o0 = jax.device_put(o0).block_until_ready()
    d0 = jax.device_put(d0).block_until_ready()
    scene = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)) if hasattr(x, "shape") else x,
        scene,
        is_leaf=lambda x: hasattr(x, "shape"),
    )

    from strolle_tpu.ops import trace as T

    def perturb(i, o):
        return o + (i.astype(jnp.float32) * 1e-6)

    # 1. one stream-kernel closest pass (opaque dispatch, no alpha loop)
    def mk_opaque():
        def step(i, carry):
            o = perturb(i, o0)
            hit = T._trace_closest_opaque(scene, o, d0)
            return carry + hit.t.sum() * 0 + jnp.float32(1) * (
                jnp.nan_to_num(hit.t, posinf=0.0).sum() * 1e-12)
        return step, jnp.float32(0)

    print(f"opaque closest pass      {marginal_ms(mk_opaque):8.2f} ms")

    # 2. alpha sampling of a hit (gathers + texture)
    def mk_alpha():
        hit = T._trace_closest_opaque(scene, o0, d0)
        hit = jax.tree.map(jax.device_put, hit)

        def step(i, carry):
            h = hit._replace_t(i) if False else hit
            a = T._hit_alpha(scene, hit)
            return carry + a.sum() * (1e-12 + i.astype(jnp.float32) * 0)
        return step, jnp.float32(0)

    print(f"hit_alpha gathers        {marginal_ms(mk_alpha):8.2f} ms")

    # 3. full trace_closest (with alpha restart loop)
    def mk_closest():
        def step(i, carry):
            o = perturb(i, o0)
            hit = T.trace_closest(scene, o, d0)
            return carry + jnp.nan_to_num(hit.t, posinf=0.0).sum() * 1e-12
        return step, jnp.float32(0)

    print(f"trace_closest (full)     {marginal_ms(mk_closest):8.2f} ms")

    # 4. surface_at on top of a hit
    def mk_surface_at():
        from strolle_tpu.ops.hit import surface_at

        hit = T.trace_closest(scene, o0, d0)
        hit = jax.tree.map(jax.device_put, hit)

        def step(i, carry):
            s = surface_at(scene, o0 + i.astype(jnp.float32) * 0, d0, hit)
            return carry + s.base_color.sum() * 1e-12
        return step, jnp.float32(0)

    print(f"surface_at gathers       {marginal_ms(mk_surface_at):8.2f} ms")

    # 5. full trace_surface
    def mk_surface():
        def step(i, carry):
            o = perturb(i, o0)
            s = T.trace_surface(scene, o, d0)
            return carry + s.base_color.sum() * 1e-12
        return step, jnp.float32(0)

    print(f"trace_surface (full)     {marginal_ms(mk_surface):8.2f} ms")

    # 6. trace_anyhit
    def mk_anyhit():
        tmax = jnp.full(o0.shape[:-1], 10.0)

        def step(i, carry):
            o = perturb(i, o0)
            occ = T.trace_anyhit(scene, o, d0, tmax)
            return carry + occ.sum().astype(jnp.float32) * 1e-12
        return step, jnp.float32(0)

    print(f"trace_anyhit (full)      {marginal_ms(mk_anyhit):8.2f} ms")


if __name__ == "__main__":
    main()


def frame_variants(which="dungeon"):
    """Times the full reference frame in ablation variants."""
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.models.reference import trace_sample
    from strolle_tpu.sky.atmosphere import luts_for

    if which == "cornell":
        from strolle_tpu.scene.cornell import cornell_box, cornell_camera

        scene = scene_with_bvh(cornell_box())
        cam = cornell_camera(800, 608)
    else:
        from strolle_tpu.scene.demo import dungeon, dungeon_camera

        scene = scene_with_bvh(dungeon())
        cam = dungeon_camera(800, 608)
    scene = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x)) if hasattr(x, "shape") else x,
        scene,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
    luts = luts_for(float(scene.sun_altitude))
    luts = jax.tree.map(jax.device_put, luts)

    def mk(depth, include_sky, use_luts):
        def thunk():
            def step(i, carry):
                c = trace_sample(
                    scene, cam, jnp.uint32(7) + i.astype(jnp.uint32),
                    depth=depth, include_sky=include_sky,
                    luts=luts if use_luts else None,
                )
                return carry + c.sum() * 1e-9
            return step, jnp.float32(0)
        return thunk

    for name, depth, sky, use_luts in [
        ("d4 sky+luts", 4, True, True),
        ("d4 sky analytic-off(no luts)", 4, True, False),
        ("d4 no sky", 4, False, False),
        ("d1 sky+luts", 1, True, True),
        ("d0 sky+luts", 0, True, True),
    ]:
        try:
            ms = marginal_ms(mk(depth, sky, use_luts), n_short=1, n_long=4)
            print(f"frame {name:30s} {ms:8.2f} ms")
        except Exception as e:
            print(f"frame {name:30s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__" and "frames" in sys.argv:
    pass
