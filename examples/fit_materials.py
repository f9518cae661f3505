"""Differentiable rendering demo: recover Cornell wall albedos.

No reference counterpart — this is the TPU rebuild's headline new
capability (SURVEY.md §7.0: the forward pipeline is jax.grad-able
w.r.t. materials/lights). We render a ground-truth Cornell image,
perturb the wall colors + light intensity, and gradient-descend the
photometric loss back to the truth.

Run: python examples/fit_materials.py [--steps 60]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from examples._common import save_png, force_cpu_if


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--out", default=os.path.join("out", "fit_materials"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    force_cpu_if(args.cpu)

    import jax
    import jax.numpy as jnp
    import optax

    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.models.train import (
        apply_params,
        params_from_scene,
        render_loss,
    )
    from strolle_tpu.models.reference import init_accumulator, render_reference
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera

    scene = scene_with_bvh(cornell_box())
    camera = cornell_camera(args.size, args.size)

    # ground truth: a converged-ish reference render
    acc = init_accumulator(camera)
    for s in range(24):
        target, acc = render_reference(
            scene, camera, acc, jnp.uint32(s), depth=3, include_sky=False
        )
    save_png(os.path.join(args.out, "target.png"), target)

    # perturb: wrong wall colors, wrong light intensity
    truth = params_from_scene(scene)
    params = params_from_scene(scene)
    params = params.replace(
        base_color=params.base_color.at[1, :3].set(
            jnp.asarray([0.3, 0.3, 0.5])
        ).at[2, :3].set(jnp.asarray([0.5, 0.2, 0.4])),
        light_color=params.light_color * 0.4,
    )

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, seed):
        loss, grads = jax.value_and_grad(render_loss)(
            params, scene, camera, target, seed
        )
        # this demo fits albedos + light color only; zero the rest so
        # noisy 1-spp gradients don't walk the geometry around
        grads = grads.replace(
            positions=jnp.zeros_like(grads.positions),
            light_pos=jnp.zeros_like(grads.light_pos),
            emissive=jnp.zeros_like(grads.emissive),
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, jnp.uint32(100 + i))
        if i % 10 == 0 or i == args.steps - 1:
            err_red = float(
                jnp.abs(params.base_color[1, :3] - truth.base_color[1, :3]).max()
            )
            err_green = float(
                jnp.abs(params.base_color[2, :3] - truth.base_color[2, :3]).max()
            )
            print(
                f"step {i:3d}  loss {float(loss):.5f}  "
                f"wall-color err red {err_red:.3f} green {err_green:.3f}"
            )

    fitted = apply_params(scene, params)
    acc = init_accumulator(camera)
    for s in range(24):
        img, acc = render_reference(
            fitted, camera, acc, jnp.uint32(s), depth=3, include_sky=False
        )
    save_png(os.path.join(args.out, "fitted.png"), img)
    print(f"wrote {args.out}/{{target,fitted}}.png")


if __name__ == "__main__":
    main()
