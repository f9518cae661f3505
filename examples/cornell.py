"""Cornell box with an orbiting point light.

Counterpart of bevy-strolle/examples/cornell.rs:60-93 (Cornell scene,
sun disabled, one point light orbiting on a circle). Renders with the
real-time ReSTIR model by default; --mode reference uses the
path-traced ground-truth accumulator instead.

Run: python examples/cornell.py [--frames 64] [--mode image]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from examples._common import FrameTimer, parse_args, save_png, force_cpu_if


def main() -> None:
    args = parse_args("cornell", frames=64, width=512, height=512)
    force_cpu_if(args.cpu)

    import jax.numpy as jnp

    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera

    scene = scene_with_bvh(cornell_box())
    camera = cornell_camera(args.width, args.height)

    def light_pos(frame: int) -> np.ndarray:
        # cornell.rs:78-88: light orbits around the box center
        a = frame * 0.05
        return np.asarray(
            [0.6 * np.cos(a), 1.7, 0.6 * np.sin(a)], np.float32
        )

    timer = FrameTimer()

    if args.mode == "reference":
        from strolle_tpu.models.reference import (
            init_accumulator,
            render_reference,
        )

        acc = init_accumulator(camera)
        for f in range(args.frames):
            img, acc = render_reference(
                scene, camera, acc, jnp.uint32(f), depth=4, include_sky=False
            )
            img.block_until_ready()
            timer.lap()
            if (f + 1) % args.save_every == 0 or f == args.frames - 1:
                save_png(os.path.join(args.out, f"frame_{f:04d}.png"), img)
    else:
        from strolle_tpu.models.restir import (
            RenderConfig,
            init_state,
            render_frame,
        )

        config = RenderConfig(denoise=not args.no_denoise)
        state = init_state(camera)
        for f in range(args.frames):
            pos = light_pos(f)
            prev = light_pos(f - 1)
            lights = scene.lights.replace(
                pos=scene.lights.pos.at[0].set(jnp.asarray(pos)),
                prev_pos=scene.lights.prev_pos.at[0].set(jnp.asarray(prev)),
            )
            frame_scene = scene.replace(lights=lights)
            channels, state = render_frame(
                frame_scene, camera, state, jnp.uint32(f), config
            )
            img = channels[args.mode]
            img.block_until_ready()
            timer.lap()
            if (f + 1) % args.save_every == 0 or f == args.frames - 1:
                save_png(os.path.join(args.out, f"frame_{f:04d}.png"), img)

    print(timer.report())
    print(f"wrote {args.out}/frame_*.png")


if __name__ == "__main__":
    main()
