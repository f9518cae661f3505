"""The dungeon demo scene.

Counterpart of bevy-strolle/examples/demo.rs: the glb dungeon level
with its point lights, rendered through the real-time ReSTIR pipeline
at the reference's recommended resolution (640x480, demo.rs:24-25).
--mode switches the output channel the way the reference's 1-9 hotkeys
do (_common.rs:70-135).

Run: python examples/demo.py [--frames 48] [--mode gi_diffuse]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._common import FrameTimer, parse_args, save_png, force_cpu_if


def main() -> None:
    args = parse_args("demo", frames=48, width=640, height=480)
    force_cpu_if(args.cpu)

    import jax.numpy as jnp

    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.scene.demo import dungeon, dungeon_camera

    scene = scene_with_bvh(dungeon())
    camera = dungeon_camera(args.width, args.height)

    timer = FrameTimer()

    if args.mode == "reference":
        from strolle_tpu.models.reference import (
            init_accumulator,
            render_reference,
        )

        acc = init_accumulator(camera)
        for f in range(args.frames):
            img, acc = render_reference(
                scene, camera, acc, jnp.uint32(f), depth=3
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
            channels, state = render_frame(
                scene, camera, state, jnp.uint32(f), config
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
