"""Dynamic block building on a voxel grid.

Counterpart of bevy-strolle/examples/minecraft.rs (place/remove blocks
at runtime): every few frames a new block is inserted through the
SceneEditor, forcing geometry + BVH refresh — this exercises the
dynamic-scene path (Engine::{insert,remove}_instance + tick,
strolle/src/lib.rs:160-245,301-395).

Run: python examples/minecraft.py [--frames 48]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from examples._common import FrameTimer, parse_args, save_png, force_cpu_if

GRASS, DIRT, STONE, LAMP = 1, 2, 3, 4


def box_triangles(center, size=1.0) -> np.ndarray:
    """Axis-aligned cube as a [12, 3, 3] triangle soup with outward
    CCW winding."""
    cx, cy, cz = center
    h = size / 2.0
    v = np.asarray(
        [
            [cx - h, cy - h, cz - h], [cx + h, cy - h, cz - h],
            [cx + h, cy + h, cz - h], [cx - h, cy + h, cz - h],
            [cx - h, cy - h, cz + h], [cx + h, cy - h, cz + h],
            [cx + h, cy + h, cz + h], [cx - h, cy + h, cz + h],
        ],
        np.float32,
    )
    quads = [
        (4, 5, 6, 7),  # +z
        (1, 0, 3, 2),  # -z
        (5, 1, 2, 6),  # +x
        (0, 4, 7, 3),  # -x
        (7, 6, 2, 3),  # +y
        (0, 1, 5, 4),  # -y
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append([v[a], v[b], v[c]])
        tris.append([v[a], v[c], v[d]])
    return np.asarray(tris, np.float32)


def main() -> None:
    args = parse_args("minecraft", frames=48, width=512, height=384)
    force_cpu_if(args.cpu)

    import jax.numpy as jnp

    from strolle_tpu.models.restir import RenderConfig, init_state, render_frame
    from strolle_tpu.scene.dynamics import SceneEditor
    from strolle_tpu.camera import make_camera

    materials = [
        {"base_color": [0.8, 0.8, 0.8, 1.0], "roughness": 1.0},  # 0 unused
        {"base_color": [0.30, 0.65, 0.25, 1.0], "roughness": 1.0},  # grass
        {"base_color": [0.45, 0.30, 0.18, 1.0], "roughness": 1.0},  # dirt
        {"base_color": [0.55, 0.55, 0.58, 1.0], "roughness": 0.8},  # stone
        {
            "base_color": [1.0, 0.9, 0.6, 1.0],
            "emissive": [4.0, 3.5, 2.0, 1.0],
        },  # lamp
    ]
    editor = SceneEditor(
        materials=materials, light_capacity=8, sun_altitude=0.5, sun_azimuth=0.7
    )
    editor.insert_light(
        "torch", pos=[0.0, 4.0, 4.0], radius=0.1, color=[12.0, 10.0, 7.0]
    )

    # ground slab 8x8
    rng = np.random.default_rng(7)
    for x in range(-4, 4):
        for z in range(-4, 4):
            editor.insert_instance(
                ("ground", x, z), box_triangles((x + 0.5, -0.5, z + 0.5)),
                material_id=GRASS if rng.random() < 0.8 else DIRT,
            )

    camera = make_camera(
        eye=[7.0, 6.0, 9.0],
        target=[0.0, 1.0, 0.0],
        fov_y=np.deg2rad(50.0),
        width=args.width,
        height=args.height,
    )

    # a little tower gets built one block per 2 frames, then torn down
    plan = [(0, y, 0) for y in range(5)] + [(1, 0, 0), (0, 0, 1), (1, 4, 0)]
    config = RenderConfig(denoise=not args.no_denoise, include_sky=True)
    state = init_state(camera)
    timer = FrameTimer()

    from strolle_tpu.sky.atmosphere import luts_for

    placed: list[tuple] = []
    for f in range(args.frames):
        if f % 2 == 0 and f // 2 < len(plan):
            x, y, z = plan[f // 2]
            handle = ("block", x, y, z)
            mat = LAMP if y == 4 else STONE
            editor.insert_instance(
                handle, box_triangles((x + 0.5, y + 0.5, z + 0.5)),
                material_id=mat,
            )
            placed.append(handle)
        elif f % 7 == 6 and placed:
            editor.remove_instance(placed.pop(0))

        scene = editor.tick()
        luts = luts_for(scene.sun_altitude)
        channels, state = render_frame(
            scene, camera, state, jnp.uint32(f), config, luts=luts
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
