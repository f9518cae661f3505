"""Large-scene stress: the full realtime pipeline on a 262k-triangle
scene via the HBM-streaming trace kernels.

The reference targets sub-16k-triangle scenes (demo dungeon: 8.4k);
this example exercises the TPU framework's production-scale path — a
random architectural-soup scene 30x the dungeon, traced through
ops/pallas/stream_kernels.py (scene size bounded by HBM, not VMEM) with
the complete ReSTIR DI+GI + SVGF pipeline on top.

Run: python examples/stress_large.py [--tris 262144] [--frames 16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._common import FrameTimer, save_png


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=262144)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--out", default=os.path.join("out", "stress_large"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from strolle_tpu.bvh.builder import build_bvh
    from strolle_tpu.camera import make_camera
    from strolle_tpu.models.restir import (
        RenderConfig,
        init_state,
        render_frame,
    )
    from strolle_tpu.scene.types import (
        Geometry, Scene, make_lights, make_materials,
    )

    # architectural soup: boxes scattered in a 40x40 city block
    rs = np.random.RandomState(3)
    n = args.tris
    centers = rs.uniform([-20, 0, -20], [20, 8, 20], (n, 1, 3))
    verts = (
        centers + rs.uniform(-0.4, 0.4, (n, 3, 3))
    ).astype(np.float32)
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    arrays, order = build_bvh(verts)
    geom = Geometry(
        positions=verts[order],
        normals=np.repeat(nrm[:, None, :], 3, axis=1)[order],
        uvs=np.zeros((n, 3, 2), np.float32),
        tangents=np.zeros((n, 3, 4), np.float32),
        material_id=(np.arange(n) % 3).astype(np.int32)[order],
    )
    scene = Scene(
        geometry=geom,
        materials=make_materials(
            [
                {"base_color": [0.8, 0.8, 0.8, 1]},
                {"base_color": [0.8, 0.3, 0.2, 1]},
                {"base_color": [0.2, 0.5, 0.8, 1]},
            ]
        ),
        lights=make_lights(
            [
                {"pos": [0, 30, 0], "color": [900, 900, 900], "radius": 2.0},
                {"pos": [15, 12, 15], "color": [400, 350, 250], "radius": 1.0},
            ]
        ),
        atlas=None,
        sun_azimuth=jnp.asarray(0.0, jnp.float32),
        sun_altitude=jnp.asarray(-1.0, jnp.float32),
        bvh=arrays,
    )
    camera = make_camera(
        eye=[28, 14, 28], target=[0, 2, 0],
        width=args.width, height=args.height,
    )

    print(f"{n} triangles; streaming kernels engaged: "
          f"{n > 16384}", flush=True)
    state = init_state(camera)
    cfg = RenderConfig()
    timer = FrameTimer()
    for f in range(args.frames):
        ch, state = render_frame(scene, camera, state, jnp.uint32(f), cfg)
        ch["image"].block_until_ready()
        timer.lap()
        if (f + 1) % 8 == 0 or f == args.frames - 1:
            save_png(os.path.join(args.out, f"frame_{f:04d}.png"), ch["image"])
    print(timer.report(), flush=True)


if __name__ == "__main__":
    main()
