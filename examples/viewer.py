"""Interactive viewer: live render loop + browser debug UI.

The TPU-native answer to the reference's windowed examples with their
egui debug overlay (bevy-strolle/src/debug.rs) and camera-mode hotkeys
(_common.rs:70-135): the render loop runs here (next to the device),
the UI is served over HTTP so it works through an SSH tunnel to a TPU
VM.

Run:  python examples/viewer.py [--scene cornell|dungeon] [--port 8000]
then open http://127.0.0.1:8000/ — keys 0-8 switch channels, drag to
orbit, wheel to dolly; sliders drive sun + light intensity live.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="strolle_tpu interactive viewer")
    ap.add_argument("--scene", choices=["cornell", "dungeon"], default="cornell")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--mode", default="image")
    ap.add_argument("--frames", type=int, default=None,
                    help="stop after N frames (default: run forever)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.viewer import Viewer

    if args.scene == "cornell":
        from strolle_tpu.scene.cornell import cornell_box, cornell_camera

        scene = scene_with_bvh(cornell_box())
        camera = cornell_camera(args.width, args.height)
        target, fov = (0.0, 1.0, 0.0), np.deg2rad(45.0)
        include_sky = False
    else:
        from strolle_tpu.scene.demo import dungeon, dungeon_camera

        scene = scene_with_bvh(dungeon())
        camera = dungeon_camera(args.width, args.height)
        target, fov = (0.0, 0.8, 0.0), np.deg2rad(55.0)
        include_sky = True

    viewer = Viewer(
        scene, camera, mode=args.mode, target=target, fov_y=fov,
        include_sky=include_sky,
    )
    port = viewer.start_server(host=args.host, port=args.port)
    print(f"viewer: http://{args.host}:{port}/  (Ctrl-C to stop)", flush=True)
    viewer.run(max_frames=args.frames)
    viewer.stop_server()


if __name__ == "__main__":
    main()
