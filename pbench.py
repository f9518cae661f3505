"""Stage-by-stage profile of the realtime ReSTIR pipeline on TPU.

Thin wrapper over bench.profile_realtime_stages, which uses the honest
measurement protocol (fresh inputs per timed call, median of trials,
sync per stage) — the old per-stage loop here re-dispatched identical
inputs and could be served from a cache through the remote tunnel.

Run: python pbench.py [cornell|dungeon]
"""

from __future__ import annotations

import sys

import jax.numpy as jnp

from bench import dispatch_floor_ms, profile_realtime_stages


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "dungeon"
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.sky.atmosphere import luts_for

    if which == "cornell":
        from strolle_tpu.scene.cornell import cornell_box, cornell_camera

        scene = scene_with_bvh(cornell_box())
        cam = cornell_camera(800, 608)
    else:
        from strolle_tpu.scene.demo import dungeon, dungeon_camera

        scene = scene_with_bvh(dungeon())
        cam = dungeon_camera(800, 608)
    scene = scene.replace(sun_altitude=jnp.asarray(0.35, jnp.float32))
    luts = luts_for(0.35)

    floor = dispatch_floor_ms()
    print(f"dispatch floor: {floor:.2f} ms (per synchronized call)")
    stages = profile_realtime_stages(scene, cam, luts)
    total = sum(stages.values())
    for k, v in stages.items():
        print(f"{k:10s} {v:8.2f} ms")
    print(f"{'sum':10s} {total:8.2f} ms  (whole-frame throughput is "
          f"lower: stages pipeline asynchronously)")


if __name__ == "__main__":
    main()
