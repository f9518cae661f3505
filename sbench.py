"""Scaling-efficiency harness (BASELINE >=85% 1->4 hosts target).

Measures rays/s of the sharded reference tracer and ms/frame of the
sharded realtime pipeline at 1/2/4/8 devices and prints an efficiency
table. Without multi-chip hardware this runs on a virtual CPU mesh
(--xla_force_host_platform_device_count), which validates the
collective structure and gives the measurement path for the day real
chips appear; CPU-mesh wall-times share the same physical cores, so
treat the efficiency column as a smoke number there.

Run: python sbench.py [n_devices ...]    (default: 1 2 4 8)
Each device count runs in a subprocess (the XLA device-count flag is
process-wide).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = """
import os, sys, time, json
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=%(n)d"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import numpy as np, jax.numpy as jnp

from strolle_tpu.scene.cornell import cornell_box, cornell_camera
from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.parallel.sharding import make_mesh, render_sample_sharded
from strolle_tpu.parallel.frame_sharding import (
    init_state_sharded, render_frame_sharded, replicate_scene,
)
from strolle_tpu.models.restir import RenderConfig

n = %(n)d
W, H, DEPTH, FRAMES = 256, 256, 3, 4
mesh = make_mesh(n)
scene = scene_with_bvh(cornell_box())
cam = cornell_camera(W, H)

img = render_sample_sharded(mesh, scene, cam, jnp.uint32(0), DEPTH, False)
img.block_until_ready()
t0 = time.perf_counter()
for f in range(FRAMES):
    img = render_sample_sharded(mesh, scene, cam, jnp.uint32(f + 1), DEPTH, False)
img.block_until_ready()
dt = time.perf_counter() - t0
rays = W * H * (DEPTH + 1) * 2 * FRAMES
ref_rays_s = rays / dt

scene_rep = replicate_scene(mesh, scene)
state = init_state_sharded(mesh, cam)
cfg = RenderConfig()
ch, state = render_frame_sharded(mesh, scene_rep, cam, state, jnp.uint32(0), cfg)
ch["image"].block_until_ready()
t0 = time.perf_counter()
for f in range(FRAMES):
    ch, state = render_frame_sharded(
        mesh, scene_rep, cam, state, jnp.uint32(f + 1), cfg)
ch["image"].block_until_ready()
rt_ms = (time.perf_counter() - t0) / FRAMES * 1e3

print(json.dumps({"n": n, "ref_rays_s": ref_rays_s, "rt_ms": rt_ms}))
"""


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--out")]
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    counts = [int(a) for a in args] or [1, 2, 4, 8]
    repo = os.path.dirname(os.path.abspath(__file__))
    rows = []
    for n in counts:
        code = _CHILD % {"n": n, "repo": repo}
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rows.append(json.loads(line))
        except Exception:
            print(f"n={n} FAILED:\n{out.stderr[-2000:]}", file=sys.stderr)
            raise SystemExit(1)

    base = rows[0]
    table = []
    print(f"{'devices':>8} {'ref Mrays/s':>12} {'eff%':>6} "
          f"{'realtime ms':>12} {'eff%':>6}")
    for r in rows:
        scale = r["n"] / base["n"]
        ref_eff = r["ref_rays_s"] / (base["ref_rays_s"] * scale) * 100
        rt_eff = base["rt_ms"] / (r["rt_ms"] * scale) * 100
        table.append({**r, "ref_eff_pct": round(ref_eff, 1),
                      "rt_eff_pct": round(rt_eff, 1)})
        print(
            f"{r['n']:>8} {r['ref_rays_s'] / 1e6:>12.2f} {ref_eff:>5.0f}% "
            f"{r['rt_ms']:>12.2f} {rt_eff:>5.0f}%"
        )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "note": (
                        "virtual CPU mesh (xla_force_host_platform_"
                        "device_count) on shared physical cores — the "
                        "efficiency column validates the collective "
                        "structure, NOT real scaling; real-chip "
                        "measurement needs a pod (BASELINE >=85% target)"
                    ),
                    "physical_cpus": os.cpu_count(),
                    "rows": table,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
