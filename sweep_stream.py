"""S_SUBLANES sweep for the stream kernel under the device-resident
materialized protocol (run per-config in subprocesses: module consts)."""
import json, os, subprocess, sys

CHILD = """
import time, statistics, json
import numpy as np, jax, jax.numpy as jnp
import strolle_tpu.ops.pallas.stream_kernels as SK
SK.S_SUBLANES = %(s)d
SK.S_TILE = SK.S_SUBLANES * 128
SK.BLOCK_H = %(bh)d
SK.BLOCK_W = %(bw)d
from xbench import soup_scene, rays
from strolle_tpu.ops.trace import trace_surface
scene = soup_scene(262144)
o, d = rays(coherent=True)
scene = jax.tree.map(jax.device_put, scene)
jax.block_until_ready(jax.tree.leaves(scene))

@jax.jit
def fn(s, oo, dd):
    t = trace_surface(s, oo, dd).depth
    return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

rs = np.random.RandomState(7)
jits = [jax.device_put(o + jnp.asarray(rs.uniform(0, 1e-4, o.shape).astype(np.float32))) for _ in range(7)]
for x in jits: x.block_until_ready()
float(fn(scene, jits[0], d)); float(fn(scene, jits[1], d))
ts = []
for i in range(2, 7):
    t0 = time.perf_counter(); float(fn(scene, jits[i], d)); ts.append(time.perf_counter()-t0)
print(json.dumps({"ms": statistics.median(ts)*1e3}))
"""

for s, bh, bw in [(8, 32, 32), (16, 32, 64), (32, 64, 64), (64, 64, 128)]:
    code = CHILD % {"s": s, "bh": bh, "bw": bw}
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=560, cwd=os.path.dirname(os.path.abspath(__file__)))
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else out.stderr.strip().splitlines()[-1]
        print(f"S_SUBLANES={s:3d} block {bh}x{bw}: {line}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"S_SUBLANES={s:3d}: timeout", flush=True)
