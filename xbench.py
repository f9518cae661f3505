"""Crossover sweep: brute-force megakernel vs packet-BVH kernel.

Measures trace_surface throughput on both strategies across triangle
counts to place BRUTE_FORCE_MAX_TRIS (ops/trace.py) with data instead
of a guess. Runs on the default backend (the real TPU chip under the
driver).

Run: python xbench.py [sizes ...]   (default 1024 2048 4096 8192 16384)
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def soup_scene(n_tris: int, seed: int = 7):
    from strolle_tpu.bvh.builder import build_bvh
    from strolle_tpu.scene.types import (
        Geometry, Scene, make_lights, make_materials,
    )

    rs = np.random.RandomState(seed)
    centers = rs.uniform(-4.0, 4.0, (n_tris, 1, 3)).astype(np.float32)
    verts = centers + rs.uniform(-0.3, 0.3, (n_tris, 3, 3)).astype(np.float32)
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    arrays, order = build_bvh(verts)
    geom = Geometry(
        positions=verts[order],
        normals=np.repeat(n[:, None, :], 3, axis=1)[order],
        uvs=np.zeros((n_tris, 3, 2), np.float32),
        tangents=np.zeros((n_tris, 3, 4), np.float32),
        material_id=np.zeros(n_tris, np.int32),
    )
    scene = Scene(
        geometry=geom,
        materials=make_materials([{}]),
        lights=make_lights([]),
        atlas=None,
        sun_azimuth=jnp.asarray(0.0, jnp.float32),
        sun_altitude=jnp.asarray(-1.0, jnp.float32),
        bvh=arrays,
    )
    from strolle_tpu.bvh import build_clusters

    return scene.replace(clusters=build_clusters(scene))


def rays(w=800, h=608, coherent=True):
    if coherent:
        # camera-style primaries: one origin, smoothly varying dirs
        from strolle_tpu.camera import make_camera, primary_rays

        cam = make_camera((0, 0, 12), (0, 0, 0), width=w, height=h)
        return primary_rays(cam)
    rs = np.random.RandomState(0)
    o = jnp.asarray(rs.uniform(-5, 5, (h, w, 3)).astype(np.float32))
    d = rs.normal(size=(h, w, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, jnp.asarray(d)


def time_strategy(scene, o, d, force: str) -> float:
    """Returns median ms per trace_surface call under the given
    strategy. Protocol (bench.py module docstring): FRESH origin values
    per trial (same-value dispatches can be served from a tunnel
    cache), and the jitted program ends in a scalar checksum fetched
    with float() — `block_until_ready` on a never-fetched result is a
    no-op on the tunneled runtime (the whole chain is elided), so an
    unfetched timing measures enqueue bookkeeping, not the trace."""
    import statistics

    import strolle_tpu.ops.trace as T

    old = T.BRUTE_FORCE_MAX_TRIS
    old_big = T.BIG_SCENE_STRATEGY
    T.BRUTE_FORCE_MAX_TRIS = 10**9 if force == "brute" else 0
    if force in ("cluster", "packet", "stream"):
        T.BIG_SCENE_STRATEGY = force
    try:
        @jax.jit
        def fn(s, o, d):
            t = T.trace_surface(s, o, d).depth
            return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

        rs = np.random.RandomState(11)
        trials = 5
        jits = [
            jax.device_put(
                o + jnp.asarray(rs.uniform(0, 1e-4, o.shape).astype(np.float32))
            )
            for _ in range(trials + 2)
        ]
        for x in jits:
            x.block_until_ready()
        float(fn(scene, jits[0], d))
        float(fn(scene, jits[1], d))
        times = []
        for i in range(2, trials + 2):
            t0 = time.perf_counter()
            float(fn(scene, jits[i], d))
            times.append(time.perf_counter() - t0)
        return statistics.median(times) * 1e3
    finally:
        T.BRUTE_FORCE_MAX_TRIS = old
        T.BIG_SCENE_STRATEGY = old_big


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 16384, 65536, 262144]
    for coherent in (True, False):
        o, d = rays(coherent=coherent)
        n_rays = o.shape[0] * o.shape[1]
        print(("coherent camera rays" if coherent else "incoherent rays")
              + f" ({n_rays} rays)")
        print(f"{'tris':>8} {'brute ms':>9} {'packet ms':>10} "
              f"{'cluster ms':>11} {'stream ms':>10} {'winner':>8} "
              f"{'best Mrays/s':>13}")
        for n in sizes:
            scene = soup_scene(n)
            big = n > 65536
            brute = float("inf") if big else time_strategy(scene, o, d, "brute")
            packet = float("inf") if big else time_strategy(scene, o, d, "packet")
            cluster = float("inf") if big else time_strategy(scene, o, d, "cluster")
            stream = time_strategy(scene, o, d, "stream")
            times = {"brute": brute, "packet": packet, "cluster": cluster,
                     "stream": stream}
            winner = min(times, key=times.get)
            print(f"{n:>8} {brute:>9.2f} {packet:>10.2f} {cluster:>11.2f} "
                  f"{stream:>10.2f} {winner:>8} "
                  f"{n_rays / (times[winner] * 1e-3) / 1e6:>13.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
