"""Headline benchmark: Mrays/s/chip on the 800x600 reference path tracer,
plus the dungeon scene (textures path), the realtime ReSTIR+SVGF
pipeline (with per-stage breakdown), and the 262k-tri HBM-streaming
large-scene path — all gated by an on-chip correctness check.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. The
headline value stays the Cornell reference-mode Mrays/s so vs_baseline
is comparable across rounds (BENCH_r*.json); all other measurements are
embedded in the metric string.

Measurement protocol (round 4, revised twice — the round-3 numbers
were mutually contradictory, and the first round-4 protocol was still
wrong):
* **every timed computation must END IN A VALUE FETCHED TO HOST**
  (float() of a jitted scalar reduction, or np.asarray of an output).
  On the tunneled axon runtime `block_until_ready()` returns without
  executing anything when no result is ever consumed — the whole
  dispatch graph (h2d uploads included) is deferred/elided, and
  "timings" of unfetched programs measure enqueue bookkeeping only
  (observed: the 262k-soup trace "ran" in 0.1 ms blocked-but-unfetched
  vs 56 ms with a fetched checksum; the realtime pipeline "ran" at
  2.8 ms/frame unfetched vs ~4200 ms/frame with the image actually
  materialized — the latter matches the per-take gather cost times the
  take count, so it is the real device time);
* every timed dispatch gets FRESH input values — repeated same-value
  executions can be served from a cache through the tunnel;
* frames are CHAINED inside one jit where possible (lax.fori_loop) so
  the ~23 ms host sync round-trip amortizes; per-frame cost is the
  MARGINAL cost between two chain lengths, not total/n;
* median of >=3 trials, spread reported; the sync round-trip floor is
  measured with a null program (fetched!) and reported;
* before timing, the big-scene kernel output is asserted against the
  jnp BVH traversal ON THE CHIP — a Mosaic miscompile fails the bench
  loudly instead of producing a fast wrong number.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

_cache_dir = os.environ.get(
    "STROLLE_JAX_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_strolle_tpu"),
)
try:  # best-effort: a read-only home must not kill the bench
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except OSError:
    pass

WIDTH, HEIGHT = 800, 608  # 800x600 rounded to row-tile multiple
DEPTH = 4  # bounces after the primary hit
FRAMES = 8
HD_WIDTH, HD_HEIGHT = 1920, 1088  # 1080p rounded to row-tile multiple

TRIALS = 5


def rays_per_frame(width: int, height: int, depth: int) -> int:
    """Traced ray segments per frame in reference mode: per bounce one
    closest-hit + one NEE shadow ray (camera_controller.rs:101-111
    dispatches trace+shade per bounce)."""
    return width * height * (depth + 1) * 2


def _median_spread(times):
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med > 0 else 0.0
    return med, spread


def dispatch_floor_ms() -> float:
    """Round-trip cost of one trivial dispatch + 4-byte readback —
    the floor under every per-frame number on the tunneled chip."""

    @jax.jit
    def null(x):
        return x.sum()

    xs = [jnp.full((8, 128), float(i), jnp.float32) for i in range(TRIALS + 1)]
    for x in xs:
        x.block_until_ready()
    float(null(xs[0]))
    times = []
    for i in range(1, TRIALS + 1):
        t0 = time.perf_counter()
        float(null(xs[i]))
        times.append(time.perf_counter() - t0)
    return statistics.median(times) * 1e3


def bench_reference(scene, camera, depth=DEPTH, frames=FRAMES,
                    include_sky=False):
    """True per-frame cost of the reference tracer: frames chained
    INSIDE one jit (fori_loop over the accumulator carry) ending in a
    fetched checksum, measured at two chain lengths; per-frame cost is
    the marginal (t_long - t_short) / (n_long - n_short), which cancels
    the host sync round-trip."""
    from functools import partial

    from strolle_tpu.models.reference import render_reference, init_accumulator

    @partial(jax.jit, static_argnames=("n",))
    def chain(scene, acc, seed0, n):
        def body(i, acc):
            _img, acc = render_reference(
                scene, camera, acc, seed0 + i.astype(jnp.uint32),
                depth=depth, include_sky=include_sky,
            )
            return acc
        acc = jax.lax.fori_loop(0, n, body, acc)
        return jax.tree.leaves(acc)[0].sum()

    acc0 = init_accumulator(camera)
    n_short, n_long = frames, 4 * frames

    def run(n, seed0):
        t0 = time.perf_counter()
        float(chain(scene, acc0, jnp.uint32(seed0), n))
        return time.perf_counter() - t0

    float(chain(scene, acc0, jnp.uint32(0), n_short))  # compile
    float(chain(scene, acc0, jnp.uint32(1), n_long))
    short = [run(n_short, 10 + i) for i in range(TRIALS)]
    long = [run(n_long, 100 + i) for i in range(TRIALS)]
    med_s, _ = _median_spread(short)
    med_l, spread = _median_spread(long)
    if med_l <= 1.1 * med_s:
        # advisor r4: a silent clamp here let an elided dispatch chain
        # print an absurd Mrays/s instead of failing loudly
        raise RuntimeError(
            f"bench_reference: long chain {med_l*1e3:.1f} ms not > short "
            f"{med_s*1e3:.1f} ms * 1.1 — dispatch elision suspected"
        )
    per_frame = (med_l - med_s) / (n_long - n_short)
    ms = per_frame * 1e3
    mrays = rays_per_frame(camera.width, camera.height, depth) / per_frame / 1e6
    return mrays, ms, spread


def bench_realtime(scene, camera, frames=3, include_sky=False, luts=None,
                   trials=2):
    """True per-frame cost of the realtime pipeline: the production
    FUSED frame program (render_frame_fused, one dispatch per frame),
    frames chained from the host with the final image MATERIALIZED
    (np.asarray) per trial — the d2h fetch forces the chain to actually
    execute (module docstring). Per-frame cost is the marginal between
    two chain lengths, which cancels the host sync round-trip
    (advisor r4 finding on the old total/frames estimate)."""
    from strolle_tpu.models.restir import (
        RenderConfig, init_state, render_frame_fused,
    )
    from strolle_tpu.sky.atmosphere import luts_for

    if luts is None:
        luts = luts_for(float(scene.sun_altitude))
    cfg = RenderConfig(include_sky=include_sky)
    state0 = init_state(camera)

    def chain(n, f0):
        f = f0
        state = state0
        t0 = time.perf_counter()
        for _ in range(n):
            f += 1
            ch, state = render_frame_fused(
                scene, camera, state, jnp.uint32(f), cfg, luts
            )
        np.asarray(ch["image"])
        return time.perf_counter() - t0

    n_short, n_long = frames, 3 * frames
    chain(1, 0)  # compile + force real execution mode
    chain(n_long, 1000)
    short = [chain(n_short, 2000 + 100 * i) for i in range(trials)]
    long = [chain(n_long, 5000 + 100 * i) for i in range(trials)]
    med_s, _ = _median_spread(short)
    med_l, spread = _median_spread(long)
    if med_l <= 1.1 * med_s:
        # the long chain must cost measurably more than the short one;
        # anything else means the runtime elided work again (the exact
        # artifact the materialized protocol exists to catch)
        raise RuntimeError(
            f"bench_realtime: long chain {med_l*1e3:.1f} ms not > short "
            f"{med_s*1e3:.1f} ms * 1.1 — dispatch elision suspected"
        )
    return (med_l - med_s) / (n_long - n_short) * 1e3, spread


def profile_realtime_stages(scene, camera, luts):
    """Per-stage synchronized wall times (ms) for the realtime frame.

    Each stage program is timed alone with fresh seed/frame inputs and
    a block_until_ready per call, so the result is (device time +
    dispatch floor) per stage — the sum exceeds the pipelined
    whole-frame time, which is the point: the realtime ms/frame is a
    THROUGHPUT number over async-chained stage dispatches."""
    from strolle_tpu.models import restir as R

    cfg = R.RenderConfig(include_sky=True)
    state = R.init_state(camera)
    # one real frame for representative inputs
    ch, state = R.render_frame(scene, camera, state, jnp.uint32(0), cfg,
                               luts=luts)
    jax.block_until_ready(ch["image"])
    tuning = cfg.tuning

    # fetch a 4-byte jitted checksum of the synced leaf: unfetched
    # results are elided by the tunnel (module docstring), and a full
    # np.asarray would add MBs of d2h to every stage time
    checksum = jax.jit(lambda x: x.sum())

    def timeit(fn, sync):
        fn(1)  # warm
        float(checksum(sync(fn(2))))
        ts = []
        for i in range(3, 3 + TRIALS):
            t0 = time.perf_counter()
            float(checksum(sync(fn(i))))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts) * 1e3

    out = {}
    prelude = R._stage_prelude(
        scene, camera, state.prev_camera, state.prev_surface,
        state.frame, luts, True, None,
    )
    surf, reproj, sky, bn1, bn2 = prelude
    out["prelude"] = timeit(
        lambda i: R._stage_prelude(
            scene, camera, state.prev_camera, state.prev_surface,
            state.frame + i, luts, True, None,
        ),
        lambda r: r[0].depth,
    )
    out["di"] = timeit(
        lambda i: R._stage_di(
            scene, camera, surf, state.prev_surface, reproj,
            state.di_prev, jnp.uint32(100 + i), state.frame + i, bn1, sky,
            tuning,
        ),
        lambda r: r[0],
    )
    out["gi"] = timeit(
        lambda i: R._stage_gi(
            scene, camera, surf, state.prev_surface, reproj,
            state.gi_prev, jnp.uint32(200 + i), state.frame + i, bn2, luts,
            None, tuning,
        ),
        lambda r: r[0],
    )
    di_diff, _, _ = R._stage_di(
        scene, camera, surf, state.prev_surface, reproj, state.di_prev,
        jnp.uint32(7), state.frame, bn1, sky, tuning,
    )
    out["svgf"] = timeit(
        lambda i: R._stage_denoise(
            di_diff, surf, reproj, state.di_diff_denoiser,
            state.frame + i, "di", tuning,
        ),
        lambda r: r[0],
    )
    out["compose"] = timeit(
        lambda i: R._stage_compose(
            surf, di_diff[..., :3] * (1.0 + 1e-6 * i), di_diff[..., :3],
            di_diff, di_diff,
        ),
        lambda r: r["image"],
    )
    return out


def gate_big_scene(scene, o, d) -> None:
    """On-chip correctness gate (VERDICT r3 #4): the production
    large-scene kernel must agree with the jnp BVH traversal on a ray
    slice ON THE DEVICE before any timing is recorded.

    Both sides run JITTED: calling the trace paths eagerly dispatches
    hundreds of tiny ops through the axon runtime, which permanently
    degrades every subsequent dispatch in the process (measured:
    reference bench 10889 -> 686 Mrays/s after ONE eager trace)."""
    from strolle_tpu.bvh.traverse import trace_closest_bvh
    from strolle_tpu.ops.trace import trace_surface

    sl = (slice(0, 8), slice(0, 128))
    kfn = jax.jit(lambda s, oo, dd: trace_surface(s, oo, dd))
    rfn = jax.jit(lambda s, oo, dd: trace_closest_bvh(s, oo, dd))
    surf = kfn(scene, o[sl], d[sl])
    ref = rfn(scene, o[sl], d[sl])
    tri_k = np.asarray(surf.tri)
    tri_r = np.asarray(ref.tri)
    agree = (tri_k == tri_r).mean()
    if agree < 0.999:
        print(
            json.dumps(
                {
                    "metric": "CORRECTNESS GATE FAILED: big-scene kernel "
                    f"disagrees with jnp traversal on {1 - agree:.2%} of rays",
                    "value": 0.0,
                    "unit": "Mrays/s",
                    "vs_baseline": 0.0,
                }
            )
        )
        raise SystemExit(1)
    t_k = np.asarray(surf.depth)[tri_k >= 0]
    t_r = np.asarray(ref.t)[tri_k >= 0]
    assert np.allclose(t_k, t_r, rtol=1e-3, atol=1e-3), "gate: t mismatch"


def gate_small_scene(scene, camera) -> None:
    """Megakernel/fused-surface path vs the jnp fallback, on-chip."""
    from strolle_tpu.camera import pixel_rays, screen_grid
    from strolle_tpu.ops.trace import trace_surface

    grid = screen_grid(camera)
    o, d = pixel_rays(camera, grid)
    sl = (slice(0, 8), slice(0, 128))
    # jitted: see gate_big_scene — eager traces poison the process
    pfn = jax.jit(lambda s, oo, dd: trace_surface(s, oo, dd, use_pallas=True))
    jfn = jax.jit(lambda s, oo, dd: trace_surface(s, oo, dd, use_pallas=False))
    a = pfn(scene, o[sl], d[sl])
    b = jfn(scene, o[sl], d[sl])
    assert (np.asarray(a.tri) == np.asarray(b.tri)).mean() > 0.999, (
        "gate: fused surface kernel disagrees with jnp path"
    )


def bench_big_scene(scene, o, d, floor_ms=0.0):
    """Large-scene trace timing, split into KERNEL time and the
    one-time scene UPLOAD (VERDICT r4 task: the round-4 number rode a
    ~30 MB host-numpy h2d inside every timed dispatch because of the
    since-refuted claim that committed device arrays degrade dispatch
    — probe_runtime.py r5: they don't, and production frames keep the
    scene device-resident). The jitted program still ends in a fetched
    checksum (enqueue-only timing is async and measures nothing).

    Returns (mrays, kernel_ms, spread, upload_ms)."""
    from strolle_tpu.ops.trace import trace_surface

    @jax.jit
    def fn(s, oo, dd):
        t = trace_surface(s, oo, dd).depth
        return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))

    # one-time scene h2d, measured alone (the upload floor)
    t0 = time.perf_counter()
    scene_dev = jax.tree.map(jax.device_put, scene)
    jax.block_until_ready(jax.tree.leaves(scene_dev))
    upload_ms = (time.perf_counter() - t0) * 1e3

    rs = np.random.RandomState(7)
    jits = [
        jax.device_put(
            o + jnp.asarray(rs.uniform(0, 1e-4, o.shape).astype(np.float32))
        )
        for _ in range(TRIALS + 2)
    ]
    for x in jits:
        x.block_until_ready()
    float(fn(scene_dev, jits[0], d))
    float(fn(scene_dev, jits[1], d))
    times = []
    for i in range(2, TRIALS + 2):
        t0 = time.perf_counter()
        float(fn(scene_dev, jits[i], d))
        times.append(time.perf_counter() - t0)
    med, spread = _median_spread(times)
    if med <= floor_ms * 1e-3:
        raise RuntimeError(
            f"bench_big_scene: measured {med*1e3:.2f} ms under the "
            f"{floor_ms:.1f} ms sync floor — dispatch elision suspected"
        )
    med = med - floor_ms * 1e-3
    return o.shape[0] * o.shape[1] / med / 1e6, med * 1e3, spread, upload_ms


def _p(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Sections. Each runs in its OWN subprocess (fresh tunnel connection):
# a single long-lived process reproducibly wedges the remote-chip relay
# after a few hundred dispatches (observed: the 1080p section hangs with
# zero CPU progress in a process that has already run the full Cornell +
# dungeon sections, but completes in ~3 min alone). The persistent
# compilation cache keeps per-section compile costs near zero.
# ---------------------------------------------------------------------------


def section_floor():
    return {"floor_ms": dispatch_floor_ms()}


def section_gates():
    """Correctness gates in their own process: the jnp-fallback trace
    program degrades every subsequent dispatch in the process on the
    axon runtime (measured: reference bench 10889 -> 698 Mrays/s after
    one gate call, jitted or eager), so gates must never share a
    process with a timing section."""
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera
    from strolle_tpu.bvh import scene_with_bvh

    _p("small gate")
    cornell = scene_with_bvh(cornell_box())
    gate_small_scene(cornell, cornell_camera(WIDTH, HEIGHT))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xbench import rays as xrays, soup_scene

    _p("big gate")
    big = soup_scene(262144)
    o, d = xrays(coherent=True)
    gate_big_scene(big, o, d)
    return {"gates": "ok"}


def section_cornell():
    from strolle_tpu.scene.cornell import cornell_box, cornell_camera
    from strolle_tpu.bvh import scene_with_bvh

    cornell = scene_with_bvh(cornell_box())
    cam = cornell_camera(WIDTH, HEIGHT)
    _p("cornell reference")
    c_mrays, c_ms, c_spread = bench_reference(cornell, cam)
    _p("cornell realtime")
    c_rt, _ = bench_realtime(cornell, cam)
    return {"c_mrays": c_mrays, "c_ms": c_ms, "c_spread": c_spread,
            "c_rt": c_rt}


def _dungeon_sun():
    from strolle_tpu.scene.demo import dungeon
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.sky.atmosphere import luts_for

    dg = scene_with_bvh(dungeon())
    luts = luts_for(0.35)
    return dg.replace(sun_altitude=jnp.asarray(0.35, jnp.float32)), luts


def section_dungeon():
    from strolle_tpu.scene.demo import dungeon_camera

    dg_sun, luts = _dungeon_sun()
    dcam = dungeon_camera(WIDTH, HEIGHT)
    _p("dungeon reference")
    # frames=2 -> chains of 2 and 8: a 32-frame in-jit chain of the
    # textured megakernel crashes the TPU worker (execution limit)
    d_mrays, d_ms, _ = bench_reference(dg_sun, dcam, frames=2)
    _p("dungeon realtime")
    d_rt, d_rt_spread = bench_realtime(dg_sun, dcam, include_sky=True,
                                       luts=luts)
    return {"d_mrays": d_mrays, "d_ms": d_ms, "d_rt": d_rt,
            "d_rt_spread": d_rt_spread}


def section_stages():
    from strolle_tpu.scene.demo import dungeon_camera

    dg_sun, luts = _dungeon_sun()
    dcam = dungeon_camera(WIDTH, HEIGHT)
    _p("stage profile")
    return {"stages": profile_realtime_stages(dg_sun, dcam, luts)}


def section_hd():
    from strolle_tpu.scene.demo import dungeon_camera

    dg_sun, luts = _dungeon_sun()
    hd_cam = dungeon_camera(HD_WIDTH, HD_HEIGHT)
    _p("1080p realtime")
    hd_rt, _ = bench_realtime(dg_sun, hd_cam, frames=2, include_sky=True,
                              luts=luts, trials=1)
    return {"hd_rt": hd_rt}


def section_big():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xbench import rays as xrays, soup_scene

    big = soup_scene(262144)
    o, d = xrays(coherent=True)
    _p("big-scene timing")
    floor = dispatch_floor_ms()
    big_mrays, big_ms, big_spread, big_h2d = bench_big_scene(
        big, o, d, floor_ms=floor
    )
    return {"big_mrays": big_mrays, "big_ms": big_ms,
            "big_spread": big_spread, "big_h2d": big_h2d}


SECTIONS = {
    "floor": section_floor,
    "gates": section_gates,
    "cornell": section_cornell,
    "dungeon": section_dungeon,
    "stages": section_stages,
    "hd": section_hd,
    "big": section_big,
}


def _run_section(name: str, timeout_s: int = 1500, retries: int = 1) -> dict:
    import subprocess

    for attempt in range(retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--section", name],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
                timeout=timeout_s,
            )
            if proc.returncode == 0 and proc.stdout.strip():
                return json.loads(proc.stdout.strip().splitlines()[-1])
        except (subprocess.TimeoutExpired, json.JSONDecodeError):
            pass
        _p(f"section {name} attempt {attempt + 1} failed")
    return {}


def main() -> None:
    r = {}
    for name in SECTIONS:
        _p(f"section {name}")
        r.update(_run_section(name))
    if r.get("gates") != "ok":
        print(
            json.dumps(
                {
                    "metric": "CORRECTNESS GATE FAILED (see section output)",
                    "value": 0.0,
                    "unit": "Mrays/s",
                    "vs_baseline": 0.0,
                }
            )
        )
        raise SystemExit(1)

    prev = None
    for path in sorted(
        glob.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        try:
            with open(path) as f:
                rec = json.load(f)
            if "parsed" in rec:
                rec = rec["parsed"]
            if rec.get("unit") == "Mrays/s":
                prev = rec["value"]
        except Exception:
            pass

    def fmt(key, pattern="{:.2f}", missing="n/a"):
        return pattern.format(r[key]) if key in r else missing

    stage_str = (
        " ".join(f"{k}={v:.2f}" for k, v in r["stages"].items())
        if "stages" in r
        else "n/a"
    )
    c_mrays = r.get("c_mrays", 0.0)
    print(
        json.dumps(
            {
                "metric": (
                    f"reference-mode Mrays/s/chip @{WIDTH}x{HEIGHT} d{DEPTH} "
                    f"Cornell ({fmt('c_ms', '{:.1f}')} ms/frame, spread "
                    f"{fmt('c_spread', '{:.0%}')}; realtime "
                    f"{fmt('c_rt')} ms) | "
                    f"dungeon 8.4k-tri textured: {fmt('d_mrays', '{:.0f}')} "
                    f"Mrays/s ({fmt('d_ms', '{:.1f}')} ms/frame; "
                    f"realtime+sky {fmt('d_rt')} ms "
                    f"[stages ms: {stage_str}]) | "
                    f"1080p realtime+sky {fmt('hd_rt')} ms/frame | "
                    f"262k-tri soup closest-hit {fmt('big_mrays', '{:.1f}')} "
                    f"Mrays/s kernel ({fmt('big_ms', '{:.0f}')} ms, spread "
                    f"{fmt('big_spread', '{:.0%}')}, device-resident scene; "
                    f"one-time scene h2d {fmt('big_h2d', '{:.0f}')} ms, "
                    f"on-chip correctness gated) | host sync floor "
                    f"{fmt('floor_ms', '{:.1f}')} ms (materialized-output "
                    f"protocol: every timed program ends in a fetched value; "
                    f"probe_runtime.py r5: block_until_ready does execute on "
                    f"today's runtime — the r4 elision/poisoning/committed-"
                    f"array pathologies no longer reproduce, see "
                    f"tests/test_runtime_protocol.py)"
                ),
                "value": round(c_mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(c_mrays / prev, 3) if prev and c_mrays else 1.0,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--section":
        print(json.dumps(SECTIONS[sys.argv[2]]()))
    else:
        main()
