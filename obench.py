"""Per-op microbenchmark at 800x608 under the materialized protocol.

Establishes the true cost of the screen-space primitives the ReSTIR +
SVGF stages are built from (VERDICT r4 task 1 prerequisite): flat
takes, row-batched takes, 2-D advanced indexing, pad+slice shifts,
dynamic-slice shifts, k-way shifted selects, transcendentals, one-hot
table gathers.

Protocol (bench.py module docstring): R repetitions of the op chained
inside ONE jitted program ending in a fetched scalar checksum, at two
chain lengths; per-op cost is the marginal (t_long - t_short)/(3R),
which cancels dispatch + sync. Inputs are uploaded ONCE and perturbed
by a fresh scalar per trial (a fresh h2d of the full input set would
ride inside the first timed dispatch and drown the signal).

Run: python obench.py [op ...]     (default: all)
"""

from __future__ import annotations

import statistics
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

H, W = 608, 800
HW = H * W
TRIALS = 5


def _mk_inputs():
    rs = np.random.RandomState(0)
    v = dict(
        data=jnp.asarray(rs.uniform(0.0, 1.0, (HW,)).astype(np.float32)),
        rows8=jnp.asarray(rs.uniform(0, 1, (HW, 8)).astype(np.float32)),
        rows32=jnp.asarray(rs.uniform(0, 1, (HW, 32)).astype(np.float32)),
        idx=jnp.asarray(rs.randint(0, HW, (HW,)).astype(np.int32)),
        cy=jnp.asarray(rs.randint(0, H, (H, W)).astype(np.int32)),
        cx=jnp.asarray(rs.randint(0, W, (H, W)).astype(np.int32)),
        ids=jnp.asarray(rs.randint(0, 64, (H, W)).astype(np.int32)),
        table=jnp.asarray(rs.uniform(0, 1, (64, 8)).astype(np.float32)),
    )
    v["data2d"] = v["data"].reshape(H, W)
    return jax.tree.map(jax.device_put, v)


# Each op: (inputs, i, s) -> f32[...]; `s` is the per-trial scalar that
# keeps values fresh, `i` the unrolled rep index.
def op_baseline(v, i, s):
    return v["data"] * (1.0 + 1e-6 * i) + s


def op_take_flat(v, i, s):
    return jnp.take(v["data"] + s, (v["idx"] + i) % HW, mode="clip")


def op_take_rows8(v, i, s):
    return jnp.take(v["rows8"] + s, (v["idx"] + i) % HW, axis=0,
                    mode="clip").sum(-1)


def op_take_rows32(v, i, s):
    return jnp.take(v["rows32"] + s, (v["idx"] + i) % HW, axis=0,
                    mode="clip").sum(-1)


def op_take2d(v, i, s):
    return (v["data2d"] + s)[(v["cy"] + i) % H, v["cx"]].reshape(-1)


def op_shift_static(v, i, s):
    dy, dx = (i % 5) - 2, (i % 7) - 3
    p = jnp.pad(v["data2d"] + s * i, ((4, 4), (4, 4)))
    return p[4 + dy : 4 + dy + H, 4 + dx : 4 + dx + W].reshape(-1)


def op_shift_dynamic(v, i, s):
    dy = (s * 1e7).astype(jnp.int32) % 9 + i % 3
    dx = (s * 1e7).astype(jnp.int32) % 7 + i % 5
    p = jnp.pad(v["data2d"] + s, ((16, 16), (16, 16)))
    return lax.dynamic_slice(p, (dy, dx), (H, W)).reshape(-1)


def op_select8(v, i, s):
    p = jnp.pad(v["data2d"] + s * i, ((8, 8), (8, 8)))
    k = v["ids"] % 8
    acc = jnp.zeros((H, W), jnp.float32)
    for t in range(8):
        dy, dx = (t * 3) % 8, (t * 5) % 8
        sh = p[4 + dy : 4 + dy + H, 4 + dx : 4 + dx + W]
        acc = acc + jnp.where(k == t, sh, 0.0)
    return acc.reshape(-1)


def op_exp(v, i, s):
    return jnp.exp(-jnp.abs(v["data"] * (1.0 + 1e-6 * i) + s))


def op_onehot(v, i, s):
    oh = (v["ids"][..., None] == jnp.arange(64, dtype=jnp.int32)).astype(
        jnp.float32
    ) * (1.0 + 1e-6 * i)
    return jnp.matmul(oh, v["table"] + s,
                      preferred_element_type=jnp.float32)[..., 0].reshape(-1)


def op_take16(v, i, s):
    idx = (v["idx"] + i) % HW
    acc = jnp.zeros((HW,), jnp.float32)
    for t in range(16):
        acc = acc + jnp.take(v["data"] * (1.0 + 1e-7 * t) + s, idx,
                             mode="clip")
    return acc


#: (op, short-chain length). Cheap ops need long chains so the marginal
#: clears the ±tens-of-ms dispatch noise on the tunneled runtime.
OPS = {
    "baseline": (op_baseline, 64),
    "take_flat": (op_take_flat, 16),
    "take_rows8": (op_take_rows8, 8),
    "take_rows32": (op_take_rows32, 4),
    "take2d": (op_take2d, 16),
    "shift_static": (op_shift_static, 64),
    "shift_dynamic": (op_shift_dynamic, 64),
    "select8": (op_select8, 16),
    "exp": (op_exp, 64),
    "onehot": (op_onehot, 32),
    "take16": (op_take16, 4),
}


def bench_op(name: str, v) -> float:
    fn, r = OPS[name]

    @partial(jax.jit, static_argnames=("n",))
    def chain(v, s, n):
        c = jnp.zeros((HW,), jnp.float32)
        for i in range(n):
            c = c * 1e-6 + fn(v, i, s)
        return c.sum()

    float(chain(v, jnp.float32(0.0), r))
    float(chain(v, jnp.float32(0.0), 4 * r))
    short, long = [], []
    for t in range(TRIALS):
        s = jnp.float32(1e-5 * (t + 1))
        t0 = time.perf_counter()
        float(chain(v, s, r))
        short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(v, s + jnp.float32(1e-7), 4 * r))
        long.append(time.perf_counter() - t0)
    ms, mls = statistics.median(short), statistics.median(long)
    if mls <= ms:
        print(f"{name:16s}  UNRELIABLE (long {mls*1e3:.2f} <= short {ms*1e3:.2f})")
        return 0.0
    per = (mls - ms) / (3 * r)
    print(f"{name:16s}  {per*1e3:8.3f} ms/op   (n={r}, short {ms*1e3:7.1f} long {mls*1e3:7.1f})",
          flush=True)
    return per


def main() -> None:
    names = sys.argv[1:] or list(OPS)
    v = _mk_inputs()
    jax.block_until_ready(v)
    for n in names:
        bench_op(n, v)


def op_take_rows64(v, i, s):
    r64 = jnp.concatenate([v["rows32"], v["rows32"] * 1.1], axis=-1)
    return jnp.take(r64 + s, (v["idx"] + i) % HW, axis=0, mode="clip").sum(-1)


def op_take_rows128(v, i, s):
    r = jnp.concatenate([v["rows32"]] * 4, axis=-1)
    return jnp.take(r + s, (v["idx"] + i) % HW, axis=0, mode="clip").sum(-1)


def op_pack_unpack32(v, i, s):
    # full cycle: 32 [HW] fields -> stack [HW,32] -> take -> unstack
    fields = [v["data"] * (1.0 + 1e-3 * t) + s for t in range(32)]
    m = jnp.stack(fields, axis=-1)
    g = jnp.take(m, (v["idx"] + i) % HW, axis=0, mode="clip")
    outs = [g[:, t] for t in range(32)]
    acc = outs[0]
    for o in outs[1:]:
        acc = acc + o
    return acc


def op_take_rows8_bf16(v, i, s):
    r = (v["rows8"] + s).astype(jnp.bfloat16)
    return jnp.take(r, (v["idx"] + i) % HW, axis=0,
                    mode="clip").astype(jnp.float32).sum(-1)


def op_bilinear4x8(v, i, s):
    # 4-tap bilinear fetch of an 8-channel payload (SVGF reproject shape)
    idx = (v["idx"] + i) % HW
    acc = jnp.zeros((HW,), jnp.float32)
    for t in range(4):
        g = jnp.take(v["rows8"] + s, (idx + t * W) % HW, axis=0, mode="clip")
        acc = acc + g.sum(-1) * (0.25 + 1e-3 * t)
    return acc


OPS.update({
    "take_rows64": (op_take_rows64, 4),
    "take_rows128": (op_take_rows128, 2),
    "pack_unpack32": (op_pack_unpack32, 4),
    "take_rows8_bf16": (op_take_rows8_bf16, 8),
    "bilinear4x8": (op_bilinear4x8, 4),
})


if __name__ == "__main__":
    main()
