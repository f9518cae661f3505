"""Executable probe of the axon-runtime pathologies the bench protocol
is built around (VERDICT r4 weak #5). Prints ONE JSON line with the
measurements; tests/test_runtime_protocol.py asserts on it.

The three claims under test (bench.py module docstring, README):

1. **Elision of unfetched dispatch chains** — `block_until_ready()` on
   a result that is never consumed returns without executing the
   chain; only a host fetch (float()/np.asarray) forces execution.
2. **Committed-device-array argument cost** — passing device-committed
   arrays vs fresh host numpy changes dispatch cost (round 4 claimed
   committed args degrade dispatch; the big-scene bench re-uploads the
   scene every call because of it).
3. **Eager-dispatch poisoning** — one burst of eager (non-jit) ops
   permanently degrades every subsequent jitted dispatch in the
   process. Measured LAST because it is irreversible.

Run: python probe_runtime.py          (on the default backend)
"""

from __future__ import annotations

import json
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1024
REPS = 5


def _med(ts):
    return statistics.median(ts) * 1e3


def measure_elision() -> tuple[float, float, float]:
    """A compute-heavy chain (fori_loop of big matmuls, ~4.4 TFLOP —
    tens of ms of real device time, well above the sync floor), timed
    three ways: enqueue-only (no sync), block_until_ready (no fetch),
    and with a fetched checksum. If block-without-fetch elides the
    compute (the round-4 claim), the middle number collapses toward
    the enqueue number."""
    m = 4096

    @jax.jit
    def chain(x):
        def body(i, c):
            return jnp.tanh(
                jnp.dot(c, c, preferred_element_type=jnp.float32)
            ) + 1e-3 * i
        return jax.lax.fori_loop(0, 32, body, x)

    xs = [
        jnp.asarray(np.random.RandomState(i).rand(m, m).astype(np.float32))
        for i in range(3 * REPS + 2)
    ]
    for x in xs:
        x.block_until_ready()
    float(chain(xs[0]).sum())  # compile

    enqueue, unfetched, fetched = [], [], []
    for i in range(REPS):
        t0 = time.perf_counter()
        r = chain(xs[1 + i])
        enqueue.append(time.perf_counter() - t0)
        r.block_until_ready()  # drain before the next section
    for i in range(REPS):
        t0 = time.perf_counter()
        chain(xs[1 + REPS + i]).block_until_ready()
        unfetched.append(time.perf_counter() - t0)
    for i in range(REPS):
        t0 = time.perf_counter()
        float(chain(xs[1 + 2 * REPS + i]).sum())
        fetched.append(time.perf_counter() - t0)
    return _med(enqueue), _med(unfetched), _med(fetched)


def measure_committed() -> tuple[float, float]:
    """Fetched dispatch cost with fresh host-numpy args (h2d inside the
    timed call) vs device-committed args."""

    @jax.jit
    def fn(x):
        return (x * 1.0001).sum()

    host_args = [
        np.random.RandomState(100 + i).rand(N, N).astype(np.float32)
        for i in range(REPS)
    ]
    dev_args = [jax.device_put(a + 1.0) for a in host_args]
    for x in dev_args:
        x.block_until_ready()
    float(fn(dev_args[0]))  # compile

    host_ms, dev_ms = [], []
    for a in host_args:
        t0 = time.perf_counter()
        float(fn(a))
        host_ms.append(time.perf_counter() - t0)
    for a in dev_args:
        t0 = time.perf_counter()
        float(fn(a))
        dev_ms.append(time.perf_counter() - t0)
    return _med(host_ms), _med(dev_ms)


def measure_poisoning() -> tuple[float, float]:
    """Tiny jitted dispatch latency before/after a burst of eager ops.
    IRREVERSIBLE per round-4 observations: run last."""

    @jax.jit
    def tiny(x):
        return x.sum()

    xs = [jnp.full((8, 128), float(i)) for i in range(2 * REPS + 1)]
    for x in xs:
        x.block_until_ready()
    float(tiny(xs[0]))
    pre = []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(tiny(xs[1 + i]))
        pre.append(time.perf_counter() - t0)

    # the poison: a burst of eager (op-by-op) dispatches
    a = jnp.ones((64, 128))
    for i in range(50):
        a = a * 1.001 + 0.1
    a.block_until_ready()

    post = []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(tiny(xs[1 + REPS + i]))
        post.append(time.perf_counter() - t0)
    return _med(pre), _med(post)


def main() -> None:
    platform = jax.default_backend()
    enqueue_ms, unfetched_ms, fetched_ms = measure_elision()
    host_ms, committed_ms = measure_committed()
    pre_ms, post_ms = measure_poisoning()
    print(
        json.dumps(
            {
                "platform": platform,
                "enqueue_ms": round(enqueue_ms, 3),
                "unfetched_ms": round(unfetched_ms, 3),
                "fetched_ms": round(fetched_ms, 3),
                "host_arg_ms": round(host_ms, 3),
                "committed_arg_ms": round(committed_ms, 3),
                "pre_poison_ms": round(pre_ms, 3),
                "post_poison_ms": round(post_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
