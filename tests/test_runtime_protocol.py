"""Pins the TPU-runtime behaviors the bench protocol depends on
(VERDICT r4 weak #5): runs probe_runtime.py in a subprocess on the
default (tunneled TPU) backend and asserts on its measurements.

Round-5 ground truth (probe output on the axon runtime):

* ``block_until_ready`` EXECUTES the dispatch chain — a 4.4-TFLOP
  chain costs the same blocked-unfetched as fetched (r4 claimed
  unfetched chains were elided; that does not reproduce).
* plain enqueue (no sync) is async and ~free.
* device-committed arguments dispatch at the sync floor; fresh
  host-numpy arguments pay a slow (~0.4 GB/s) tunnel upload inside
  the call (r4 claimed the opposite — that committed arrays degrade
  dispatch).
* a burst of eager ops does NOT degrade subsequent jitted dispatches
  (r4's "dispatch poisoning" does not reproduce).

The materialized-output protocol in bench.py remains valid under both
the old and new behaviors (a fetch is always a correct sync barrier);
these asserts exist so a future runtime shift is noticed loudly
instead of silently invalidating the benchmarks again.

Skipped when no TPU is reachable (the probe reports its platform).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def probe():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(_REPO, "probe_runtime.py")],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            timeout=900,
            env=env,
            cwd=_REPO,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("runtime probe timed out (no reachable TPU?)")
    if proc.returncode != 0 or not proc.stdout.strip():
        pytest.skip("runtime probe failed to run (no reachable TPU?)")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    if out.get("platform") != "tpu":
        pytest.skip(f"default backend is {out.get('platform')}, not tpu")
    return out


def test_block_until_ready_executes(probe):
    """No elision: blocking on an unfetched heavy chain costs about as
    much as fetching it (both >> the enqueue cost)."""
    assert probe["unfetched_ms"] >= 0.5 * probe["fetched_ms"], probe
    assert probe["unfetched_ms"] > 4 * probe["enqueue_ms"], probe


def test_enqueue_is_async(probe):
    """Un-synced dispatch returns immediately — this is why timed
    programs must end in a fetch/block."""
    assert probe["enqueue_ms"] < 0.2 * probe["fetched_ms"], probe


def test_committed_args_do_not_degrade_dispatch(probe):
    """Device-committed arguments are at least as fast as host-numpy
    (whose upload rides inside the call) — production scenes should be
    device-resident."""
    assert probe["committed_arg_ms"] <= probe["host_arg_ms"] * 1.2, probe


def test_no_eager_dispatch_poisoning(probe):
    """An eager-op burst leaves jitted dispatch latency unchanged."""
    assert probe["post_poison_ms"] <= 3.0 * probe["pre_poison_ms"], probe
