"""Test env: CPU backend with 8 virtual devices so sharding/collective
tests run without TPU hardware (SURVEY.md §4 test plan).

Note: the container's sitecustomize imports jax and pins the axon TPU
platform at interpreter startup, so env vars are too late — we must
override via jax.config after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
# XLA:CPU AOT cache reloads log spurious feature-mismatch ERRORs (the
# +prefer-no-gather pseudo-features are compile options, not ISA bits)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"

# NOTE: never enable jax's persistent compilation cache for the CPU
# suite. Deserializing cached XLA:CPU AOT executables SEGFAULTS on
# this container (jax 0.9, cpu_aot_loader machine-feature mismatch —
# reproduced at jax/_src/compilation_cache.py get_executable_and_time
# even with a backend-scoped cache dir). The TPU benches keep a cache
# (bench.py): TPU executables deserialize through a different path.


def pytest_collection_modifyitems(config, items):
    """Run the heavy-compile convergence oracles FIRST.

    XLA:CPU intermittently segfaults inside backend_compile_and_load
    when the biggest stage programs (test_restir's GI oracle: depth-
    scan trace + full GI pipeline) compile late in a process that has
    already JIT'd ~100 programs; the same compiles are stable early
    (reproduced: 3/3 green in isolation, repeated SIGSEGV at ~75% of
    the full suite). Ordering is semantics-neutral — every test builds
    its own fixtures."""
    front = [it for it in items if "test_restir" in it.nodeid]
    rest = [it for it in items if "test_restir" not in it.nodeid]
    items[:] = front + rest
