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

# Persistent compile cache: the suite re-jits the same stage programs
# every run; caching cuts reruns from minutes to seconds.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_strolle")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
