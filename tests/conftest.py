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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"
