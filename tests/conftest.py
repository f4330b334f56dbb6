"""Test harness config.

All tests run on CPU with 8 virtual devices so that shard_map / mesh logic
is exercised without real multi-chip hardware (SURVEY.md SS5.2: the solver
is platform-agnostic; benchmarks, not tests, run on the real TPU).

Note: this environment's sitecustomize imports jax at interpreter start and
pins JAX_PLATFORMS to the TPU platform, so plain env-var setting is too
late; instead override via jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
