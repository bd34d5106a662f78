"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that mesh/sharding logic (the
samplers' chain/data parallelism and the sharded quasiseparable scans) can be
exercised without a TPU pod. This is the standard JAX recipe for testing
pod-slice logic single-host. Benchmarks (bench.py) run on the real TPU chip.

Note: the axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so the
platform is forced through ``jax.config`` (which must happen before any
computation runs).
"""

import os

# Must be set before jax initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
