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
# Default to x64 (the reference CI's primary mode); set TINYGP_TPU_X64=0 to
# run the whole suite in float32, the TPU production mode. The dtype-aware
# tolerances in tinygp_tpu.test_utils absorb the precision gap. A quick
# always-on f32 sanity pass lives in tests/test_float32_mode.py.
jax.config.update(
    "jax_enable_x64",
    os.environ.get("TINYGP_TPU_X64", "1").lower() not in ("0", "false"),
)
