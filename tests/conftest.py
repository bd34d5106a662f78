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


# ---------------------------------------------------------------------------
# The `fast` subset: a <5-minute single-core slice touching every subsystem
# (module base, kernel DSL, quasisep kernels+solver+scan engine, dense fused
# path, samplers, sharding, low-rank, f32 mode). Run with `pytest -m fast`.
# Curated by nodeid prefix so the subset stays visible in one place.
# ---------------------------------------------------------------------------

_FAST_PREFIXES = (
    "tests/test_module.py",
    "tests/test_gp.py",
    "tests/test_noise.py",
    "tests/test_float32_mode.py",
    "tests/test_kernels/test_kernels.py",
    "tests/test_kernels/test_distance.py",
    "tests/test_kernels/test_quasisep.py",
    "tests/test_solvers/test_quasisep/test_ops.py",
    "tests/test_solvers/test_quasisep/test_solver.py",
    "tests/test_solvers/test_lowrank.py::test_woodbury_matches_dense_oracle",
    "tests/test_ops_dense.py::test_fused_loglik_matches_f64_oracle",
    "tests/test_ops_dense.py::test_fused_loglik_rel_floor_dispatch",
    "tests/test_ops_dense.py::test_adaptive_split_order_both_branches",
    "tests/test_samplers/test_mcmc.py::test_nuts_accept_near_target",
    "tests/test_parallel/test_sharded.py::test_local_chunk",
    "tests/test_parallel/test_sharded_scan.py::test_sharded_loglik_gradient_matches",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid
        if any(nodeid.startswith(p) for p in _FAST_PREFIXES):
            item.add_marker(pytest.mark.fast)
