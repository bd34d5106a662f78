"""Weak-scaling efficiency of the sharded samplers and scans (CPU mesh).

The north star (BASELINE.md) asks for >= 80% samples/s scaling efficiency
as hosts/devices grow. Real multi-chip hardware is not available in this
environment, so this harness measures the *sharding overhead* structure on
the 8-virtual-device CPU mesh: weak scaling (work proportional to devices)
of (a) chain-parallel NUTS and (b) the sequence-parallel quasisep scan.

On a CPU host all virtual devices share the same cores, so raw wall time
cannot show speedup; what it can show — and what this harness reports — is
the *collective/partition overhead*: time(d devices, d x work) /
time(1 device, 1 x work) per unit of work. A value near 1.0 means the
sharded program adds no overhead beyond the compute, i.e. on real chips
(where each shard gets its own core) scaling efficiency ~= 1 / overhead.

Run: python benchmarks/scaling.py  (writes benchmarks/scaling.json)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def _best_of(fn, reps=3):
    fn()  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def chain_parallel_nuts(devices_list, chains_per_device=64):
    """Weak scaling: chains grow with the mesh; per-device work constant."""
    from jax.sharding import Mesh

    from tinygp_tpu.parallel.sharded import run_mcmc_sharded

    sd = np.array([0.5, 1.5, 1.0])

    def log_prob(p):
        return -0.5 * jnp.sum(jnp.square(p["x"] / sd))

    out = {}
    for d in devices_list:
        mesh = Mesh(np.asarray(jax.devices()[:d]), ("chains",))
        num_chains = chains_per_device * d

        def run():
            samples, _ = run_mcmc_sharded(
                jax.random.PRNGKey(0),
                log_prob,
                {"x": jnp.zeros(3)},
                mesh=mesh,
                num_chains=num_chains,
                num_warmup=150,
                num_samples=150,
                axis="chains",
            )
            jax.block_until_ready(samples["x"])

        out[d] = _best_of(run, reps=2)
    return out


def sequence_parallel_scan(devices_list, points_per_device=65536):
    """Weak scaling: the time axis grows with the mesh."""
    from jax.sharding import Mesh

    from tinygp_tpu.kernels import quasisep
    from tinygp_tpu.parallel.scan import sharded_loglik

    out = {}
    rng = np.random.default_rng(0)
    for d in devices_list:
        mesh = Mesh(np.asarray(jax.devices()[:d]), ("data",))
        n = points_per_device * d
        X = jnp.asarray(np.sort(rng.uniform(0, 100, n)), jnp.float64)
        y = jnp.asarray(rng.normal(size=n))
        kernel = quasisep.Matern32(scale=2.5)

        fn = jax.jit(
            lambda X, y: sharded_loglik(kernel, X, y, diag=0.1, mesh=mesh)
        )

        def run():
            jax.block_until_ready(fn(X, y))

        out[d] = _best_of(run, reps=3)
    return out


def main():
    devices_list = [1, 2, 4, 8]
    results = {"devices": devices_list}

    nuts = chain_parallel_nuts(devices_list)
    results["nuts_weak_s"] = nuts

    scan = sequence_parallel_scan(devices_list)
    results["scan_weak_s"] = scan

    # On a shared-core host, ideal weak scaling shows time growing ~linearly
    # with total work; the overhead metric divides that out.
    ncores = os.cpu_count() or 1
    results["host_cores"] = ncores
    results["note"] = (
        "CPU mesh: all shards share the host cores, so per-unit-of-work "
        "overhead (reported) is the scaling-relevant quantity, not wall "
        "time. Efficiency on real chips ~= work_scaling / time_scaling."
    )
    # Efficiency proxy: with d x the work on the same shared cores,
    # perfect partitioning costs d x the single-device time; the ratio
    # (d * t1) / t_d is the weak-scaling efficiency analog (capped at 1
    # in interpretation — above 1 means fixed costs still dominate and
    # the config must grow).
    results["nuts_efficiency_proxy"] = {
        d: (d * nuts[1]) / nuts[d] for d in devices_list
    }
    results["scan_efficiency_proxy"] = {
        d: (d * scan[1]) / scan[d] for d in devices_list
    }

    print(json.dumps(results, indent=2, default=str))
    with open("benchmarks/scaling.json", "w") as f:
        json.dump(results, f, indent=2, default=str)


if __name__ == "__main__":
    main()
