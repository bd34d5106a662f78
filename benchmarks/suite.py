"""Benchmark suite: reproduce the reference's benchmark table on TPU.

The reference's only published numbers are the stored outputs of
``docs/benchmarks.ipynb`` (see BASELINE.md): marginal log-likelihood
runtimes of a Matern-3/2 GP over an N sweep, on the dense and the
quasiseparable paths. This script reproduces that table on the current
device with honest chained-in-jit timing, plus the gradient path the
samplers actually consume.

Usage:  python benchmarks/suite.py [--out results.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import device_seconds_per_eval
from tinygp_tpu import GaussianProcess
from tinygp_tpu import kernels as dense_kernels
from tinygp_tpu.kernels import quasisep

# The reference's baselines (seconds/eval) from docs/benchmarks.ipynb.
CELERITE2_CPU = {1_000: 210e-6, 10_000: 1.06e-3, 100_000: 8.49e-3}
TINYGP_A100 = {1_000: 1.52e-3, 10_000: 46e-3, 20_000: 249e-3}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    rng = np.random.default_rng(42)
    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    results = {"device": str(jax.devices()[0])}

    def quasisep_loglik(params, X, y):
        kernel = params["amp"] * quasisep.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
        return gp.log_probability(y)

    def quasisep_grad(params, X, y):
        g = jax.grad(quasisep_loglik)(params, X, y)
        return g["amp"] + g["scale"]

    def dense_loglik(params, X, y):
        kernel = params["amp"] * dense_kernels.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1)
        return gp.log_probability(y)

    q_sizes = [1_000, 10_000, 100_000] + ([] if args.quick else [1_000_000])
    for N in q_sizes:
        X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
        y = jnp.asarray(rng.normal(size=N), jnp.float32)
        iters = max(20, min(100, 4_000_000 // N))
        t = device_seconds_per_eval(quasisep_loglik, params, X, y, iters=iters)
        g = device_seconds_per_eval(
            quasisep_grad, params, X, y, iters=max(15, iters // 2)
        )
        row = {"loglik_s": t, "grad_s": g}
        if N in CELERITE2_CPU:
            row["speedup_vs_celerite2_cpu"] = CELERITE2_CPU[N] / t
        results[f"quasisep_N{N}"] = row
        print(f"quasisep N={N}: loglik {t*1e3:.3f} ms, grad {g*1e3:.3f} ms")

    for N in [1_000, 10_000] + ([] if args.quick else [16_384]):
        X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
        y = jnp.asarray(rng.normal(size=N), jnp.float32)
        t = device_seconds_per_eval(dense_loglik, params, X, y, iters=10)
        row = {"loglik_s": t}
        if N in TINYGP_A100:
            row["speedup_vs_a100"] = TINYGP_A100[N] / t
        results[f"dense_N{N}"] = row
        print(f"dense    N={N}: loglik {t*1e3:.3f} ms")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
