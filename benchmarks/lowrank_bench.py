"""Low-rank (FITC/Nystrom) dense-kernel log-likelihood vs george-HODLR.

The baseline row this targets (BASELINE.md, 1-thread CPU, %timeit means):
george HODLR — 58.3 ms at N=1e4, 123 ms at N=2e4. Both are approximate
large-N treatments of a dense kernel; ours is two tall GEMMs on the MXU.

Usage: python benchmarks/lowrank_bench.py [--out results.json]
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
from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.solvers import LowRankSolver

HODLR_CPU = {10_000: 58.3e-3, 20_000: 123e-3}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--m", type=int, default=512)
    args = parser.parse_args()

    rng = np.random.default_rng(42)
    results = {"device": str(jax.devices()[0]), "M": args.m}

    for n in (10_000, 20_000, 100_000):
        X = jnp.asarray(
            np.sort(rng.uniform(0, 10, n)), dtype=jnp.float32
        )
        y = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
        Z = X[:: n // args.m][: args.m]

        def loglik(params, X, y, Z):
            kernel = params["amp"] * kernels.Matern32(
                scale=params["scale"]
            )
            gp = GaussianProcess(
                kernel, X, diag=0.1, solver=LowRankSolver,
                inducing_points=Z,
            )
            return gp.log_probability(y)

        params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
        t = device_seconds_per_eval(loglik, params, X, y, Z, iters=20)
        entry = {"loglik_s": t}
        if n in HODLR_CPU:
            entry["speedup_vs_george_hodlr"] = HODLR_CPU[n] / t

        def gsum(params, X, y, Z):
            g = jax.grad(loglik)(params, X, y, Z)
            return g["amp"] + g["scale"]

        entry["grad_s"] = device_seconds_per_eval(
            gsum, params, X, y, Z, iters=10
        )
        results[f"lowrank_N{n}"] = entry
        print(n, entry, flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
