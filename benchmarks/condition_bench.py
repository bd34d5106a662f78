"""Dense conditioning (predict) wall time: fused MXU path vs native.

Times ``gp.condition`` + posterior variance at N=M=1e4 (the A100 baseline
row's N) both ways: ``blocked=True`` (split-GEMM triangular substitution +
split SYRK, VERDICT r3 task 8) and ``blocked=False`` (the reference
formulation on native kernels,
``/root/reference/src/tinygp/solvers/direct.py:75-95``). Prints one JSON
line; appends the result to ``benchmarks/condition_bench.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N = 10_000
# Prediction-grid size: the naive (blocked=False) leg's working set at
# M=1e4 needs 16.09 GB against the v5e's 15.75 GB HBM (the reference's
# A100 had 40 GB); M=6e3 keeps BOTH legs resident so the A/B is honest.
M = 6_000
ITERS = 3


def main():
    from tinygp_tpu import GaussianProcess, kernels

    rng = np.random.default_rng(7)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)
    Xt = jnp.asarray(np.sort(rng.uniform(0, 10, M)), jnp.float32)

    def predict_var(params, X, y, Xt, blocked):
        kernel = params["amp"] * kernels.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, blocked=blocked)
        _, cond = gp.condition(y, Xt)
        return jnp.sum(cond.variance) + jnp.sum(cond.loc)

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}

    def timed(blocked):
        def make(k):
            @jax.jit
            def run(params, X, y, Xt):
                def body(i, carry):
                    p = jax.tree_util.tree_map(
                        lambda v: v * (1.0 + 1e-6 * jnp.tanh(carry)), params
                    )
                    return carry + 1e-6 * jnp.tanh(
                        predict_var(p, X, y, Xt, blocked)
                    )

                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

            return run

        r1, r2 = make(ITERS), make(2 * ITERS)
        value = float(jax.jit(
            lambda p, X, y, Xt: predict_var(p, X, y, Xt, blocked)
        )(params, X, y, Xt))

        def best(run):
            float(run(params, X, y, Xt))
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(params, X, y, Xt))
                b = min(b, time.perf_counter() - t0)
            return b

        t1, t2 = best(r1), best(r2)
        return value, max((t2 - t1) / ITERS, 1e-9)

    v_fast, t_fast = timed(True)
    v_native, t_native = timed(False)

    # Accuracy check on the posterior VARIANCE elementwise (the summed
    # loc+variance scalar mixes in a near-cancelling sum of posterior
    # means and reads as a huge "relative" diff even when both legs are
    # fine). The variance is the cancellation-sensitive quantity: the
    # split-bf16 condition path was removed after it produced NEGATIVE
    # variances here (2026-08-20).
    def variances(params, X, y, Xt, blocked):
        kernel = params["amp"] * kernels.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, blocked=blocked)
        _, cond = gp.condition(y, Xt)
        return cond.variance

    var_b = jax.jit(lambda *a: variances(*a, True))(params, X, y, Xt)
    var_n = jax.jit(lambda *a: variances(*a, False))(params, X, y, Xt)
    var_maxdiff = float(jnp.max(jnp.abs(var_b - var_n)))
    result = {
        "workload": f"dense condition+variance N={N} M={M} f32",
        "t_blocked_factor_s": t_fast,
        "t_native_factor_s": t_native,
        "speedup": t_native / t_fast,
        "variance_max_abs_diff": var_maxdiff,
        "variance_min": float(jnp.min(var_b)),
    }
    print(json.dumps(result), flush=True)
    path = os.path.join(os.path.dirname(__file__), "condition_bench.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
