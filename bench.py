"""Headline benchmark: GP marginal log-likelihood throughput.

Reproduces the reference's benchmark workload
(``/root/reference/docs/benchmarks.ipynb`` cell 6: Matern-3/2 GP marginal
log-likelihood on N sorted 1-D points) on the O(N) quasiseparable path at
N = 100,000 — the largest N with a published baseline. The baseline number
is C++ celerite2 on CPU: 8.49 ms/eval (BASELINE.md), which ties the
reference's own best (tinygp quasisep CPU: 8.5 ms).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = evaluations/second on this chip and vs_baseline = baseline_time /
our_time (>1 means faster than the baseline).

Extra diagnostic timings (dense path, gradient path, other N) go to
BENCH_DETAILS.json.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_MAIN = 100_000
BASELINE_SECONDS = 8.49e-3  # celerite2 C++ (1-thread CPU), N=1e5, BASELINE.md


def _timeit(fn, *args, repeats=50, warmup=2):
    """Per-call device time via queued dispatch.

    Executions are enqueued asynchronously and synchronized once at the
    end: per-call host<->device round trips (tens of ms through tunneled
    device access) would otherwise dominate and hide the true device time.
    Queued timing also matches how the samplers consume this kernel —
    thousands of steps inside one jitted scan with no host sync.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(repeats)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / repeats


def main():
    from tinygp_tpu import GaussianProcess
    from tinygp_tpu import kernels as dense_kernels
    from tinygp_tpu.kernels import quasisep

    rng = np.random.default_rng(42)
    details = {"device": str(jax.devices()[0]), "dtype": "float32"}

    # --- headline: quasisep Matern32 log-lik, N = 1e5, parallel scan ---
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N_MAIN)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=N_MAIN), dtype=jnp.float32)

    @jax.jit
    def quasisep_loglik(params, X, y):
        kernel = params["amp"] * quasisep.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
        return gp.log_probability(y)

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    t_main = _timeit(quasisep_loglik, params, X, y)
    details["quasisep_loglik_n1e5_s"] = t_main
    details["quasisep_loglik_n1e5_value"] = float(quasisep_loglik(params, X, y))

    # --- diagnostics: gradient at N=1e5 ---
    grad_fn = jax.jit(jax.grad(quasisep_loglik))
    details["quasisep_grad_n1e5_s"] = _timeit(grad_fn, params, X, y)

    # --- diagnostics: N = 1e6 quasisep ---
    try:
        X6 = jnp.asarray(
            np.sort(rng.uniform(0, 10, 1_000_000)), dtype=jnp.float32
        )
        y6 = jnp.asarray(rng.normal(size=1_000_000), dtype=jnp.float32)
        details["quasisep_loglik_n1e6_s"] = _timeit(
            quasisep_loglik, params, X6, y6, repeats=10
        )
    except Exception as exc:  # noqa: BLE001 - record and continue
        details["quasisep_loglik_n1e6_s"] = f"failed: {exc}"

    # --- diagnostics: dense path, N = 1e4 (A100 baseline: 46 ms) ---
    try:
        Xd = jnp.asarray(np.sort(rng.uniform(0, 10, 10_000)), dtype=jnp.float32)
        yd = jnp.asarray(rng.normal(size=10_000), dtype=jnp.float32)

        @jax.jit
        def dense_loglik(params, X, y):
            kernel = params["amp"] * dense_kernels.Matern32(
                scale=params["scale"]
            )
            gp = GaussianProcess(kernel, X, diag=0.1)
            return gp.log_probability(y)

        details["dense_loglik_n1e4_s"] = _timeit(
            dense_loglik, params, Xd, yd, repeats=10
        )
        details["dense_loglik_n1e4_vs_a100"] = 46e-3 / details[
            "dense_loglik_n1e4_s"
        ]
    except Exception as exc:  # noqa: BLE001
        details["dense_loglik_n1e4_s"] = f"failed: {exc}"

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "quasisep GP log-lik evals/s (N=1e5, Matern32)",
                "value": 1.0 / t_main,
                "unit": "evals/s",
                "vs_baseline": BASELINE_SECONDS / t_main,
            }
        )
    )


if __name__ == "__main__":
    main()
