"""Measure the dense-path Cholesky variants on the real TPU chip.

Compares XLA's native Cholesky against the three-term-split blocked
factorization (ops/dense.py) at several block sizes, plus the end-to-end
dense GP log-likelihood, at N = 10^4 (the A100 baseline point: 46 ms).

Run from /root/repo:  python benchmarks/dense_cholesky_bench.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import device_seconds_per_eval  # noqa: E402

N = 10_000


def main():
    from tinygp_tpu import GaussianProcess, kernels
    from tinygp_tpu.ops.dense import blocked_cholesky, cholesky_with_fallback

    rng = np.random.default_rng(42)
    x = np.sort(rng.uniform(0, 10, N))
    X = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)

    # The benchmark covariance (Matern32, amp 1.5, scale 2.5, diag 0.1).
    r = np.abs(x[:, None] - x[None, :]) / 2.5
    K64 = 1.5 * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    K64[np.diag_indices(N)] += 0.1
    K = jnp.asarray(K64, jnp.float32)
    logdet64 = 2.0 * np.sum(np.log(np.diag(np.linalg.cholesky(K64))))

    out = {"device": str(jax.devices()[0]), "n": N, "logdet_f64": logdet64}

    def chol_metric(fn):
        # Reduce the factor to a scalar (log-det) so the timing loop chains.
        def f(params, K):
            L = fn(K * params["s"])
            return 2.0 * jnp.sum(jnp.log(jnp.diag(L)))

        params = {"s": jnp.float32(1.0)}
        t = device_seconds_per_eval(f, params, K, iters=10)
        val = float(jax.jit(f)(params, K))
        return t, val

    t, v = chol_metric(jnp.linalg.cholesky)
    out["native_chol_s"] = t
    out["native_chol_logdet_err"] = abs(v - logdet64)
    print("native:", t, flush=True)

    for b, terms in ((512, 3), (512, 2), (1024, 2)):
        t, v = chol_metric(
            lambda K, b=b, terms=terms: blocked_cholesky(
                K, block=b, terms=terms
            )
        )
        out[f"blocked{b}_t{terms}_chol_s"] = t
        out[f"blocked{b}_t{terms}_chol_logdet_err"] = abs(v - logdet64)
        print(f"blocked{b} terms={terms}:", t, flush=True)

    t, v = chol_metric(cholesky_with_fallback)
    out["fallback_chol_s"] = t
    out["fallback_chol_logdet_err"] = abs(v - logdet64)
    print("with fallback:", t, flush=True)

    # End-to-end dense log-lik on the blocked path.
    def loglik(params, X, y):
        kernel = params["amp"] * kernels.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1)
        return gp.log_probability(y)

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    t = device_seconds_per_eval(loglik, params, X, y, iters=10)
    out["dense_loglik_s"] = t
    print("loglik:", t, flush=True)

    print(json.dumps(out, indent=2))
    with open("benchmarks/dense_cholesky_bench.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
