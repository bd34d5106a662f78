"""Stage-by-stage decomposition of the dense N=1e4 log-likelihood on TPU.

Measures, with the chained-in-jit methodology, each pipeline stage of
``DirectSolver`` + ``GaussianProcess.log_probability`` so the optimization
work attacks measured costs, not guesses. Writes dense_decomp.json.
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
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.ops import dense as dense_ops
from tinygp_tpu.ops import pallas_dense

N = 10_000


def timed(fn, params, *args, iters=20):
    def make(n):
        @jax.jit
        def run(params, *args):
            def body(i, carry):
                p = jax.tree_util.tree_map(
                    lambda x: x * (1.0 + 1e-6 * jnp.tanh(carry)), params
                )
                return carry + 1e-6 * jnp.tanh(fn(p, *args))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    r1, r2 = make(iters), make(2 * iters)

    def t(run):
        float(run(params, *args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(r2) - t(r1)) / iters, 1e-9)


def main():
    rng = np.random.default_rng(0)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)
    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}

    def kern(p):
        return p["amp"] * kernels.Matern32(scale=p["scale"])

    out = {"device": str(jax.devices()[0]), "n": N}

    # --- stage 1: gram build (K = kernel(X,X) + diag) -------------------
    def build_K(p, X):
        K = kern(p)(X, X)
        return K.at[jnp.diag_indices(N)].add(0.1)

    out["gram_build_s"] = timed(
        lambda p, X: jnp.sum(build_K(p, X)[:, 0]), params, X
    )

    # --- stage 2: scaled+padded T build ----------------------------------
    block = 512
    m = -(-N // block) * block

    def build_T(p, X):
        K = build_K(p, X)
        d = jnp.diagonal(K)
        s = jax.lax.rsqrt(d)
        Ks = K * s[:, None] * s[None, :]
        T = jnp.block(
            [
                [Ks, jnp.zeros((N, m - N), jnp.float32)],
                [
                    jnp.zeros((m - N, N), jnp.float32),
                    jnp.eye(m - N, dtype=jnp.float32),
                ],
            ]
        )
        return T

    out["scaled_padded_T_s"] = timed(
        lambda p, X: jnp.sum(build_T(p, X)[:, 0]), params, X
    )

    # --- stage 3: chol (blocked 2-term, no guard) on prebuilt K ---------
    K0 = jax.jit(build_K)(params, X)
    Kp = {"K": K0}

    out["chol_t2_noguard_s"] = timed(
        lambda p: jnp.sum(
            jnp.log(
                jnp.diagonal(
                    dense_ops.blocked_cholesky(p["K"], terms=2)
                )
            )
        ),
        Kp,
    )
    out["chol_t3_noguard_s"] = timed(
        lambda p: jnp.sum(
            jnp.log(
                jnp.diagonal(
                    dense_ops.blocked_cholesky(p["K"], terms=3)
                )
            )
        ),
        Kp,
    )
    out["chol_native_s"] = timed(
        lambda p: jnp.sum(
            jnp.log(jnp.diagonal(jnp.linalg.cholesky(p["K"])))
        ),
        Kp,
    )
    # with guard + runtime order selection (the default path)
    out["chol_fallback_guarded_s"] = timed(
        lambda p: jnp.sum(
            jnp.log(
                jnp.diagonal(
                    dense_ops.cholesky_with_fallback(
                        p["K"], rel_floor=jnp.float32(0.0625)
                    )
                )
            )
        ),
        Kp,
    )

    # --- stage 4: TRSM 1 rhs against a fixed factor ----------------------
    L0 = jax.jit(lambda K: dense_ops.blocked_cholesky(K, terms=2))(K0)
    out["trsm_1rhs_s"] = timed(
        lambda p: jnp.sum(
            jax.scipy.linalg.solve_triangular(p["L"], y, lower=True)
        ),
        {"L": L0},
    )

    # --- stage 5: full log-lik through the GP API ------------------------
    def loglik(p, X, y):
        gp = GaussianProcess(kern(p), X, diag=0.1)
        return gp.log_probability(y)

    out["full_loglik_s"] = timed(loglik, params, X, y)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "dense_decomp.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
