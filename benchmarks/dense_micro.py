"""Micro-benchmarks for the dense-path building blocks on the TPU.

Times each primitive the blocked Cholesky is assembled from, so block-size
and algorithm decisions rest on measurements, not guesses.

Run from /root/repo:  python benchmarks/dense_micro.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import device_seconds_per_eval  # noqa: E402


def main():
    from tinygp_tpu.ops import pallas_dense

    rng = np.random.default_rng(0)
    out = {}

    def timeit(name, f, params, *args, iters=30):
        t = device_seconds_per_eval(f, params, *args, iters=iters)
        out[name] = t
        print(name, t, flush=True)

    # Native Cholesky at panel sizes.
    for b in (128, 256, 512, 1024):
        A = rng.normal(size=(b, b)).astype(np.float32) / np.sqrt(b)
        K = jnp.asarray(A @ A.T + np.eye(b, dtype=np.float32))

        def f(p, K):
            L = jnp.linalg.cholesky(K * p["s"])
            return jnp.sum(jnp.log(jnp.diag(L)))

        timeit(f"native_chol_{b}", f, {"s": jnp.float32(1.0)}, K)

    # Native TRSM: inv(L)^T via solve against the identity.
    for b in (256, 512, 1024):
        A = rng.normal(size=(b, b)).astype(np.float32) / np.sqrt(b)
        K = jnp.asarray(A @ A.T + np.eye(b, dtype=np.float32))
        L = jnp.linalg.cholesky(K)
        eye = jnp.eye(b, dtype=jnp.float32)

        def f(p, L):
            with jax.default_matmul_precision("highest"):
                W = jax.scipy.linalg.solve_triangular(
                    L * p["s"], eye, lower=True
                )
            return jnp.sum(W * W)

        timeit(f"native_trsm_eye_{b}", f, {"s": jnp.float32(1.0)}, L)

    # Fused Pallas SYRK-subtract at full trailing size.
    for m, b in ((9728, 512), (5120, 512), (9216, 1024)):
        T = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
        L = jnp.asarray(rng.normal(size=(m, b)).astype(np.float32))

        def f(p, T, L):
            U = pallas_dense.syrk_sub(T, L * p["s"])
            return jnp.sum(U[0])

        timeit(f"syrk_sub_{m}x{b}", f, {"s": jnp.float32(1.0)}, T, L,
               iters=10)

    # Fused Pallas panel matmul.
    for m, b in ((9728, 512), (9216, 1024)):
        A = jnp.asarray(rng.normal(size=(m, b)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(b, b)).astype(np.float32))

        def f(p, A, W):
            P = pallas_dense.split_panel_matmul(A, W * p["s"])
            return jnp.sum(P[0])

        timeit(f"panel_{m}x{b}", f, {"s": jnp.float32(1.0)}, A, W, iters=10)

    print(json.dumps(out, indent=2))
    with open("benchmarks/dense_micro.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
