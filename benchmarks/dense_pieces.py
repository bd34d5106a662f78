"""Break down the dense log-lik pipeline on the TPU: construction, TRSM.

Run from /root/repo: python benchmarks/dense_pieces.py
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
    from tinygp_tpu import kernels
    from tinygp_tpu.ops.pallas_gram import gram_tiled

    rng = np.random.default_rng(0)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)
    out = {}

    def timeit(name, f, params, *args, iters=20):
        t = device_seconds_per_eval(f, params, *args, iters=iters)
        out[name] = t
        print(name, t, flush=True)

    def makek(p):
        return p["amp"] * kernels.Matern32(scale=p["scale"])

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}

    # Construction: Pallas tiled vs XLA nested-vmap.
    def gram_pallas(p, X):
        return jnp.sum(gram_tiled(makek(p), X, X)[0])

    def gram_xla(p, X):
        k = makek(p)
        K = jax.vmap(
            jax.vmap(k.evaluate, in_axes=(None, 0)), in_axes=(0, None)
        )(X, X)
        return jnp.sum(K[0])

    timeit("gram_pallas", gram_pallas, params, X)
    timeit("gram_xla", gram_xla, params, X)

    # TRSM single RHS against a fixed factor.
    A = rng.normal(size=(N, 256)).astype(np.float32)
    K = jnp.asarray(A @ A.T / 256 + np.eye(N, dtype=np.float32))
    L = jnp.linalg.cholesky(K)

    def trsm(p, L, y):
        x = jax.scipy.linalg.solve_triangular(L, y * p["amp"], lower=True)
        return jnp.sum(x * x)

    timeit("trsm_1rhs", trsm, params, L, y)

    with jax.default_matmul_precision("highest"):
        pass

    def trsm_high(p, L, y):
        with jax.default_matmul_precision("highest"):
            x = jax.scipy.linalg.solve_triangular(
                L, y * p["amp"], lower=True
            )
        return jnp.sum(x * x)

    timeit("trsm_1rhs_highest", trsm_high, params, L, y)

    print(json.dumps(out, indent=2))
    with open("benchmarks/dense_pieces.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
