"""Localize blocked-Cholesky overheads by timing ablated variants on TPU.

Each variant disables one piece of the pipeline (correctness is sacrificed
— this is a timing diagnostic only).

Run from /root/repo: python benchmarks/dense_variants.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")
from bench import device_seconds_per_eval  # noqa: E402

N = 10_000
BLOCK = 512
TERMS = 2


def main():
    from tinygp_tpu.ops import pallas_dense
    from tinygp_tpu.ops.dense import _scaled

    rng = np.random.default_rng(42)
    x = np.sort(rng.uniform(0, 10, N))
    r = np.abs(x[:, None] - x[None, :]) / 2.5
    K64 = 1.5 * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    K64[np.diag_indices(N)] += 0.1
    K0 = jnp.asarray(K64, jnp.float32)
    out = {}

    def impl(K, *, scale=True, assemble=True, natives=True, updates=True):
        n = K.shape[0]
        if scale:
            K, s = _scaled(K)
        else:
            s = jnp.ones(n, K.dtype)
        pad = (-n) % BLOCK
        K = jnp.block(
            [
                [K, jnp.zeros((n, pad), K.dtype)],
                [jnp.zeros((pad, n), K.dtype), jnp.eye(pad, dtype=K.dtype)],
            ]
        )
        m = K.shape[0]
        nb = m // BLOCK
        eye = jnp.eye(BLOCK, dtype=K.dtype)
        T = K
        L = jnp.zeros_like(K)
        for k in range(nb):
            lo = k * BLOCK
            A11 = lax.dynamic_slice(T, (lo, lo), (BLOCK, BLOCK))
            if natives:
                with jax.default_matmul_precision("highest"):
                    L11 = lax.linalg.cholesky(A11, symmetrize_input=False)
                    L11invT = jax.scipy.linalg.solve_triangular(
                        L11, eye, lower=True
                    ).T
            else:
                L11 = jnp.tril(A11)
                L11invT = A11
            if assemble:
                L = lax.dynamic_update_slice(L, L11, (lo, lo))
            if k + 1 < nb:
                hi = lo + BLOCK
                A21 = lax.dynamic_slice(T, (hi, lo), (m - hi, BLOCK))
                L21 = pallas_dense.split_panel_matmul(
                    A21, L11invT, terms=TERMS
                )
                if updates:
                    T = pallas_dense.syrk_sub_inplace(
                        T, L21, offset=hi, terms=TERMS
                    )
                if assemble:
                    L = lax.dynamic_update_slice(L, L21, (hi, lo))
        L = jnp.tril(L[:n, :n])
        return L * (1.0 / s)[:, None]

    def metric(name, **kw):
        def f(p, K):
            L = impl(K * p["s"], **kw)
            return jnp.sum(jnp.diagonal(L))

        t = device_seconds_per_eval(f, {"s": jnp.float32(1.0)}, K0, iters=10)
        out[name] = t
        print(name, t, flush=True)

    metric("full")
    metric("no_scale", scale=False)
    metric("no_assemble", assemble=False)
    metric("no_natives", natives=False)
    metric("no_updates", updates=False)

    print(json.dumps(out, indent=2))
    with open("benchmarks/dense_variants.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
