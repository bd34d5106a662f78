"""Log-likelihood + gradient wall time across the quasiseparable families.

The headline bench measures Matern32 (m=2); this records the rest of the
model zoo at N=1e5 so per-family regressions are visible: SHO (m=2,
branch-free 3-regime propagator), Matern52 (m=3 — the fused Pallas
kernel's widest order), Cosine (m=2), CARMA(2,1) (m=2, real-root
handling), and a Product (m=4 -> blocked XLA strategy with the Schur
solve). Baseline context: celerite2-C++ runs its (m=2) workload at
8.49 ms on CPU (BASELINE.md).

Usage: python benchmarks/model_family_bench.py   (writes model_family_bench.json)
"""

import json
import os
import sys

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

from bench import device_seconds_per_eval
from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep

N = 100_000

FAMILIES = {
    "sho_m2": lambda p: p["a"] * quasisep.SHO(omega=p["b"], quality=4.0),
    "matern52_m3": lambda p: p["a"] * quasisep.Matern52(scale=p["b"]),
    "cosine_m2": lambda p: p["a"] * quasisep.Cosine(scale=p["b"]),
    "carma21_m2": lambda p: quasisep.CARMA.init(
        alpha=jnp.stack([p["a"], jnp.float32(1.4)]),
        beta=jnp.stack([p["b"], jnp.float32(0.1)]),
    ),
    "product_m4": lambda p: (
        p["a"] * quasisep.Matern32(scale=p["b"]) * quasisep.Cosine(scale=2.5)
    ),
}


def main():
    rng = np.random.default_rng(42)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=N), dtype=jnp.float32)
    params = {"a": jnp.float32(1.2), "b": jnp.float32(1.7)}
    out = {"device": str(jax.devices()[0]), "n": N}

    for name, make in FAMILIES.items():
        def loglik(p, X, y, make=make):
            gp = GaussianProcess(make(p), X, diag=0.1, assume_sorted=True)
            return gp.log_probability(y)

        def gsum(p, X, y, loglik=loglik):
            g = jax.grad(loglik)(p, X, y)
            return g["a"] + g["b"]

        try:
            entry = {
                "loglik_s": device_seconds_per_eval(
                    loglik, params, X, y, iters=30
                ),
                "grad_s": device_seconds_per_eval(
                    gsum, params, X, y, iters=15
                ),
            }
        except Exception as exc:  # noqa: BLE001 - record and continue
            entry = {"failed": f"{type(exc).__name__}: {exc}"}
        out[name] = entry
        print(name, entry, flush=True)

    path = os.path.join(os.path.dirname(__file__), "model_family_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
