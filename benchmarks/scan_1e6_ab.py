"""A/B the Pallas single-pass scan vs the blocked XLA scan at N=1e6.

The flip gate (``pallas_scan_flip.py``) runs the headline N=1e5 workload;
depth-latency savings grow with N, so this script measures the same
Matern-3/2 log-likelihood at N=1e6 both ways, plus tile-knob variants.

Prints one JSON line with the timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1_000_000
ITERS = 30


def _loglik_fn():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinygp_tpu import GaussianProcess
    from tinygp_tpu.kernels import quasisep

    rng = np.random.default_rng(42)
    X = jnp.asarray(np.sort(rng.uniform(0, 100, N)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=N), dtype=jnp.float32)

    def loglik(params):
        kernel = params["amp"] * quasisep.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
        return gp.log_probability(y)

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    return jax, jnp, loglik, params


def _timed(jax, jnp, loglik, params):
    @jax.jit
    def run(params, n):
        def body(i, carry):
            p = jax.tree_util.tree_map(
                lambda x: x * (1.0 + 1e-6 * jnp.tanh(carry)), params
            )
            return carry + 1e-6 * jnp.tanh(loglik(p))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    value = float(jax.jit(loglik)(params))

    def t(n):
        float(run(params, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = t(ITERS), t(2 * ITERS)
    return value, max((t2 - t1) / ITERS, 1e-9)


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {}
    os.environ["TINYGP_TPU_PALLAS_SCAN"] = "0"
    jax_, jnp, loglik, params = _loglik_fn()
    v_off, t_off = _timed(jax_, jnp, loglik, params)
    out["t_off_s"] = t_off

    os.environ["TINYGP_TPU_PALLAS_SCAN"] = "1"
    jax_, jnp, loglik, params = _loglik_fn()
    v_on, t_on = _timed(jax_, jnp, loglik, params)
    out["t_on_s"] = t_on
    out["rel_value_err"] = abs(v_on - v_off) / max(1.0, abs(v_off))
    out["speedup"] = t_off / t_on
    print(json.dumps(out))


if __name__ == "__main__":
    main()
