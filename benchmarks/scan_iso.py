"""Isolated A/B of the single-pass Pallas scan vs the blocked XLA strategy.

Times ``riccati_scan_stacked`` (the Cholesky flow — the expensive combine)
and ``affine_scan_stacked`` (the whitening solve) SEPARATELY from the rest
of the log-likelihood, on the real TPU, for each (block, lanes) config in
the sweep. Prints one JSON line per measurement.

Usage: python benchmarks/scan_iso.py [N ...]
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

M = 2


def make_operands(n, seed=0):
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    p = jnp.asarray(0.3 * rng.normal(size=(M, n)), jnp.float32)
    q = jnp.asarray(0.3 * rng.normal(size=(M, n)), jnp.float32)
    a = jnp.asarray(
        0.1 * rng.normal(size=(M * M, n)) + 0.9 * np.eye(M).reshape(M * M, 1),
        jnp.float32,
    )
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    return d, p, q, a, y


def timed(fn, args, iters):
    """Chained-in-jit seconds/eval (two-length differenced)."""

    def make(k):
        @jax.jit
        def run(args):
            def body(i, carry):
                d, p, q, a, y = args
                out = fn(d * (1.0 + 1e-6 * jnp.tanh(carry)), p, q, a, y)
                return carry + 1e-6 * jnp.tanh(out)

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return run

    r1, r2 = make(iters), make(2 * iters)

    def best(run):
        float(run(args))
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(args))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(r1), best(r2)
    return max((t2 - t1) / iters, 1e-9)


def main():
    ns = [int(float(x)) for x in sys.argv[1:]] or [100_000, 1_000_000]
    sweep = os.environ.get("SCAN_ISO_SWEEP", "")
    configs = [None]
    if sweep:
        configs = [tuple(map(int, c.split("x"))) for c in sweep.split(",")]

    from tinygp_tpu.solvers.quasisep.scan import (
        affine_scan_stacked,
        riccati_scan_stacked,
    )
    from tinygp_tpu.solvers.quasisep import ops

    def ric(d, p, q, a, y):
        return jnp.sum(riccati_scan_stacked(d, p, q, a))

    def aff(d, p, q, a, y):
        return jnp.sum(affine_scan_stacked(a, p, M, 1))

    def llk(d, p, q, a, y):
        quad, logdet = ops.stacked_loglik_terms(d, p, q, a, y)
        return quad + logdet

    def gllk(d, p, q, a, y):
        # Exercises the reverse congruence + affine adjoint kernels.
        gd, gp_, gq, ga = jax.grad(llk, argnums=(0, 1, 2, 3))(d, p, q, a, y)
        return (
            jnp.sum(gd) + jnp.sum(gp_) + jnp.sum(gq) + jnp.sum(ga)
        )

    def measure(n, args, iters, label):
        jax.clear_caches()
        row = {"n": n, "variant": label}
        for name, fn in (
            ("ric", ric),
            ("aff", aff),
            ("llk", llk),
            ("gllk", gllk),
        ):
            row[name + "_s"] = timed(fn, args, iters)
        print(json.dumps(row), flush=True)

    for n in ns:
        args = make_operands(n)
        iters = max(10, min(100, 4_000_000 // n))
        os.environ["TINYGP_TPU_PALLAS_SCAN"] = "0"
        measure(n, args, iters, "off")
        os.environ["TINYGP_TPU_PALLAS_SCAN"] = "1"
        for cfg in configs:
            if cfg is not None:
                os.environ["TINYGP_TPU_PALLAS_BLOCK"] = str(cfg[0])
                os.environ["TINYGP_TPU_PALLAS_LANES"] = str(cfg[1])
            measure(
                n, args, iters,
                "on" if cfg is None else f"on:{cfg[0]}x{cfg[1]}",
            )


if __name__ == "__main__":
    main()
