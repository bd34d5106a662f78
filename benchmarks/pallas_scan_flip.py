"""End-to-end gate for the single-pass Pallas monoid scan.

Run on the real TPU by ``bench.py`` (in a subprocess, under a timeout, so a
Mosaic miscompile or device hang can never take the benchmark down). Decides
whether ``TINYGP_TPU_PALLAS_SCAN=1`` is safe AND profitable for the headline
workload by measuring the same quasiseparable Matern-3/2 log-likelihood both
ways and checking the values agree.

Prints exactly one JSON line:
  {"ok": bool, "why": str, "t_off_s": float, "t_on_s": float}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 100_000
ITERS = 50


def _loglik_fn():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinygp_tpu import GaussianProcess
    from tinygp_tpu.kernels import quasisep

    rng = np.random.default_rng(42)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=N), dtype=jnp.float32)

    def loglik(params, X, y):
        kernel = params["amp"] * quasisep.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
        return gp.log_probability(y)

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    return jax, jnp, loglik, params, X, y


def _timed(jax, jnp, loglik, params, X, y):
    """Value + seconds/eval, two-length differenced (as in bench.py).

    The single ~25-40 ms tunnel roundtrip is larger than ``ITERS`` whole
    evaluations of this workload, so a single-length loop is overhead-
    dominated and blind to real speed differences; differencing a k- and a
    2k-iteration loop cancels the fixed cost exactly.

    ``X``/``y`` are jit ARGUMENTS (not closed-over constants) to match
    bench.py's program exactly: with the data constant-folded into the
    trace, Mosaic assigns different layouts inside the Pallas kernel than
    it does for the argument-fed program, and a kernel that compiles one
    way can fail the other (seen 2026-08-19: "Broadcast in both sublanes
    and lanes" only in the argument-fed variant)."""

    def make(n):
        @jax.jit
        def run(params, X, y):
            def body(i, carry):
                p = jax.tree_util.tree_map(
                    lambda x: x * (1.0 + 1e-6 * jnp.tanh(carry)), params
                )
                return carry + 1e-6 * jnp.tanh(loglik(p, X, y))

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

    run1, run2 = make(ITERS), make(2 * ITERS)
    value = float(jax.jit(loglik)(params, X, y))

    def best_of(run):
        float(run(params, X, y))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, X, y))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = best_of(run1), best_of(run2)
    return value, max((t2 - t1) / ITERS, 1e-9)


def _grad_value(jax, jnp, loglik, params, X, y):
    """Per-parameter gradients — exercises the VJP (residuals) path.

    The fused log-lik kernel has a second Mosaic program for its forward-
    with-residuals variant plus the hand-written Riccati adjoint; a gate
    that only runs the forward would pass while the bench's gradient
    measurement crashes (the r04 failure mode, one call later).

    Components are compared individually: their SUM is a catastrophic
    cancellation at this N (measured 2026-08-20: f64 oracle -23.07 vs
    ~+417 for BOTH f32 strategies, which agree with each other to ~2e-3
    relative per component — the f32 reduction noise is shared, not a
    kernel defect), so a sum-based check rejects on noise.
    """
    g = jax.jit(jax.grad(loglik))(params, X, y)
    return {k: float(v) for k, v in g.items()}


def main() -> None:
    result = {"ok": False, "why": "", "t_off_s": None, "t_on_s": None}
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )

        if jax.default_backend() != "tpu":
            result["why"] = f"backend is {jax.default_backend()}, not tpu"
            print(json.dumps(result))
            return

        # The flag is read at TRACE time, and traces are cached: fresh
        # closures are not enough, because the GP API's module-level jitted
        # internals (e.g. gp._log_probability) keep their first trace — the
        # ON variant would silently reuse the OFF variant's blocked-scan
        # program and the A/B would compare blocked vs blocked (this
        # happened: a "parity ok" verdict while the Pallas kernel didn't
        # even compile). clear_caches() forces a genuine retrace per
        # variant; the persistent compile cache still absorbs the repeat
        # XLA compiles across runs.
        os.environ["TINYGP_TPU_PALLAS_SCAN"] = "0"
        jax.clear_caches()
        jax_, jnp, loglik, params, X, y = _loglik_fn()
        v_off, t_off = _timed(jax_, jnp, loglik, params, X, y)
        g_off = _grad_value(jax_, jnp, loglik, params, X, y)
        result["t_off_s"] = t_off

        os.environ["TINYGP_TPU_PALLAS_SCAN"] = "1"
        jax.clear_caches()
        jax_, jnp, loglik, params, X, y = _loglik_fn()
        v_on, t_on = _timed(jax_, jnp, loglik, params, X, y)
        g_on = _grad_value(jax_, jnp, loglik, params, X, y)
        result["t_on_s"] = t_on

        rel = abs(v_on - v_off) / max(1.0, abs(v_off))
        grel = max(
            abs(g_on[k] - g_off[k]) / max(1.0, abs(g_off[k]))
            for k in g_off
        )
        if rel > 1e-5:
            result["why"] = f"value mismatch: off={v_off} on={v_on}"
        elif grel > 1e-2:
            result["why"] = f"grad mismatch: off={g_off} on={g_on}"
        elif t_on >= t_off:
            result["why"] = f"no speedup: on={t_on:.2e}s off={t_off:.2e}s"
        else:
            result["ok"] = True
            result["why"] = (
                f"parity ok (rel={rel:.1e}, grad {grel:.1e}), "
                f"{t_off / t_on:.2f}x"
            )
    except Exception as exc:  # noqa: BLE001 - the whole point is containment
        result["why"] = f"{type(exc).__name__}: {exc}"

    # Persist the outcome in the COMMITTED verdict file keyed by the
    # implementation fingerprint: a pass recorded here (and committed by
    # the builder) is what turns the Pallas default on for library users
    # and for the driver's fresh-checkout bench (pallas_gate.enabled).
    try:
        from tinygp_tpu.solvers.quasisep import pallas_gate

        result["fingerprint"] = pallas_gate.record_verdict(
            result["ok"],
            result["why"],
            t_off_s=result["t_off_s"],
            t_on_s=result["t_on_s"],
        )
    except Exception as exc:  # noqa: BLE001 - read-only checkout etc.
        result["record_error"] = f"{type(exc).__name__}: {exc}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
