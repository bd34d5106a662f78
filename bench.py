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

Timing methodology: the device in this environment is reached through a
tunnel whose ``block_until_ready`` does not reliably wait for execution and
which can serve value-identical dispatches from cache. Each measurement
therefore runs a **serial, value-chained ``lax.fori_loop`` inside one jit**
(every iteration perturbs the parameters through the carry, so iterations
are distinct and strictly ordered), forces a scalar fetch of the result,
and cancels fixed overhead (tunnel round trip, dispatch) by differencing a
k-iteration and a 2k-iteration loop.

Extra diagnostic timings (dense path, gradient path, other N) go to
BENCH_DETAILS.json.
"""

import json
import os
import subprocess
import sys
import time

import jax

# Persistent compilation cache: cold compiles of the chained timing loops
# are tens of seconds each and dominate a fresh bench run's wall time;
# with the cache, reruns (and the driver's timeboxed invocation) skip them.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

N_MAIN = 100_000
BASELINE_SECONDS = 8.49e-3  # celerite2 C++ (1-thread CPU), N=1e5, BASELINE.md


def maybe_enable_pallas_scan(details):
    """Gate the single-pass Pallas scan behind an isolated A/B check.

    The kernel is validated end-to-end (value parity + speed win on the
    headline workload) in a subprocess with a hard timeout, so a Mosaic
    miscompile or a device hang can cost at most the timeout — the main
    measurements below always run. On success the flag is exported for this
    process and every jit trace below picks the Pallas strategy up through
    ``pallas_scan.supports``.
    """
    if jax.default_backend() != "tpu":
        return
    here = os.path.dirname(os.path.abspath(__file__))

    # The A/B subprocess costs tunnel time on every run; its verdict only
    # changes when the scan implementation (or jaxlib) does, so EVERY
    # outcome — positive, negative, or timeout — is cached keyed by a hash
    # of the defining files plus the jaxlib version. The gate's share of a
    # timeboxed bench run is hard-capped at 60 s: a cold-compile timeout is
    # recorded as "skipped: budget" (and cached, so it is paid at most
    # once per implementation change) rather than eating the run.
    import hashlib

    import jaxlib

    h = hashlib.sha256()
    h.update(getattr(jaxlib, "__version__", "?").encode())
    for rel in (
        "tinygp_tpu/solvers/quasisep/pallas_scan.py",
        "tinygp_tpu/solvers/quasisep/scan.py",
        "benchmarks/pallas_scan_flip.py",
    ):
        with open(os.path.join(here, rel), "rb") as f:
            h.update(f.read())
    cache_path = os.path.join(
        here, ".jax_cache", f"pallas_gate_{h.hexdigest()[:16]}.json"
    )
    verdict = None
    try:
        with open(cache_path) as f:
            verdict = json.load(f)
            verdict["cached"] = True
    except Exception:  # noqa: BLE001 - absent/corrupt cache means re-measure
        pass
    if verdict is None:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(here, "benchmarks", "pallas_scan_flip.py")],
                cwd=here,
                timeout=60,
                capture_output=True,
                text=True,
            )
            verdict = json.loads(proc.stdout.strip().splitlines()[-1])
        except subprocess.TimeoutExpired:
            verdict = {"ok": False, "why": "skipped: budget (60s gate cap)"}
        except Exception as exc:  # noqa: BLE001 - containment is the point
            verdict = {"ok": False, "why": f"{type(exc).__name__}: {exc}"}
        try:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            with open(cache_path, "w") as f:
                json.dump(verdict, f)
        except Exception:  # noqa: BLE001 - cache write is best-effort
            pass
    details["pallas_scan_gate"] = verdict
    # The single-pass scan defaults ON (supports() reads the flag's
    # default as "1"); the gate's job is now to actively DISABLE it when
    # the A/B reports a regression or parity failure on this backend. A
    # budget/timeout skip leaves the validated default in place.
    if verdict.get("ok"):
        os.environ["TINYGP_TPU_PALLAS_SCAN"] = "1"
    elif verdict.get("t_on_s") is not None:
        # The A/B genuinely ran and the kernel lost (or broke parity).
        os.environ["TINYGP_TPU_PALLAS_SCAN"] = "0"


def device_seconds_per_eval(fn, params, *args, iters=50):
    """Per-evaluation device time of ``fn(params, *args) -> scalar``.

    Chains the parameters on the loop carry so every iteration computes
    distinct values and must execute serially; differences two loop lengths
    so constant overhead cancels exactly.
    """

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

    run1, run2 = make(iters), make(2 * iters)

    def timed(run):
        float(run(params, *args))  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(run1), timed(run2)
    return max((t2 - t1) / iters, 1e-9)


def hang_watchdog(timeout_s: int = 240):
    """Arm a hard-exit fallback around the first (in-process) device touch.

    History of this guard: the axon TPU tunnel has been observed fully
    unresponsive for 10+ hours (2026-08-17; backend init blocks forever in
    ``make_c_api_client``), while a HEALTHY tunnel takes anywhere from 13 s
    to >120 s to accept a fresh connection (2026-08-19). A subprocess probe
    handled the first failure mode but, by opening a *second* connection,
    routinely timed out against the second and misreported a live device as
    down. Instead: touch the device in-process (one connection, generous
    budget) with a daemon timer that — if init is still blocked after
    ``timeout_s`` — prints the clearly-labeled stale-fallback line and
    hard-exits, since a thread cannot interrupt a blocked C call.
    """
    import threading

    def fire():
        print(
            f"bench: device init still blocked after {timeout_s}s; "
            "emitting stale fallback",
            file=sys.stderr,
            flush=True,
        )
        ok = stale_fallback()
        os._exit(0 if ok else 2)

    timer = threading.Timer(timeout_s, fire)
    timer.daemon = True
    timer.start()
    return timer


def stale_fallback() -> bool:
    """When the device is unreachable, report the last good run, marked.

    Returns True if a clearly-labeled stale line was printed.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_DETAILS.json")) as f:
            details = json.load(f)
        t_main = float(details["quasisep_loglik_n1e5_s"])
    except Exception:  # noqa: BLE001
        return False
    print(
        json.dumps(
            {
                "metric": (
                    "quasisep GP log-lik evals/s (N=1e5, Matern32) "
                    "[STALE: TPU tunnel unreachable at bench time; value "
                    "is the last successful on-device measurement from "
                    "BENCH_DETAILS.json]"
                ),
                "value": 1.0 / t_main,
                "unit": "evals/s",
                "vs_baseline": BASELINE_SECONDS / t_main,
            }
        )
    )
    return True


def main():
    from tinygp_tpu import GaussianProcess
    from tinygp_tpu import kernels as dense_kernels
    from tinygp_tpu.kernels import quasisep

    t_start = time.perf_counter()

    def note(msg):
        # Progress to stderr so a timed-out run still shows where the time
        # went (the tunnel's connection setup alone has been observed to
        # take anywhere from 13 s to minutes).
        print(f"bench[{time.perf_counter() - t_start:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    rng = np.random.default_rng(42)
    watchdog = hang_watchdog()
    device_name = str(jax.devices()[0])  # first device touch; may block
    watchdog.cancel()
    details = {"device": device_name, "dtype": "float32"}

    def flush_details():
        # Incremental writes: a run killed by the driver's timeout still
        # leaves every completed measurement on disk. MERGED into the
        # existing file so a partial run never erases older measurements
        # (the stale fallback depends on them).
        merged = {}
        try:
            with open("BENCH_DETAILS.json") as f:
                merged = json.load(f)
        except Exception:  # noqa: BLE001 - absent or corrupt prior file
            pass
        merged.update(details)
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(merged, f, indent=2)

    note("device up; running pallas-scan gate")
    maybe_enable_pallas_scan(details)
    flush_details()

    # --- headline: quasisep Matern32 log-lik, N = 1e5, parallel scan ---
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N_MAIN)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=N_MAIN), dtype=jnp.float32)

    def quasisep_loglik(params, X, y):
        kernel = params["amp"] * quasisep.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
        return gp.log_probability(y)

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    note("measuring quasisep log-lik N=1e5")
    t_main = device_seconds_per_eval(quasisep_loglik, params, X, y, iters=100)
    details["quasisep_loglik_n1e5_s"] = t_main
    details["quasisep_loglik_n1e5_value"] = float(
        jax.jit(quasisep_loglik)(params, X, y)
    )
    flush_details()

    # --- diagnostics: gradient at N=1e5 ---
    def gsum(params, X, y):
        g = jax.grad(quasisep_loglik)(params, X, y)
        return g["amp"] + g["scale"]

    note("measuring quasisep grad N=1e5")
    details["quasisep_grad_n1e5_s"] = device_seconds_per_eval(
        gsum, params, X, y, iters=50
    )
    flush_details()

    # --- diagnostics: N = 1e6 quasisep ---
    try:
        note("measuring quasisep N=1e6")
        X6 = jnp.asarray(
            np.sort(rng.uniform(0, 10, 1_000_000)), dtype=jnp.float32
        )
        y6 = jnp.asarray(rng.normal(size=1_000_000), dtype=jnp.float32)
        details["quasisep_loglik_n1e6_s"] = device_seconds_per_eval(
            quasisep_loglik, params, X6, y6, iters=20
        )
        details["quasisep_grad_n1e6_s"] = device_seconds_per_eval(
            gsum, params, X6, y6, iters=10
        )
    except Exception as exc:  # noqa: BLE001 - record and continue
        details["quasisep_loglik_n1e6_s"] = f"failed: {exc}"
    flush_details()

    # --- diagnostics: dense path, N = 1e4 (A100 baseline: 46 ms) ---
    try:
        note("measuring dense N=1e4")
        Xd = jnp.asarray(np.sort(rng.uniform(0, 10, 10_000)), dtype=jnp.float32)
        yd = jnp.asarray(rng.normal(size=10_000), dtype=jnp.float32)

        def dense_loglik(params, X, y):
            kernel = params["amp"] * dense_kernels.Matern32(
                scale=params["scale"]
            )
            gp = GaussianProcess(kernel, X, diag=0.1)
            return gp.log_probability(y)

        details["dense_loglik_n1e4_s"] = device_seconds_per_eval(
            dense_loglik, params, Xd, yd, iters=10
        )
        details["dense_loglik_n1e4_vs_a100"] = 46e-3 / details[
            "dense_loglik_n1e4_s"
        ]
    except Exception as exc:  # noqa: BLE001
        details["dense_loglik_n1e4_s"] = f"failed: {exc}"

    note("done; writing BENCH_DETAILS.json")
    flush_details()

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
