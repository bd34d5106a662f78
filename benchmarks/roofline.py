"""Op-level device-time breakdown of the quasisep log-lik (TPU trace).

Captures a ``jax.profiler`` trace of the N=1e6 Matern32 marginal
log-likelihood (the headline O(N) workload), parses the trace, and prints
per-op device time grouped by op name — the ground truth for the blocked
scan's roofline analysis (docs/rooflines.md).

Run from /root/repo: python benchmarks/roofline.py [--n 1000000]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def capture(n, logdir):
    from tinygp_tpu import GaussianProcess
    from tinygp_tpu.kernels import quasisep

    rng = np.random.default_rng(0)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, n)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)

    @jax.jit
    def loglik(params):
        kernel = params["amp"] * quasisep.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
        return gp.log_probability(y)

    @jax.jit
    def chained(params, k):
        def body(i, acc):
            p = jax.tree_util.tree_map(
                lambda x: x * (1.0 + 1e-6 * jnp.tanh(acc)), params
            )
            return acc + 1e-6 * jnp.tanh(loglik(p))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    float(chained(params, 8))  # compile + warm
    with jax.profiler.trace(logdir):
        float(chained(params, 8))


def parse(logdir, iters=8):
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace found under {logdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    # Device-track complete events: group by op name, sum durations.
    pids = {
        e["pid"]
        for e in trace["traceEvents"]
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
        and "XLA" not in str(e.get("args", {}).get("name", ""))
    }
    per_op = collections.Counter()
    total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        name = e.get("name", "?")
        per_op[name] += dur
        total += dur
    print(f"total device time: {total * 1e3:.3f} ms "
          f"({total / iters * 1e3:.3f} ms/eval over {iters} chained evals)")
    for name, dur in per_op.most_common(40):
        print(f"{dur * 1e3:9.3f} ms  {100 * dur / total:5.1f}%  {name}")
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--logdir", default="/tmp/tinygp-roofline")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.n, args.logdir)
    parse(args.logdir)


if __name__ == "__main__":
    main()
