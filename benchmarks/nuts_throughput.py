"""NUTS samples/s/chip on a GP hyperparameter posterior.

BASELINE config #4: a light-curve-style SHO model with 1024 parallel
chains. Wall-clock includes warmup (what a user actually waits for);
"samples/s/chip" counts retained post-warmup samples across all chains.

Usage:  python benchmarks/nuts_throughput.py [--chains 1024] [--n 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.samplers.hmc import run_mcmc


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chains", type=int, default=1024)
    parser.add_argument("--n", type=int, default=512)
    parser.add_argument("--warmup", type=int, default=100)
    parser.add_argument("--samples", type=int, default=100)
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 10, args.n))
    y = np.sin(3 * t) * np.exp(-0.1 * t) + 0.3 * rng.normal(size=args.n)
    X = jnp.asarray(t, jnp.float32)
    Y = jnp.asarray(y, jnp.float32)

    def log_prob(params):
        amp = jnp.exp(params["log_amp"])
        omega = jnp.exp(params["log_omega"])
        q = jnp.exp(params["log_q"])
        jitter = jnp.exp(params["log_jitter"])
        kernel = amp * quasisep.SHO(omega=omega, quality=q)
        gp = GaussianProcess(kernel, X, diag=jitter + 0.09, assume_sorted=True)
        return gp.log_probability(Y) - 0.5 * sum(
            jnp.sum(jnp.square(v)) for v in params.values()
        )

    init = {
        "log_amp": jnp.float32(0.0),
        "log_omega": jnp.float32(1.0),
        "log_q": jnp.float32(1.0),
        "log_jitter": jnp.float32(-2.0),
    }

    def one_run(seed):
        t0 = time.time()
        samples, info = run_mcmc(
            jax.random.PRNGKey(seed),
            log_prob,
            init,
            num_chains=args.chains,
            num_warmup=args.warmup,
            num_samples=args.samples,
            max_tree_depth=6,
            jitter_init=0.1,
            steps_per_dispatch=25,
        )
        # Force completion.
        m = {k: float(jnp.mean(v)) for k, v in samples.items()}
        return time.time() - t0, m, float(jnp.mean(info.accept_prob))

    w_cold, _, _ = one_run(0)
    w_warm, means, accept = one_run(1)
    total = args.chains * args.samples
    print(f"cold (incl compile): {w_cold:.1f}s; warm: {w_warm:.1f}s")
    print(f"-> {total / w_warm:.0f} samples/s/chip "
          f"({args.chains} chains x {args.samples} samples + "
          f"{args.warmup} warmup, N={args.n})")
    print(f"accept={accept:.2f} means={means}")


if __name__ == "__main__":
    main()
