"""Capture a jax.profiler trace of the headline workloads.

Writes a TensorBoard-compatible trace (``--logdir``) covering the
quasiseparable log-likelihood + gradient and one NUTS transition, so
kernel-level time (scan levels, VJP passes, leapfrog) can be inspected
with ``tensorboard --logdir ...`` or Perfetto.

Usage:  python benchmarks/profile_trace.py [--logdir /tmp/tinygp-trace]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.samplers.hmc import nuts, _ravel_spec


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="/tmp/tinygp-trace")
    parser.add_argument("--n", type=int, default=100_000)
    args = parser.parse_args()

    rng = np.random.default_rng(0)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, args.n)), jnp.float32)
    y = jnp.asarray(rng.normal(size=args.n), jnp.float32)

    def loglik(params):
        kernel = params["amp"] * quasisep.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
        return gp.log_probability(y)

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    f = jax.jit(loglik)
    g = jax.jit(jax.grad(loglik))

    ravel, unravel, dim = _ravel_spec(params)
    init_fn, step_fn = nuts(lambda z: loglik(unravel(z)), max_tree_depth=6)
    state = init_fn(ravel(params))
    step = jax.jit(
        lambda k, s: step_fn(k, s, jnp.float32(0.01), jnp.ones(dim))
    )

    # Warm (compile outside the trace).
    jax.block_until_ready(f(params))
    jax.block_until_ready(g(params))
    jax.block_until_ready(step(jax.random.PRNGKey(0), state))

    with jax.profiler.trace(args.logdir):
        for i in range(3):
            jax.block_until_ready(f(params))
            jax.block_until_ready(g(params))
            jax.block_until_ready(step(jax.random.PRNGKey(i), state))

    print("trace written to", args.logdir)


if __name__ == "__main__":
    main()
