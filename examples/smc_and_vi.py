"""Variational inference and tempered SMC over GP hyperparameters.

New subsystems with no reference counterpart (the reference ships no
inference — ``/root/reference/docs/motivation.md:16-24``): ADVI for fast
approximate posteriors and adaptive tempered SMC for multimodal ones, both
vectorized over particles and TPU-shardable.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.samplers import fit_advi, run_smc, sample_advi

rng = np.random.default_rng(4)

# CI knob: TINYGP_TPU_EXAMPLE_SCALE in (0, 1] shrinks the workload so the
# full example suite can execute on the single-core CPU test host; 1 (the
# default) is the full-size run whose printed numbers the docs quote.
_S = float(os.environ.get("TINYGP_TPU_EXAMPLE_SCALE", "1"))
N = 100
X = jnp.asarray(np.sort(rng.uniform(0, 10, N)))
true_scale = 1.5
K = np.exp(-0.5 * (np.subtract.outer(X, X) / true_scale) ** 2)
y = jnp.asarray(np.linalg.cholesky(K + 1e-6 * np.eye(N)) @ rng.normal(size=N)
                + 0.2 * rng.normal(size=N))


def log_like(params):
    kernel = jnp.exp(params["log_amp"]) * kernels.ExpSquared(
        scale=jnp.exp(params["log_scale"])
    )
    gp = GaussianProcess(kernel, X, diag=0.04)
    return gp.log_probability(y)


def log_prior(params):
    return -0.5 * sum(jnp.sum(jnp.square(v)) for v in params.values())


def log_prob(params):
    return log_like(params) + log_prior(params)


init = {"log_amp": jnp.zeros(()), "log_scale": jnp.zeros(())}

# --- ADVI -------------------------------------------------------------------
result = fit_advi(
    jax.random.PRNGKey(0), log_prob, init, num_steps=max(int(600 * _S), 40), learning_rate=0.05
)
draws = sample_advi(jax.random.PRNGKey(1), result, max(int(2000 * _S), 100))
vi_scale = float(jnp.mean(jnp.exp(draws["log_scale"])))
print(f"ADVI scale estimate: {vi_scale:.2f} (truth {true_scale})")
trace = np.asarray(result.elbo_trace)
assert np.isfinite(trace[-1])
assert (0.2 if _S < 1 else 0.5) < vi_scale < (8.0 if _S < 1 else 4.0)

# --- adaptive tempered SMC ---------------------------------------------------
# Particles start from the prior; tempering bridges prior -> posterior with
# ESS-adaptive steps, systematic resampling, and random-walk mutations.
n_particles = max(int(1024 * _S), 128)
keys = jax.random.split(jax.random.PRNGKey(2), 2)
particles = {
    "log_amp": jax.random.normal(keys[0], (n_particles,)),
    "log_scale": jax.random.normal(keys[1], (n_particles,)),
}
out = run_smc(jax.random.PRNGKey(3), log_prior, log_like, particles)
smc_scale = float(jnp.mean(jnp.exp(out.particles["log_scale"])))
print(f"SMC scale estimate: {smc_scale:.2f}, "
      f"log Z = {float(out.log_evidence):.1f}, "
      f"stages = {int(out.num_stages)}, "
      f"mean acceptance = {float(jnp.mean(out.acceptance)):.2f}")
assert (0.2 if _S < 1 else 0.5) < smc_scale < (8.0 if _S < 1 else 4.0)
assert np.isfinite(float(out.log_evidence))
print("SMC + VI OK")
