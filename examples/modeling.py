"""Hyperparameter inference: MAP fit with optax, full posterior with NUTS.

Capability parity with the reference's modeling tutorial
(``/root/reference/docs/tutorials/modeling.ipynb``), which hands inference
to numpyro — here the built-in vectorized NUTS does it natively (the
samplers are a new subsystem; the reference deliberately ships none,
``/root/reference/docs/motivation.md:16-24``).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.samplers.hmc import run_mcmc

rng = np.random.default_rng(0)

# CI knob: TINYGP_TPU_EXAMPLE_SCALE in (0, 1] shrinks the workload so the
# full example suite can execute on the single-core CPU test host; 1 (the
# default) is the full-size run whose printed numbers the docs quote.
_S = float(os.environ.get("TINYGP_TPU_EXAMPLE_SCALE", "1"))
N = 120
X = jnp.asarray(np.sort(rng.uniform(0, 10, N)))
true_amp, true_scale, true_noise = 1.2, 1.8, 0.2
K = true_amp * np.exp(-0.5 * (np.subtract.outer(X, X) / true_scale) ** 2)
y = jnp.asarray(
    np.linalg.cholesky(K + 1e-6 * np.eye(N))
    @ rng.normal(size=N) + true_noise * rng.normal(size=N)
)


def build_gp(params):
    kernel = jnp.exp(params["log_amp"]) * kernels.ExpSquared(
        scale=jnp.exp(params["log_scale"])
    )
    return GaussianProcess(kernel, X, diag=jnp.exp(2 * params["log_noise"]))


def neg_log_posterior(params):
    lp = build_gp(params).log_probability(y)
    prior = -0.5 * sum(jnp.sum(jnp.square(v)) for v in params.values())
    return -(lp + prior)


params = {
    "log_amp": jnp.zeros(()),
    "log_scale": jnp.zeros(()),
    "log_noise": jnp.asarray(-1.0),
}

# --- MAP with the compiled fitter ----------------------------------------
# fit_map drives optax inside one lax.scan: 200 steps = ONE dispatch (a
# hand-rolled Python loop pays the tunnel round trip 200 times).
from tinygp_tpu import fit_map

fit = fit_map(
    neg_log_posterior, params, optimizer=optax.adam(0.05), num_steps=max(int(200 * _S), 10)
)
params, loss = fit.params, fit.loss
print(f"MAP: loss={float(loss):.2f}, "
      f"amp={float(jnp.exp(params['log_amp'])):.2f}, "
      f"scale={float(jnp.exp(params['log_scale'])):.2f}, "
      f"noise={float(jnp.exp(params['log_noise'])):.2f}")

# --- Posterior with vectorized NUTS --------------------------------------
samples, info = run_mcmc(
    jax.random.PRNGKey(1),
    lambda p: -neg_log_posterior(p),
    params,
    num_chains=max(int(16 * _S), 4),
    num_warmup=max(int(200 * _S), 20),
    num_samples=max(int(200 * _S), 20),
    max_tree_depth=6,
    jitter_init=0.1,
)
post_scale = jnp.exp(samples["log_scale"])
mean_scale = float(jnp.mean(post_scale))
sd_scale = float(jnp.std(post_scale))
accept = float(jnp.mean(info.accept_prob))
print(f"posterior scale = {mean_scale:.2f} +/- {sd_scale:.2f} "
      f"(truth {true_scale}), accept={accept:.2f}")
assert (0.3 if _S < 1 else 0.5) < accept <= 1.0
if _S >= 1:
    assert abs(mean_scale - true_scale) < 4 * sd_scale + 0.5

# --- Convergence diagnostics ----------------------------------------------
from tinygp_tpu.samplers import summary

diag = summary(samples)
for name, stats in diag.items():
    rhat = float(stats["rhat"].max())
    ess = float(stats["ess"].min())
    print(f"{name}: rhat={rhat:.3f} ess={ess:.0f}")
    assert rhat < 1.1, (name, rhat)
    # Geyer ESS on 16 chains x 200 retained samples fluctuates run to
    # run (observed 74-200+ for log_amp across seeds); 50 still flags a
    # genuinely stuck sampler without making the example a coin flip.
    assert ess > 50, (name, ess)
print("modeling OK")
