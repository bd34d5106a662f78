"""Mean functions and non-Gaussian likelihoods.

Capability parity with ``/root/reference/docs/tutorials/means.ipynb`` and
``likelihoods.ipynb``: parametric mean functions fit jointly with the
kernel, and non-Gaussian observations handled by putting the latent GP
inside a probabilistic model — here sampled with the built-in NUTS (the
reference hands this to numpyro; the numpyro bridge also works, see
``tinygp_tpu.numpyro_support``).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.samplers.hmc import run_mcmc

rng = np.random.default_rng(7)

# CI knob: TINYGP_TPU_EXAMPLE_SCALE in (0, 1] shrinks the workload so the
# full example suite can execute on the single-core CPU test host; 1 (the
# default) is the full-size run whose printed numbers the docs quote.
_S = float(os.environ.get("TINYGP_TPU_EXAMPLE_SCALE", "1"))
N = 60
X = jnp.asarray(np.sort(rng.uniform(0, 10, N)))

# --- mean functions -------------------------------------------------------
true_mean = lambda x: 0.4 * x - 1.0
y = jnp.asarray(
    np.asarray(true_mean(X))
    + np.sin(np.asarray(X))
    + 0.1 * rng.normal(size=N)
)

def loss(params):
    mean_fn = lambda x: params["slope"] * x + params["intercept"]
    gp = GaussianProcess(
        1.0 * kernels.ExpSquared(scale=1.0), X, diag=0.01, mean=mean_fn
    )
    return -gp.log_probability(y)

params = {"slope": jnp.zeros(()), "intercept": jnp.zeros(())}
g = jax.grad(loss)(params)
assert all(np.isfinite(float(v)) for v in g.values())

# Crude gradient fit of the mean parameters.
for _ in range(200):
    grads = jax.jit(jax.grad(loss))(params)
    params = jax.tree_util.tree_map(lambda p, d: p - 0.01 * d, params, grads)
print(f"fitted mean: slope={float(params['slope']):.2f} (truth 0.4), "
      f"intercept={float(params['intercept']):.2f} (truth -1.0)")
assert abs(float(params["slope"]) - 0.4) < 0.3

# A constant mean is just a scalar.
gp = GaussianProcess(kernels.ExpSquared(), X, diag=0.01, mean=2.0)
assert np.isfinite(float(gp.log_probability(y)))

# --- non-Gaussian likelihood: Poisson counts via a latent GP ---------------
rate_true = np.exp(np.sin(np.asarray(X)))
counts = jnp.asarray(rng.poisson(rate_true), jnp.float32)

def log_joint(params):
    """p(counts | f) p(f): latent log-rate f with a GP prior."""
    f = params["f"]
    gp = GaussianProcess(
        1.0 * kernels.ExpSquared(scale=1.5), X, diag=1e-4
    )
    prior = gp.log_probability(f)
    loglike = jnp.sum(counts * f - jnp.exp(f))
    return prior + loglike

init = {"f": jnp.zeros(N)}
samples, info = run_mcmc(
    jax.random.PRNGKey(0),
    log_joint,
    init,
    num_chains=8,
    num_warmup=max(int(300 * _S), 30),
    num_samples=max(int(300 * _S), 30),
    max_tree_depth=7,
    jitter_init=0.01,
)
f_mean = jnp.mean(samples["f"], axis=(0, 1))
corr = np.corrcoef(np.asarray(f_mean), np.log(rate_true))[0, 1]
print(f"latent log-rate correlation with truth: {corr:.2f}, "
      f"accept={float(jnp.mean(info.accept_prob)):.2f}")
assert corr > (0.2 if _S < 1 else 0.5)
print("means + likelihoods OK")
