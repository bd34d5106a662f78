"""Quickstart: exact GP regression with a squared-exponential kernel.

Capability parity with the reference's quickstart tutorial
(``/root/reference/docs/tutorials/quickstart.ipynb``): build a GP, evaluate
the marginal likelihood, condition on data, and draw prior/posterior
samples — TPU-first (float32, jit end-to-end).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels

rng = np.random.default_rng(42)
X = jnp.asarray(np.sort(rng.uniform(0, 10, 100)))
true_fn = lambda x: jnp.sin(x) + 0.3 * jnp.cos(2 * x)
y = true_fn(X) + 0.1 * jnp.asarray(rng.normal(size=X.shape[0]))

# A kernel is an algebra: scale * ExpSquared, plus a noise jitter.
kernel = 0.5 * kernels.ExpSquared(scale=1.0)
gp = GaussianProcess(kernel, X, diag=0.01)

# Marginal log-likelihood (jit-compatible, differentiable).
loglik = jax.jit(gp.log_probability)(y)
print(f"log p(y) = {loglik:.2f}")
assert np.isfinite(float(loglik))

# Condition on the data and predict at test points.
X_test = jnp.linspace(0, 10, 500)
_, cond_gp = gp.condition(y, X_test)
mu, var = cond_gp.loc, cond_gp.variance
assert mu.shape == (500,) and var.shape == (500,)
assert float(jnp.min(var)) > 0

# The posterior mean should track the truth well inside the data range.
err = jnp.max(jnp.abs(mu[50:450] - true_fn(X_test)[50:450]))
print(f"max predictive error (interior): {float(err):.3f}")
assert float(err) < 0.3

# Posterior samples.
samples = cond_gp.sample(jax.random.PRNGKey(0), shape=(5,))
assert samples.shape == (5, 500)

# predict() is the one-call version.
mu2 = gp.predict(y, X_test)
np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu), rtol=1e-5, atol=1e-5)
print("quickstart OK")
