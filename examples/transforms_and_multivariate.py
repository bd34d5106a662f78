"""Input transforms and multivariate inputs.

Capability parity with ``/root/reference/docs/tutorials/transforms.ipynb``
and ``multivariate.ipynb``: kernels over R^d inputs, per-dimension length
scales via ``Linear``, correlated metrics via ``Cholesky``, and axis
selection via ``Subspace``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels, transforms

rng = np.random.default_rng(5)
N, D = 80, 3
X = jnp.asarray(rng.normal(size=(N, D)))
y = jnp.asarray(rng.normal(size=N))

# Per-dimension length scales: scale the inputs before an isotropic kernel.
ard = transforms.Linear(
    jnp.asarray([1.0, 0.5, 2.0]), kernels.ExpSquared()
)
gp = GaussianProcess(ard, X, diag=0.1)
assert np.isfinite(float(gp.log_probability(y)))

# Full correlated metric through a Cholesky factor.
L = jnp.asarray([[1.0, 0.0, 0.0], [0.2, 0.8, 0.0], [-0.1, 0.3, 1.2]])
corr = transforms.Cholesky(L, kernels.Matern52())
gp = GaussianProcess(corr, X, diag=0.1)
assert np.isfinite(float(gp.log_probability(y)))

# Pack/unpack a parameter vector into the factor.
packed = transforms.Cholesky.from_parameters(
    jnp.ones(D), jnp.asarray([0.1, 0.2, 0.3]), kernels.Matern52()
)
gp = GaussianProcess(packed, X, diag=0.1)
assert np.isfinite(float(gp.log_probability(y)))

# Restrict a kernel to one input axis, compose across axes.
k_time = transforms.Subspace(0, kernels.Matern32(scale=1.0))
k_band = transforms.Subspace(1, kernels.ExpSquared(scale=2.0))
gp = GaussianProcess(k_time * k_band, X, diag=0.1)
assert np.isfinite(float(gp.log_probability(y)))

# Arbitrary coordinate maps via Transform.
warp = transforms.Transform(
    lambda x: jnp.stack([jnp.sin(x[0]), x[1] ** 2]),
    kernels.ExpSquared(),
)
gp = GaussianProcess(warp, X, diag=0.1)
assert np.isfinite(float(gp.log_probability(y)))

# Prediction on new multivariate points.
X_test = jnp.asarray(rng.normal(size=(25, D)))
mu, var = GaussianProcess(ard, X, diag=0.1).predict(
    y, X_test, return_var=True
)
assert mu.shape == (25,) and float(jnp.min(var)) > 0
print("transforms + multivariate OK")
