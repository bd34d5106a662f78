"""The kernel algebra: sums, products, constants, and custom kernels.

Capability parity with ``/root/reference/docs/tutorials/kernels.ipynb``:
kernels compose with ``+``/``*``, operate pointwise through ``evaluate``,
and lift to matrices via batching; custom kernels are one function.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels

rng = np.random.default_rng(0)
X = jnp.asarray(np.sort(rng.uniform(0, 10, 60)))
y = jnp.asarray(rng.normal(size=60))

# Composition: periodic times a long-scale envelope plus white-ish bumps.
k1 = 2.0 * kernels.ExpSineSquared(scale=1.0, gamma=1.5) * kernels.ExpSquared(
    scale=5.0
)
k2 = 0.5 * kernels.Matern32(scale=0.5)
kernel = k1 + k2

# Pointwise evaluation and matrix construction agree.
v = kernel.evaluate(X[0], X[1])
M = kernel(X, X)
np.testing.assert_allclose(float(M[0, 1]), float(v), rtol=1e-6)
assert M.shape == (60, 60)

# All the stationary kernels.
for k in (
    kernels.Exp(scale=1.0),
    kernels.ExpSquared(scale=1.0),
    kernels.Matern32(scale=1.0),
    kernels.Matern52(scale=1.0),
    kernels.Cosine(scale=1.0),
    kernels.ExpSineSquared(scale=1.0, gamma=2.0),
    kernels.RationalQuadratic(scale=1.0, alpha=1.5),
    kernels.DotProduct(),
    kernels.Polynomial(order=2, scale=1.0, sigma=0.5),
):
    gp = GaussianProcess(k, X, diag=0.1)
    assert np.isfinite(float(gp.log_probability(y))), type(k).__name__

# A custom kernel is just a callable on a pair of points.
def silu_kernel(x1, x2):
    return jnp.exp(-0.5 * jnp.square(x1 - x2)) * (1 + x1 * x2 / 100.0)

custom = kernels.Custom(silu_kernel)
gp = GaussianProcess(0.8 * custom + kernels.Constant(0.1), X, diag=0.1)
assert np.isfinite(float(gp.log_probability(y)))
print("kernel algebra OK")
