"""Kernel mixtures and structured observation noise.

Capability parity with ``/root/reference/docs/tutorials/mixture.ipynb``
plus the full noise-model family (``noise.py``): Diagonal, Dense, and
Banded observation noise.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels, noise

rng = np.random.default_rng(21)
N = 80
X = jnp.asarray(np.sort(rng.uniform(0, 10, N)))
y = jnp.asarray(
    np.sin(np.asarray(X)) + 0.3 * np.sin(5.0 * np.asarray(X))
    + 0.1 * rng.normal(size=N)
)

# --- a two-component mixture: slow + fast structure -------------------------
slow = 1.0 * kernels.ExpSquared(scale=3.0)
fast = 0.3 * kernels.ExpSquared(scale=0.3)
mix = slow + fast
gp = GaussianProcess(mix, X, diag=0.01)
ll_mix = float(gp.log_probability(y))
ll_slow = float(GaussianProcess(slow, X, diag=0.01).log_probability(y))
print(f"mixture ll={ll_mix:.1f} vs slow-only ll={ll_slow:.1f}")
assert ll_mix > ll_slow

# --- noise models -----------------------------------------------------------
# Diagonal: per-point variances.
diag_noise = noise.Diagonal(diag=jnp.full(N, 0.01))
ll1 = float(GaussianProcess(mix, X, noise=diag_noise).log_probability(y))

# Dense: full correlated noise covariance.
F = jnp.asarray(rng.normal(size=(N, N)) * 0.01)
dense_noise = noise.Dense(
    value=jnp.matmul(F, F.T, precision="highest") + 0.01 * jnp.eye(N)
)
ll2 = float(GaussianProcess(mix, X, noise=dense_noise).log_probability(y))

# Banded: correlated noise with limited bandwidth (still O(N) with the
# quasiseparable solver).
off = jnp.zeros((N, 1)).at[:, 0].set(0.002)
banded_noise = noise.Banded(diag=jnp.full(N, 0.01), off_diags=off)
ll3 = float(GaussianProcess(mix, X, noise=banded_noise).log_probability(y))

for name, ll in (("diagonal", ll1), ("dense", ll2), ("banded", ll3)):
    assert np.isfinite(ll), name
print(f"noise models: diag={ll1:.1f} dense={ll2:.1f} banded={ll3:.1f}")
print("mixtures + noise OK")
