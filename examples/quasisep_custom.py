"""Custom state-space kernels: derivatives and multiband observations.

Capability parity with ``/root/reference/docs/tutorials/quasisep-custom
.ipynb`` and ``derivative.ipynb``: subclass ``quasisep.Wrapper`` to change
the observation model of an existing SSM kernel — here (a) joint modeling
of a process and its derivative, and (b) multiband light curves where each
observation carries a band index with its own amplitude.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.utils.module import field


class Multiband(quasisep.Wrapper):
    """Each input is ``(t, band)``; band b scales the signal by amp[b]."""

    amplitudes: jax.Array = field()

    def coord_to_sortable(self, X):
        return X[0]

    def observation_model(self, X):
        t, band = X
        base = self.kernel.observation_model(t)
        return self.amplitudes[jnp.asarray(band, jnp.int32)] * base


class WithDerivative(quasisep.Wrapper):
    """Each input is ``(t, is_derivative)``; derivative observations see
    d/dt of the latent process (obs model times the design matrix)."""

    def coord_to_sortable(self, X):
        return X[0]

    def observation_model(self, X):
        t, deriv = X
        h = self.kernel.observation_model(t)
        dh = h @ jnp.asarray(self.kernel.design_matrix()).T
        return jnp.where(deriv > 0, dh, h)


rng = np.random.default_rng(3)
N = 400
t = np.sort(rng.uniform(0, 10, N))

# --- multiband ------------------------------------------------------------
bands = rng.integers(0, 3, size=N)
X = (jnp.asarray(t), jnp.asarray(bands))
y = jnp.asarray(np.sin(2 * t) * np.asarray([1.0, 0.5, 2.0])[bands]
                + 0.1 * rng.normal(size=N))

kernel = Multiband(
    kernel=quasisep.Matern52(scale=1.5),
    amplitudes=jnp.asarray([1.0, 0.5, 2.0]),
)
gp = GaussianProcess(kernel, X, diag=0.01, assume_sorted=True)
ll = float(gp.log_probability(y))
print(f"multiband log-lik: {ll:.2f}")
assert np.isfinite(ll)

# The multiband model with the right amplitudes should beat wrong ones.
wrong = Multiband(
    kernel=quasisep.Matern52(scale=1.5),
    amplitudes=jnp.asarray([1.0, 1.0, 1.0]),
)
ll_wrong = float(
    GaussianProcess(wrong, X, diag=0.01, assume_sorted=True).log_probability(y)
)
assert ll > ll_wrong

# --- derivative observations ----------------------------------------------
is_deriv = rng.integers(0, 2, size=N)
Xd = (jnp.asarray(t), jnp.asarray(is_deriv))
f = np.sin(1.3 * t)
df = 1.3 * np.cos(1.3 * t)
yd = jnp.asarray(np.where(is_deriv > 0, df, f) + 0.05 * rng.normal(size=N))

dkernel = WithDerivative(kernel=quasisep.Matern52(scale=2.0))
gpd = GaussianProcess(dkernel, Xd, diag=0.05**2, assume_sorted=True)
lld = float(gpd.log_probability(yd))
print(f"derivative log-lik: {lld:.2f}")
assert np.isfinite(lld)

# Gradients flow through the custom observation models.
def loss(amp):
    k = Multiband(kernel=quasisep.Matern52(scale=1.5),
                  amplitudes=amp)
    return -GaussianProcess(k, X, diag=0.01,
                            assume_sorted=True).log_probability(y)

g = jax.jit(jax.grad(loss))(jnp.asarray([1.0, 0.5, 2.0]))
assert g.shape == (3,) and bool(jnp.all(jnp.isfinite(g)))
print("custom SSM kernels OK")
