"""CARMA(p, q) processes in the quasiseparable framework.

Capability parity with the reference's CARMA kernel
(``/root/reference/src/tinygp/kernels/quasisep.py:690-1030``): build a
CARMA kernel from AR/MA coefficients (or the stationarity-safe
quadratic parameterization), evaluate O(N) likelihoods, and differentiate.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep

# CI knob: TINYGP_TPU_EXAMPLE_SCALE in (0, 1] shrinks the workload so the
# full example suite can execute on the single-core CPU test host; 1 (the
# default) is the full-size run whose printed numbers the docs quote.
_S = float(os.environ.get("TINYGP_TPU_EXAMPLE_SCALE", "1"))
rng = np.random.default_rng(9)
N = max(int(2000 * _S), 200)
t = jnp.asarray(np.sort(rng.uniform(0, 100, N)))
y = jnp.asarray(rng.normal(size=N))

# CARMA(2, 1) from alpha (AR) and beta (MA) coefficients.
kernel = quasisep.CARMA.init(
    alpha=jnp.asarray([1.1, 1.5]), beta=jnp.asarray([1.0, 0.3])
)
gp = GaussianProcess(kernel, t, diag=0.1, assume_sorted=True)
ll = float(gp.log_probability(y))
print(f"CARMA(2,1) log-lik: {ll:.2f}")
assert np.isfinite(ll)

# Gradients w.r.t. the CARMA coefficients (for MAP fits / NUTS).
def loss(params):
    k = quasisep.CARMA.init(alpha=params["alpha"], beta=params["beta"])
    g = GaussianProcess(k, t, diag=0.1, assume_sorted=True)
    return -g.log_probability(y)

grads = jax.jit(jax.grad(loss))(
    {"alpha": jnp.asarray([1.1, 1.5]), "beta": jnp.asarray([1.0, 0.3])}
)
assert bool(jnp.all(jnp.isfinite(grads["alpha"])))
assert bool(jnp.all(jnp.isfinite(grads["beta"])))

# CARMA(1, 0) is the exponential kernel: cross-check against Exp.
c = 0.7
carma10 = quasisep.CARMA.init(alpha=jnp.asarray([c]), beta=jnp.asarray([1.0]))
# ACVF of CARMA(1,0) with beta0=1: sigma^2 = 1/(2c) * exp(-c tau)
exp_kernel = (1.0 / (2 * c)) * quasisep.Exp(scale=1.0 / c)
tt = jnp.linspace(0.0, 5.0, 7)
for tau in tt:
    v1 = float(carma10.evaluate(jnp.asarray(0.0), tau))
    v2 = float(exp_kernel.evaluate(jnp.asarray(0.0), tau))
    np.testing.assert_allclose(v1, v2, rtol=1e-4)
print("CARMA OK")
