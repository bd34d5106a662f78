"""O(N) GP on a 100,000-point light curve with a stochastic SHO kernel.

Capability parity with ``/root/reference/docs/tutorials/quasisep.ipynb``:
the quasiseparable (celerite-style) solver factors the covariance in O(N)
and — unlike the reference, which defaults to the sequential scan — runs
the depth-parallel blocked scan by default, which is what makes this fast
on TPU (BASELINE config #3; one log-likelihood at N=1e5 takes ~0.4 ms on
one v5e chip).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep

rng = np.random.default_rng(11)

# CI knob: TINYGP_TPU_EXAMPLE_SCALE in (0, 1] shrinks the workload so the
# full example suite can execute on the single-core CPU test host; 1 (the
# default) is the full-size run whose printed numbers the docs quote.
_S = float(os.environ.get("TINYGP_TPU_EXAMPLE_SCALE", "1"))
N = max(int(100_000 * _S), 2000)
t = jnp.asarray(np.sort(rng.uniform(0, 100, N)), jnp.float32)
# A fake "light curve": quasi-periodic signal + noise.
y = jnp.asarray(
    (np.sin(2.1 * np.asarray(t)) * np.exp(-0.01 * np.asarray(t))
     + 0.5 * rng.normal(size=N)),
    jnp.float32,
)

kernel = 1.0 * quasisep.SHO(omega=2.1, quality=20.0)
gp = GaussianProcess(kernel, t, diag=0.25, assume_sorted=True)

loglik = jax.jit(gp.log_probability)(y)
print(f"log p(y) [N={N}] = {float(loglik):.1f}")
assert np.isfinite(float(loglik))

# Gradients through the O(N) factorization (what NUTS consumes).
def loss(params):
    k = params["amp"] * quasisep.SHO(
        omega=params["omega"], quality=params["quality"]
    )
    g = GaussianProcess(k, t, diag=0.25, assume_sorted=True)
    return -g.log_probability(y)

grads = jax.jit(jax.grad(loss))(
    {"amp": jnp.float32(1.0), "omega": jnp.float32(2.1),
     "quality": jnp.float32(20.0)}
)
assert all(np.isfinite(float(v)) for v in grads.values())
print("grads:", {k: f"{float(v):.2f}" for k, v in grads.items()})

# Conditioning at the training points stays O(N) (QSM posterior). Use a
# thinned subset at moderate quality: posterior variances are tiny
# cancellation-prone quantities, and float32 only resolves them while
# cond(K) stays moderate (see docs/troubleshooting.md).
tc, yc = t[::20], y[::20]
Nc = tc.shape[0]
kernel_c = 1.0 * quasisep.SHO(omega=2.1, quality=2.0)
gp_c = GaussianProcess(kernel_c, tc, diag=0.25, assume_sorted=True)
_, cond_gp = gp_c.condition(yc)
var = cond_gp.variance
assert var.shape == (Nc,)
assert float(jnp.min(var)) > 0, float(jnp.min(var))

# Prediction at new points uses the rectangular (GeneralQSM) scans.
t_test = jnp.linspace(10.0, 20.0, 500, dtype=jnp.float32)
mu = gp_c.predict(yc, t_test)
assert mu.shape == (500,)
print("posterior mean range:", float(mu.min()), float(mu.max()))

# The whole family: Exp, Matern32/52, Cosine, Celerite, SHO, sums/products.
t_small, y_small = t[:2000], y[:2000]
for k in (
    quasisep.Exp(scale=1.0),
    quasisep.Matern32(scale=1.0),
    quasisep.Matern52(scale=1.0),
    1.5 * quasisep.Cosine(scale=2.0),
    quasisep.Celerite(a=1.0, b=0.2, c=0.5, d=1.1),
    quasisep.SHO(omega=1.0, quality=0.3),   # overdamped branch
    quasisep.Matern32(scale=1.0) + quasisep.Cosine(scale=3.0),
    quasisep.Matern32(scale=1.0) * quasisep.Cosine(scale=3.0),
):
    g = GaussianProcess(k, t_small, diag=0.25, assume_sorted=True)
    assert np.isfinite(float(g.log_probability(y_small))), type(k).__name__
print("quasisep light curve OK")
