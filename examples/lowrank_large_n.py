"""Large-N dense kernels with the inducing-point low-rank solver.

The reference benchmarks itself against george's HODLR approximation for
dense kernels past N ~ 1e4 (BASELINE.md: 58 ms at N=1e4) but ships no
approximate solver. ``LowRankSolver`` fills that slot TPU-first: two tall
GEMMs and an M x M factorization — O(N M^2) — so a 50,000-point ExpSquared
GP fits and conditions in milliseconds on one chip.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.solvers import LowRankSolver

rng = np.random.default_rng(8)
N, M = 20_000, 256
X = jnp.asarray(np.sort(rng.uniform(0.0, 100.0, N)))
truth = lambda x: jnp.sin(0.4 * x) + 0.5 * jnp.cos(0.13 * x)
y = truth(X) + 0.2 * jnp.asarray(rng.normal(size=N))

kernel = 1.0 * kernels.ExpSquared(scale=3.0)
Z = X[:: N // M][:M]  # evenly strided inducing subset

gp = GaussianProcess(
    kernel, X, diag=0.2**2, solver=LowRankSolver, inducing_points=Z
)
loglik = jax.jit(gp.log_probability)(y)
print(f"low-rank log p(y) at N={N}, M={M}: {loglik:.1f}")
assert np.isfinite(float(loglik))

# Hyperparameter gradients flow through the whole construction.
def loss(theta):
    k = theta[0] * kernels.ExpSquared(scale=theta[1])
    g = GaussianProcess(
        k, X, diag=0.2**2, solver=LowRankSolver, inducing_points=Z
    )
    return -g.log_probability(y)

grads = jax.jit(jax.grad(loss))(jnp.asarray([1.0, 3.0]))
print("d(-loglik)/d(amp, scale) =", np.asarray(grads))
assert np.all(np.isfinite(np.asarray(grads)))

# Conditioning: posterior mean tracks the truth away from the noise.
grid = jnp.linspace(5.0, 95.0, 200)
_, cond = gp.condition(y, grid)
err = float(jnp.max(jnp.abs(cond.loc - truth(grid))))
print(f"max |posterior mean - truth| on the grid: {err:.3f}")
assert err < 0.1
assert float(jnp.min(cond.variance)) > 0

print("ok")
