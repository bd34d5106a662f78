"""Derivative observations on the dense path via kernel autodiff.

Capability parity with ``/root/reference/docs/tutorials/derivative.ipynb``:
each data point is a pytree ``(t, flag)`` where the flag marks an
observation of the process *derivative*. Because kernels are plain jax
functions of their inputs, the mixed covariance blocks

    cov(f, f')   = dk/dt2
    cov(f', f')  = d^2 k / dt1 dt2

come straight out of ``jax.grad`` — no hand-derived kernels needed. This is
the dense-solver twin of the state-space version in
``examples/quasisep_custom.py`` (which routes the same idea through the SSM
observation model instead).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels


class WithDerivative(kernels.Kernel):
    """Lift a scalar-input kernel to joint (value, derivative) observations.

    Inputs are ``(t, flag)`` pairs; ``flag`` selects which of the four
    covariance blocks applies. All four are evaluated and blended with
    ``where`` so the selection stays branch-free under jit/vmap.
    """

    base: kernels.Kernel

    def evaluate(self, X1, X2):
        t1, d1 = X1
        t2, d2 = X2
        k = self.base.evaluate
        k_ff = k(t1, t2)
        k_fg = jax.grad(k, argnums=1)(t1, t2)
        k_gf = jax.grad(k, argnums=0)(t1, t2)
        k_gg = jax.grad(jax.grad(k, argnums=0), argnums=1)(t1, t2)
        return jnp.where(
            d1, jnp.where(d2, k_gg, k_gf), jnp.where(d2, k_fg, k_ff)
        )


rng = np.random.default_rng(5)

# Mixed dataset: 30 values of sin(t) and 25 observations of its derivative.
t_val = jnp.asarray(np.sort(rng.uniform(0.0, 8.0, 30)))
t_der = jnp.asarray(np.sort(rng.uniform(0.0, 8.0, 25)))
t = jnp.concatenate((t_val, t_der))
flag = jnp.concatenate(
    (jnp.zeros_like(t_val, bool), jnp.ones_like(t_der, bool))
)
y = jnp.concatenate(
    (
        jnp.sin(t_val) + 0.05 * jnp.asarray(rng.normal(size=t_val.shape)),
        jnp.cos(t_der) + 0.05 * jnp.asarray(rng.normal(size=t_der.shape)),
    )
)

kernel = WithDerivative(base=kernels.ExpSquared(scale=1.5))
gp = GaussianProcess(kernel, (t, flag), diag=0.05**2)

loglik = jax.jit(gp.log_probability)(y)
print(f"log p(y, y') = {loglik:.2f}")
assert np.isfinite(float(loglik))

# Predict the *function* (flag=False) on a grid, informed by both kinds of
# observations; then predict the derivative on the same grid.
t_grid = jnp.linspace(0.0, 8.0, 100)
_, cond_f = gp.condition(y, (t_grid, jnp.zeros_like(t_grid, bool)))
_, cond_g = gp.condition(y, (t_grid, jnp.ones_like(t_grid, bool)))

err_f = float(jnp.max(jnp.abs(cond_f.loc - jnp.sin(t_grid))))
err_g = float(jnp.max(jnp.abs(cond_g.loc - jnp.cos(t_grid))))
print(f"max |posterior mean - sin| = {err_f:.3f}")
print(f"max |posterior derivative mean - cos| = {err_g:.3f}")
assert err_f < 0.2 and err_g < 0.35

# Derivative observations actually constrain the function: refitting with
# the derivative half discarded must be less certain on the grid.
gp_val = GaussianProcess(
    kernels.ExpSquared(scale=1.5), t_val, diag=0.05**2
)
_, cond_val = gp_val.condition(y[: t_val.shape[0]], t_grid)
gain = float(jnp.mean(cond_val.variance - cond_f.variance))
print(f"mean variance reduction from derivative data = {gain:.4f}")
assert gain > 0

print("ok")
