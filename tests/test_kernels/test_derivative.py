"""Derivative observations through kernel autodiff (dense path).

Capability parity with ``/root/reference/docs/tutorials/derivative.ipynb``:
pytree inputs ``(t, flag)`` with grad-derived cross-covariance blocks. For
``ExpSquared(scale=ell)`` every block has a closed form, so this pins the
autodiff construction against hand math:

    k      = exp(-(t1-t2)^2 / (2 ell^2))
    dk/dt2 = ((t1-t2)/ell^2) k
    d2k/dt1 dt2 = (1/ell^2 - (t1-t2)^2/ell^4) k
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.test_utils import assert_allclose


class WithDerivative(kernels.Kernel):
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


@pytest.fixture
def data():
    rng = np.random.default_rng(99)
    t = jnp.asarray(np.sort(rng.uniform(0.0, 5.0, 40)))
    flag = jnp.asarray(rng.random(40) < 0.5)
    return t, flag


def test_blocks_match_closed_form(data):
    t, flag = data
    ell = 1.7
    kernel = WithDerivative(base=kernels.ExpSquared(scale=ell))
    K = kernel((t, flag), (t, flag))

    dt = t[:, None] - t[None, :]
    base = jnp.exp(-0.5 * (dt / ell) ** 2)
    k_fg = dt / ell**2 * base
    k_gg = (1.0 / ell**2 - dt**2 / ell**4) * base

    f1 = flag[:, None]
    f2 = flag[None, :]
    expect = jnp.where(
        f1,
        jnp.where(f2, k_gg, -k_fg),
        jnp.where(f2, k_fg, base),
    )
    assert_allclose(K, expect)


def test_gp_posterior_uses_derivative_information(data):
    t, flag = data
    # Values of sin where flag=0, derivatives (cos) where flag=1.
    y = jnp.where(flag, jnp.cos(t), jnp.sin(t))
    kernel = WithDerivative(base=kernels.ExpSquared(scale=1.5))
    gp = GaussianProcess(kernel, (t, flag), diag=1e-5)

    ll = jax.jit(gp.log_probability)(y)
    assert np.isfinite(float(ll))

    grid = jnp.linspace(0.5, 4.5, 32)
    _, cond_f = gp.condition(y, (grid, jnp.zeros_like(grid, bool)))
    _, cond_g = gp.condition(y, (grid, jnp.ones_like(grid, bool)))
    np.testing.assert_allclose(
        np.asarray(cond_f.loc), np.sin(grid), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(cond_g.loc), np.cos(grid), atol=5e-2
    )
