"""The fused stacked log-likelihood path.

Pins three layers against the established QSM route: stacked SSM generation
(`Quasisep.to_stacked_ssm` vs repacked `to_symm_qsm`), the fused
factor-and-whiten (`ops.stacked_loglik_terms` vs cholesky + triangular
solve), and the GP-level dispatch (values, gradients, poison guard, and the
fallbacks that must decline the fused path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.noise import Banded, Diagonal
from tinygp_tpu.solvers.quasisep import ops
from tinygp_tpu.solvers.quasisep.solver import QuasisepSolver
from tinygp_tpu.test_utils import assert_allclose

KERNELS = {
    "m32": lambda: quasisep.Matern32(scale=1.8),
    "m52": lambda: quasisep.Matern52(scale=0.9),
    "sho": lambda: 1.3 * quasisep.SHO(omega=2.0, quality=4.0),
    "celerite": lambda: quasisep.Celerite(a=1.1, b=0.8, c=0.9, d=0.1),
    "product": lambda: quasisep.Matern32(scale=1.5)
    * quasisep.Cosine(scale=2.5),
    "sum": lambda: quasisep.Matern32(scale=1.0)
    + quasisep.SHO(omega=1.5, quality=2.0),
    "scaled_sum": lambda: 1.3
    * (
        quasisep.Celerite(a=1.1, b=0.8, c=0.9, d=0.1)
        + quasisep.Celerite(a=0.7, b=0.1, c=1.4, d=2.3)
    ),
}


@pytest.fixture
def data():
    rng = np.random.default_rng(77)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, 200)))
    y = jnp.asarray(rng.normal(size=200))
    return X, y


@pytest.mark.parametrize("name", sorted(KERNELS))
def test_stacked_ssm_matches_qsm(data, name):
    X, _ = data
    kernel = KERNELS[name]()
    d, ps, qs, as_ = kernel.to_stacked_ssm(X)
    M = kernel.to_symm_qsm(X)
    assert_allclose(d, M.diag.d)
    assert_allclose(ps.T, M.lower.p)
    assert_allclose(qs.T, M.lower.q)
    m = ps.shape[0]
    from tinygp_tpu.solvers.quasisep.block import ensure_dense

    a = ensure_dense(M.lower.a)
    assert_allclose(as_.reshape(m, m, -1), jnp.moveaxis(a, 0, -1))


def test_sum_kernel_uses_stacked(data):
    """Multi-term models run the fused path end to end (solver dispatch)."""
    X, y = data
    kernel = 1.3 * (
        quasisep.Matern32(scale=1.0)
        + quasisep.SHO(omega=1.5, quality=2.0)
    )
    gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
    assert gp.solver.ssm is not None
    alpha = gp.solver.solve_triangular(y - gp.loc)
    manual = -0.5 * jnp.sum(alpha**2) - gp.solver.normalization()
    assert_allclose(jax.jit(gp.log_probability)(y), manual)


def test_fused_terms_match_factor_then_whiten(data):
    X, y = data
    kernel = KERNELS["sho"]()
    d, ps, qs, as_ = kernel.to_stacked_ssm(X)
    d = d + 0.1

    quad, logdet = ops.stacked_loglik_terms(d, ps, qs, as_, y)

    c, w = ops.symm_cholesky(d, ps.T, qs.T, jnp.moveaxis(
        as_.reshape(ps.shape[0], ps.shape[0], -1), -1, 0
    ), parallel=True)
    m = ps.shape[0]
    a = jnp.moveaxis(as_.reshape(m, m, -1), -1, 0)
    alpha = ops.lower_triangular_solve(
        c, ps.T, w, a, y[:, None], parallel=True
    )[:, 0]
    assert_allclose(quad, jnp.sum(alpha**2))
    assert_allclose(logdet, jnp.sum(jnp.log(c)))


@pytest.mark.parametrize("name", ["m32"])
def test_gp_log_probability_uses_fused_path(data, name):
    # One kernel here: the m=4 "product" compile alone costs ~2 min on the
    # CI host, and its stacked generation + fused terms are already pinned
    # by test_stacked_ssm_matches_qsm / test_fused_terms_match_*.
    X, y = data
    kernel = KERNELS[name]()
    gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
    assert gp.solver.ssm is not None

    # Same value as the explicit whiten route.
    alpha = gp.solver.solve_triangular(y - gp.loc)
    manual = -0.5 * jnp.sum(alpha**2) - gp.solver.normalization()
    assert_allclose(jax.jit(gp.log_probability)(y), manual)


def test_gradients_match_whiten_route(data):
    X, y = data

    def fused(theta):
        gp = GaussianProcess(
            theta[0] * quasisep.Matern32(scale=theta[1]),
            X,
            diag=0.1,
            assume_sorted=True,
        )
        return gp.log_probability(y)

    def whiten(theta):
        gp = GaussianProcess(
            theta[0] * quasisep.Matern32(scale=theta[1]),
            X,
            diag=0.1,
            assume_sorted=True,
        )
        alpha = gp.solver.solve_triangular(y - gp.loc)
        return -0.5 * jnp.sum(alpha**2) - gp.solver.normalization()

    theta = jnp.asarray([1.4, 2.2])
    assert_allclose(fused(theta), whiten(theta))
    assert_allclose(jax.jit(jax.grad(fused))(theta), jax.grad(whiten)(theta))


def test_vmapped_chains_use_fused_path(data):
    X, y = data
    ys = jnp.stack([y, -y, 0.5 * y])
    scales = jnp.asarray([1.0, 2.0, 3.0])

    def one(scale, y1):
        gp = GaussianProcess(
            quasisep.Matern32(scale=scale), X, diag=0.1, assume_sorted=True
        )
        return gp.log_probability(y1)

    got = jax.jit(jax.vmap(one))(scales, ys)
    expect = jnp.stack([one(s, y1) for s, y1 in zip(scales, ys)])
    assert_allclose(got, expect)


def test_unsorted_inputs_poison_fused_path(data):
    X, y = data
    X_bad = jnp.concatenate([X[100:], X[:100]])

    @jax.jit
    def lp(X):
        gp = GaussianProcess(quasisep.Matern32(scale=1.0), X, diag=0.1)
        return gp.log_probability(y)

    assert float(lp(X_bad)) == -np.inf
    assert np.isfinite(float(lp(X)))


def test_banded_noise_falls_back(data):
    X, y = data
    rng = np.random.default_rng(3)
    off = 0.01 * jnp.asarray(rng.normal(size=(200, 1)))
    noise = Banded(diag=jnp.full(200, 0.3), off_diags=off)
    solver = QuasisepSolver(
        quasisep.Matern32(scale=1.2), X, noise, assume_sorted=True
    )
    assert solver.ssm is None
    lp = solver.log_likelihood(y)
    assert np.isfinite(float(lp))


def test_sequential_solver_skips_fused(data):
    X, y = data
    solver = QuasisepSolver(
        quasisep.Matern32(scale=1.2),
        X,
        Diagonal(diag=jnp.full(200, 0.1)),
        assume_sorted=True,
        parallel=False,
    )
    assert solver.ssm is None
