"""The inducing-point low-rank solver.

Two oracle layers: with ``Z = X`` the FITC construction is exact and must
match the dense DirectSolver; with ``M < N`` every quantity must match a
brute-force dense treatment of the approximate prior
``Khat = D + W W^T`` (Woodbury exactness within the approximation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.solvers import DirectSolver, LowRankSolver
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture
def data():
    rng = np.random.default_rng(31)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, 150)))
    y = jnp.asarray(np.sin(np.asarray(X)) + 0.1 * rng.normal(size=150))
    return X, y


KERNEL = 1.3 * kernels.ExpSquared(scale=1.5)


def test_exact_when_inducing_equals_inputs(data):
    X, y = data
    gp_dense = GaussianProcess(KERNEL, X, diag=0.1)
    gp_lr = GaussianProcess(
        KERNEL, X, diag=0.1, solver=LowRankSolver, inducing_points=X
    )
    assert_allclose(gp_lr.log_probability(y), gp_dense.log_probability(y))
    assert_allclose(gp_lr.variance, gp_dense.variance)

    grid = jnp.linspace(0, 10, 40)
    _, cond_d = gp_dense.condition(y, grid)
    _, cond_l = gp_lr.condition(y, grid)
    assert_allclose(cond_l.loc, cond_d.loc)
    if cond_l.variance.dtype == jnp.float64:
        assert_allclose(cond_l.variance, cond_d.variance)
    else:
        # Posterior variances are ~260x cancellations of O(1) terms; at
        # f32 the two (equivalent) formulas differ by ~1e-3 absolute.
        np.testing.assert_allclose(
            np.asarray(cond_l.variance), np.asarray(cond_d.variance),
            atol=5e-3,
        )


def _dense_oracle(solver):
    return np.asarray(solver.covariance())


def test_woodbury_matches_dense_oracle(data):
    X, y = data
    Z = X[::5]
    solver = LowRankSolver(
        KERNEL, X, noise=_diag(X, 0.1), inducing_points=Z
    )
    Khat = _dense_oracle(solver)

    # logdet via the normalization constant.
    n = X.shape[0]
    sign, logdet = np.linalg.slogdet(Khat)
    assert sign > 0
    # Keep the computed dtype so the tolerance policy matches the mode.
    assert_allclose(
        solver.normalization(),
        jnp.asarray(0.5 * logdet + 0.5 * n * np.log(2 * np.pi),
                    solver.D.dtype),
    )

    # Quadratic form through solve_triangular (the GP's whitening path).
    alpha = solver.solve_triangular(y)
    assert_allclose(
        jnp.sum(alpha**2), y @ jnp.asarray(np.linalg.solve(Khat, np.asarray(y)))
    )

    # Round trips: L (L^T x) == Khat x, and transpose-solve inverts.
    v = jnp.asarray(np.random.default_rng(0).normal(size=n))
    Lv = solver.dot_triangular(v)
    assert_allclose(
        solver.dot_triangular(
            solver.solve_triangular(Lv)
        ),
        Lv,
    )
    kinv = solver.solve_triangular(
        solver.solve_triangular(v), transpose=True
    )
    assert_allclose(kinv, jnp.asarray(np.linalg.solve(Khat, np.asarray(v))))


def _diag(X, value):
    from tinygp_tpu.noise import Diagonal

    return Diagonal(diag=jnp.broadcast_to(jnp.asarray(value), X.shape))


def test_fitc_diagonal_is_exact(data):
    X, _ = data
    solver = LowRankSolver(
        KERNEL, X, noise=_diag(X, 0.1), inducing_points=X[::7]
    )
    assert_allclose(solver.variance(), KERNEL(X) + 0.1)
    # ... and the dense Khat agrees on its diagonal.
    assert_allclose(
        jnp.diagonal(solver.covariance()), KERNEL(X) + 0.1
    )


def test_sampling_covariance(data):
    X, _ = data
    gp = GaussianProcess(
        KERNEL, X, diag=0.1, solver=LowRankSolver, inducing_points=X[::5]
    )
    draws = gp.sample(jax.random.PRNGKey(0), shape=(20000,))
    assert draws.shape == (20000, X.shape[0])
    emp = jnp.cov(draws, rowvar=False)
    Khat = _dense_oracle(gp.solver)
    assert float(jnp.max(jnp.abs(emp - Khat))) < 0.1


def test_gradients_flow(data):
    X, y = data

    def loss(theta):
        kernel = theta[0] * kernels.ExpSquared(scale=theta[1])
        gp = GaussianProcess(
            kernel, X, diag=0.1, solver=LowRankSolver,
            inducing_points=X[::5],
        )
        return -gp.log_probability(y)

    g = jax.jit(jax.grad(loss))(jnp.asarray([1.3, 1.5]))
    assert np.all(np.isfinite(np.asarray(g)))
    if jnp.zeros(()).dtype == jnp.float64:
        # Finite-difference cross-check (f64 only: at f32 the FD quotient
        # on this near-singular factorization is dominated by round-off).
        eps = 1e-3
        f = lambda a: float(loss(jnp.asarray([a, 1.5])))
        fd = (f(1.3 + eps) - f(1.3 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), fd, rtol=1e-2)


def test_validation():
    X = jnp.linspace(0, 1, 16)
    from tinygp_tpu.noise import Dense

    with pytest.raises(TypeError, match="inducing_points"):
        LowRankSolver(KERNEL, X, noise=_diag(X, 0.1))
    with pytest.raises(TypeError, match="Diagonal"):
        LowRankSolver(
            KERNEL, X,
            noise=Dense(value=0.1 * jnp.eye(16)),
            inducing_points=X[::2],
        )


def test_condition_includes_predictive_noise(data):
    X, y = data
    gp = GaussianProcess(
        KERNEL, X, diag=0.1, solver=LowRankSolver, inducing_points=X[::5]
    )
    grid = jnp.linspace(0, 10, 30)
    _, cond_noisy = gp.condition(y, grid, diag=0.25)
    _, cond_clean = gp.condition(y, grid)
    assert_allclose(cond_noisy.variance - cond_clean.variance,
                    jnp.full(30, 0.25) - _default_jitter(cond_clean))


def _default_jitter(cond_gp):
    # GaussianProcess falls back to sqrt(eps) jitter when no diag is given.
    dt = cond_gp.loc.dtype
    return jnp.full(cond_gp.loc.shape, jnp.sqrt(jnp.finfo(dt).eps))


def test_posterior_covariance_is_psd_off_inducing(data):
    # Sparse Z and test points interleaved with training data: the regime
    # where contracting EXACT cross-covariances against the approximate
    # prior inverse goes indefinite. The FITC predictive must stay PSD.
    X, y = data
    gp = GaussianProcess(
        KERNEL, X, diag=0.05, solver=LowRankSolver,
        inducing_points=X[::25],
    )
    grid = jnp.linspace(float(X[0]), float(X[-1]), 120)
    _, cond = gp.condition(y, grid)
    eigs = np.linalg.eigvalsh(np.asarray(cond.covariance))
    assert eigs.min() > -1e-5 * max(1.0, eigs.max())


def test_gradients_finite_with_duplicate_inducing(data):
    # Duplicated Z makes W rank-deficient, so the capacitance S has
    # repeated (zero) eigenvalues — the raw eigh VJP returns NaN here; the
    # Daleckii-Krein JVP must stay finite.
    X, y = data
    Z = jnp.concatenate([X[::10], X[::10]])

    def loss(theta):
        kernel = theta[0] * kernels.ExpSquared(scale=theta[1])
        gp = GaussianProcess(
            kernel, X, diag=0.1, solver=LowRankSolver, inducing_points=Z
        )
        return -gp.log_probability(y)

    g = jax.jit(jax.grad(loss))(jnp.asarray([1.3, 1.5]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_cap_apply_nan_input_poisons_not_crashes():
    """Non-finite capacitance must NEVER reach eigh.

    On the TPU a NaN eigh input does not return NaN — it crashes the
    whole TPU worker process (observed 2026-08-20, under-ridged Kmm at
    N=1e4/M=512/f32). The guard substitutes a finite operand and poisons
    the OUTPUT, so the GP-level NaN -> -inf guard still fires.
    """
    from tinygp_tpu.solvers.lowrank import _cap_apply

    S = jnp.full((4, 4), jnp.nan, jnp.float32)
    T = jnp.ones((4, 1), jnp.float32)
    out = jax.jit(lambda S, T: _cap_apply(S, T, -1))(S, T)
    assert np.all(np.isnan(np.asarray(out)))

    # And the JVP path.
    def f(S):
        return jnp.sum(_cap_apply(S, T, -1))

    val, tan = jax.jvp(f, (S,), (jnp.ones_like(S),))
    assert np.isnan(float(val)) and np.isnan(float(tan))


def test_f32_clustered_inducing_loglik_finite():
    """The trace-scaled ridge keeps chol(Kmm) finite for clustered Z.

    The max|diag|-scaled ridge was ~M times smaller than f32 round-off on
    a smooth kernel's gram (||Kmm||_2 ~ trace, not max diag), producing a
    NaN factor at M=512 on the TPU bench workload.
    """
    from tinygp_tpu import GaussianProcess, kernels
    from tinygp_tpu.solvers import LowRankSolver

    rng = np.random.default_rng(42)
    n, m = 2048, 256
    X = jnp.asarray(np.sort(rng.uniform(0, 10, n)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    Z = X[:: n // m][:m]
    kernel = jnp.float32(1.5) * kernels.Matern32(scale=jnp.float32(2.5))
    gp = GaussianProcess(
        kernel, X, diag=jnp.float32(0.1), solver=LowRankSolver,
        inducing_points=Z,
    )
    val = float(jax.jit(gp.log_probability)(y))
    assert np.isfinite(val)
