"""Non-reversible (causal) state-space kernels.

Parity target: ``/root/reference/tests/test_kernels/
test_quasisep_nonreversible.py:12-106``. A process whose cross-channel
covariance depends on time *orientation* (driver leads, response lags)
exercises the time-order branch in ``Quasisep.evaluate``
(``tinygp_tpu/kernels/quasisep.py``) and the lower/upper generator split in
``to_symm_qsm`` that every reversible kernel hides.

The test process here is a two-state cascade: an Ornstein-Uhlenbeck driver
feeding a faster-decaying response channel. ``Pinf`` solves the Lyapunov
equation ``F P + P F^T + Q = 0`` for ``Q = diag(1, 3/10)`` exactly (worked
by hand below), so the SSM is internally consistent.
"""

import jax
import jax.numpy as jnp
import jax.scipy as jsp
import numpy as np
import pytest

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.solvers import DirectSolver, QuasisepSolver
from tinygp_tpu.solvers.kalman import KalmanSolver
from tinygp_tpu.test_utils import assert_allclose

# F = [[-1/2, 0], [1, -3/2]]: channel 0 drives channel 1.
# Lyapunov with Q = diag(1, 3/10):
#   p11 = 1, p12 = p11 / 2 = 1/2, p22 = (2 p12 + 3/10) / 3 = 13/30.
_F = np.array([[-0.5, 0.0], [1.0, -1.5]])
_PINF = np.array([[1.0, 0.5], [0.5, 13.0 / 30.0]])


class Cascade(quasisep.Quasisep):
    """OU driver -> response cascade observed through a channel index."""

    def design_matrix(self):
        return jnp.asarray(_F)

    def stationary_covariance(self):
        return jnp.asarray(_PINF)

    def observation_model(self, X):
        _t, channel = X
        return jnp.eye(2)[channel]

    def coord_to_sortable(self, X):
        return X[0]

    def transition_matrix(self, X1, X2):
        dt = X2[0] - X1[0]
        return jsp.linalg.expm(self.design_matrix().T * dt)


def brute_covariance(kernel, X1, X2):
    """K[i, j] from the SSM definition, with explicit orientation."""

    def k(x1, x2):
        h1 = kernel.observation_model(x1)
        h2 = kernel.observation_model(x2)
        P = kernel.stationary_covariance()
        fwd = h2 @ kernel.transition_matrix(x1, x2).T @ P @ h1
        bwd = h1 @ kernel.transition_matrix(x2, x1).T @ P @ h2
        return jnp.where(x1[0] < x2[0], fwd, bwd)

    return jax.vmap(lambda a: jax.vmap(lambda b: k(a, b))(X2))(X1)


@pytest.fixture
def problem():
    t = jnp.array([0.0, 0.4, 0.9, 1.3, 2.0, 2.6, 3.5])
    c = jnp.array([0, 1, 1, 0, 1, 0, 1])
    y = jnp.array([0.3, -0.2, 0.1, 0.25, -0.15, 0.0, 0.1])
    t_star = jnp.array([0.2, 1.1, 2.3, 3.0])
    c_star = jnp.array([1, 0, 0, 1])
    return (t, c), y, (t_star, c_star)


def test_covariance_is_orientation_dependent():
    # Any covariance is symmetric under swapping its *arguments*; a
    # non-reversible process breaks symmetry under swapping the *times*
    # with the channel assignment held: the response lagging the driver is
    # correlated differently than the response leading it.
    kernel = Cascade()
    d0 = (jnp.asarray(0.0), jnp.asarray(0))  # driver at t=0
    d1 = (jnp.asarray(1.0), jnp.asarray(0))  # driver at t=1
    r0 = (jnp.asarray(0.0), jnp.asarray(1))  # response at t=0
    r1 = (jnp.asarray(1.0), jnp.asarray(1))  # response at t=1

    lagging = float(kernel.evaluate(d0, r1))
    leading = float(kernel.evaluate(d1, r0))
    assert abs(lagging - leading) > 1e-3

    # Argument order still commutes (it is a covariance).
    assert_allclose(kernel.evaluate(r1, d0), lagging)
    assert_allclose(kernel.evaluate(r0, d1), leading)

    # Both orientations agree with the SSM brute force.
    assert_allclose(
        brute_covariance(kernel, (d0[0][None], d0[1][None]), (r1[0][None], r1[1][None]))[0, 0],
        lagging,
    )
    assert_allclose(
        brute_covariance(kernel, (d1[0][None], d1[1][None]), (r0[0][None], r0[1][None]))[0, 0],
        leading,
    )


def test_evaluate_and_qsm_match_brute_force(problem):
    X, _, X_star = problem
    kernel = Cascade()
    expected = brute_covariance(kernel, X, X)
    assert_allclose(kernel(X, X), expected)
    assert_allclose(kernel.to_symm_qsm(X).to_dense(), expected)

    # Rectangular cross-covariance through the GeneralQSM scans.
    cross = brute_covariance(kernel, X_star, X)
    y = jnp.linspace(-1.0, 1.0, X[0].size)
    assert_allclose(kernel.matmul(X_star, X, y), cross @ y)


def test_three_solvers_agree(problem):
    X, y, _ = problem
    kernel = Cascade()
    diag = jnp.full(X[0].shape, 0.07)

    gps = {
        name: GaussianProcess(kernel, X, diag=diag, solver=s)
        for name, s in [
            ("direct", DirectSolver),
            ("quasisep", QuasisepSolver),
            ("kalman", KalmanSolver),
        ]
    }
    ll = {name: gp.log_probability(y) for name, gp in gps.items()}
    assert_allclose(ll["quasisep"], ll["direct"])
    assert_allclose(ll["kalman"], ll["direct"])
    assert_allclose(gps["quasisep"].covariance, gps["direct"].covariance)


def test_conditioning_agrees_across_solvers(problem):
    X, y, X_star = problem
    kernel = Cascade()
    diag = jnp.full(X[0].shape, 0.07)

    gp_d = GaussianProcess(kernel, X, diag=diag, solver=DirectSolver)
    gp_q = GaussianProcess(kernel, X, diag=diag, solver=QuasisepSolver)

    # At the training points...
    cond_d, cond_q = gp_d.condition(y), gp_q.condition(y)
    assert_allclose(cond_q.gp.loc, cond_d.gp.loc)
    assert_allclose(cond_q.gp.covariance, cond_d.gp.covariance)

    # ... and at fresh (interleaved-channel) test points.
    cond_d = gp_d.condition(y, X_test=X_star)
    cond_q = gp_q.condition(y, X_test=X_star)
    assert_allclose(cond_q.gp.loc, cond_d.gp.loc)
    assert_allclose(cond_q.gp.covariance, cond_d.gp.covariance)
