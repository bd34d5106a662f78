"""Cross-implementation parity on the O(N) path, asserting in ANY env.

The reference compares against the C-backed celerite package behind an
``importorskip`` (``/root/reference/tests/test_solvers/test_quasisep/
test_solver.py:106-124``). Here the independent implementation is the
*closed-form autocovariance* of each process evaluated densely in numpy
float64 — the exact function celerite2 factorizes — so the whole SSM →
QSM → blocked-scan pipeline is checked against textbook math every run,
with golden constants pinned on top.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.test_utils import assert_allclose

GOLDEN_SHO_LL = -22.746304469003
GOLDEN_CELERITE_LL = -27.556257032997


def _dense_loglik(acf, X, y, diag):
    K = acf(np.abs(X[:, None] - X[None, :])) + diag * np.eye(X.size)
    L = np.linalg.cholesky(K)
    return (
        -0.5 * y @ np.linalg.solve(K, y)
        - np.sum(np.log(np.diag(L)))
        - 0.5 * X.size * np.log(2 * np.pi)
    )


def _sho_acf(tau, S0, w0, Q):
    # Underdamped (Q > 1/2) stochastically-driven harmonic oscillator.
    eta = np.sqrt(1 - 1 / (4 * Q**2))
    return (
        S0
        * w0
        * Q
        * np.exp(-w0 * tau / (2 * Q))
        * (np.cos(eta * w0 * tau) + np.sin(eta * w0 * tau) / (2 * eta * Q))
    )


def _celerite_acf(tau, a, b, c, d):
    return np.exp(-c * tau) * (a * np.cos(d * tau) + b * np.sin(d * tau))


@pytest.fixture
def data():
    rng = np.random.default_rng(5678)
    X = np.sort(rng.uniform(0, 10, 100))
    y = np.sin(X) + 0.1 * rng.normal(size=100)
    return X, y


@pytest.mark.parametrize("parallel", [False, True])
def test_sho_loglike_matches_oracle(data, parallel):
    X, y = data
    w0, q, s0 = 1.7, 3.0, 1.1

    ll = _dense_loglik(lambda tau: _sho_acf(tau, s0, w0, q), X, y, 0.1)
    np.testing.assert_allclose(ll, GOLDEN_SHO_LL, rtol=0, atol=1e-9)

    kernel = (s0 * w0 * q) * quasisep.SHO(omega=w0, quality=q)
    gp = GaussianProcess(
        kernel, jnp.asarray(X), diag=0.1, parallel=parallel,
        assume_sorted=True,
    )
    assert_allclose(gp.log_probability(jnp.asarray(y)), ll)


@pytest.mark.parametrize("parallel", [False, True])
def test_celerite_term_loglike_matches_oracle(data, parallel):
    X, y = data
    a, b, c, d = 0.8, 0.3, 1.1, 0.9

    ll = _dense_loglik(lambda tau: _celerite_acf(tau, a, b, c, d), X, y, 0.1)
    np.testing.assert_allclose(ll, GOLDEN_CELERITE_LL, rtol=0, atol=1e-9)

    kernel = quasisep.Celerite(a=a, b=b, c=c, d=d)
    gp = GaussianProcess(
        kernel, jnp.asarray(X), diag=0.1, parallel=parallel,
        assume_sorted=True,
    )
    assert_allclose(gp.log_probability(jnp.asarray(y)), ll)
