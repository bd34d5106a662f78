"""Cross-implementation parity on the dense path, asserting in ANY env.

The reference gates its george comparison behind ``importorskip``
(``/root/reference/tests/test_george_compat.py:12``), which silently skips
where george isn't installed. Here the independent implementation is a
pure-numpy float64 GP oracle written from the textbook formulas — the same
math george computes — so the parity check always runs. On top of that,
golden constants (computed once from the oracle, pinned below) guard
against the test and the library drifting together.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.test_utils import assert_allclose


# --- the oracle: an independent dense GP in numpy float64 -----------------


def _expsq(r2):
    return np.exp(-0.5 * r2)


def _matern32(r):
    a = np.sqrt(3.0) * r
    return (1 + a) * np.exp(-a)


def _expsine2(r, gamma, period):
    return np.exp(-gamma * np.sin(np.pi * r / period) ** 2)


def _oracle(kfun, X, y, diag, Xt):
    K = kfun(X[:, None], X[None, :]) + diag * np.eye(X.size)
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(K, y)
    ll = (
        -0.5 * y @ alpha
        - np.sum(np.log(np.diag(L)))
        - 0.5 * X.size * np.log(2 * np.pi)
    )
    Ks = kfun(X[:, None], Xt[None, :])
    mu = Ks.T @ alpha
    V = np.linalg.solve(L, Ks)
    var = kfun(Xt, Xt) - np.sum(V * V, axis=0)
    return ll, mu, var


# (ours, oracle pairwise kernel, golden log-likelihood)
CASES = {
    "expsq": (
        lambda: 1.5 * kernels.ExpSquared(scale=0.9),
        lambda a, b: 1.5 * _expsq(((a - b) / 0.9) ** 2),
        -11.864546579377,
    ),
    "matern32": (
        lambda: 0.8 * kernels.Matern32(scale=1.3),
        lambda a, b: 0.8 * _matern32(np.abs(a - b) / 1.3),
        -11.448450069198,
    ),
    "expsine2": (
        lambda: 2.0 * kernels.ExpSineSquared(scale=2.0, gamma=1.3),
        lambda a, b: 2.0 * _expsine2(np.abs(a - b), 1.3, 2.0),
        -130.807311683631,
    ),
}


@pytest.fixture
def data():
    rng = np.random.default_rng(1234)
    X = np.sort(rng.uniform(0, 10, 60))
    y = np.sin(X) + 0.1 * rng.normal(size=60)
    return X, y


@pytest.mark.parametrize("case", sorted(CASES))
def test_kernel_value_parity(case, data):
    ours, oracle_k, _ = CASES[case]
    X, _ = data
    K1 = np.asarray(ours()(jnp.asarray(X), jnp.asarray(X)))
    K2 = oracle_k(X[:, None], X[None, :])
    assert_allclose(K1, K2)


@pytest.mark.parametrize("case", sorted(CASES))
def test_loglike_and_predict_parity(case, data):
    ours, oracle_k, golden_ll = CASES[case]
    X, y = data

    ll, mu2, var2 = _oracle(oracle_k, X, y, 0.1, np.linspace(-1, 11, 23))
    # The oracle itself must reproduce its pinned golden value — otherwise
    # the fixture data or the oracle changed and the test is vacuous.
    np.testing.assert_allclose(ll, golden_ll, rtol=0, atol=1e-9)

    gp = GaussianProcess(ours(), jnp.asarray(X), diag=0.1)
    assert_allclose(gp.log_probability(jnp.asarray(y)), ll)

    X_test = np.linspace(-1, 11, 23)
    mu, var = gp.predict(jnp.asarray(y), jnp.asarray(X_test), return_var=True)
    assert_allclose(np.asarray(mu), mu2)
    assert_allclose(np.asarray(var), var2)
