"""Golden values against celerite2 (skipped when celerite2 is absent).

Mirrors ``/root/reference/tests/test_solvers/test_quasisep/test_solver.py:
106-124``: the Celerite and SHO kernels' marginal log-likelihoods must
match the independent C-backed celerite2 implementation.
"""

import numpy as np
import pytest

celerite2 = pytest.importorskip("celerite2")

import jax.numpy as jnp

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture
def data():
    rng = np.random.default_rng(5678)
    X = np.sort(rng.uniform(0, 10, 100))
    y = np.sin(X) + 0.1 * rng.normal(size=100)
    return X, y


@pytest.mark.parametrize("parallel", [False, True])
def test_sho_loglike_matches_celerite2(data, parallel):
    X, y = data
    w0, q, s0 = 1.7, 3.0, 1.1

    term = celerite2.terms.SHOTerm(w0=w0, Q=q, S0=s0)
    gp2 = celerite2.GaussianProcess(term)
    gp2.compute(X, diag=0.1 * np.ones_like(X))

    amp = s0 * w0 * q
    kernel = amp * quasisep.SHO(omega=w0, quality=q)
    gp = GaussianProcess(
        kernel, jnp.asarray(X), diag=0.1, parallel=parallel,
        assume_sorted=True,
    )
    assert_allclose(
        float(gp.log_probability(jnp.asarray(y))),
        gp2.log_likelihood(y),
    )
