"""Golden values against george (skipped when george is absent).

Mirrors the reference's cross-library strategy
(``/root/reference/tests/test_george_compat.py``): kernel values, marginal
log-likelihood, and predictive mean/variance must match george's
independent implementations.
"""

import numpy as np
import pytest

george = pytest.importorskip("george")

import jax.numpy as jnp

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.test_utils import assert_allclose


CASES = [
    (
        lambda: 1.5 * kernels.ExpSquared(scale=0.9),
        lambda: 1.5 * george.kernels.ExpSquaredKernel(0.9**2),
    ),
    (
        lambda: 0.8 * kernels.Matern32(scale=1.3),
        lambda: 0.8 * george.kernels.Matern32Kernel(1.3**2),
    ),
    (
        lambda: 2.0 * kernels.ExpSineSquared(scale=2.0, gamma=1.3),
        lambda: 2.0
        * george.kernels.ExpSine2Kernel(gamma=1.3, log_period=np.log(2.0)),
    ),
]


@pytest.fixture
def data():
    rng = np.random.default_rng(1234)
    X = np.sort(rng.uniform(0, 10, 60))
    y = np.sin(X) + 0.1 * rng.normal(size=60)
    return X, y


@pytest.mark.parametrize("case", range(len(CASES)))
def test_kernel_value_parity(case, data):
    ours, theirs = CASES[case]
    X, _ = data
    K1 = np.asarray(ours()(jnp.asarray(X), jnp.asarray(X)))
    K2 = theirs().get_value(X[:, None])
    assert_allclose(K1, K2)


@pytest.mark.parametrize("case", range(len(CASES)))
def test_loglike_and_predict_parity(case, data):
    ours, theirs = CASES[case]
    X, y = data

    gp = GaussianProcess(ours(), jnp.asarray(X), diag=0.1)
    g = george.GP(theirs())
    g.compute(X, np.sqrt(0.1) * np.ones_like(X))

    assert_allclose(float(gp.log_probability(jnp.asarray(y))), g.log_likelihood(y))

    X_test = np.linspace(-1, 11, 23)
    mu, var = gp.predict(jnp.asarray(y), jnp.asarray(X_test), return_var=True)
    mu2, var2 = g.predict(y, X_test, return_var=True)
    assert_allclose(np.asarray(mu), mu2)
    assert_allclose(np.asarray(var), var2)
