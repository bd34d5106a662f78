import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.solvers.kalman import KalmanSolver
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture
def data():
    rng = np.random.default_rng(33)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, 50)))
    y = jnp.asarray(rng.normal(size=50))
    return X, y


@pytest.mark.parametrize(
    "kernel",
    [
        quasisep.Matern32(scale=1.5),
        quasisep.SHO(omega=1.2, quality=3.0),
        quasisep.Exp(scale=0.8, sigma=1.3),
        quasisep.Exp(scale=1.5) + quasisep.Matern32(scale=2.0),
    ],
    ids=["m32", "sho", "exp", "sum"],
)
def test_kalman_matches_quasisep(kernel, data):
    X, y = data
    gp_k = GaussianProcess(kernel, X, diag=0.2, solver=KalmanSolver)
    gp_q = GaussianProcess(kernel, X, diag=0.2)
    assert_allclose(gp_k.log_probability(y), gp_q.log_probability(y))


def test_kalman_matches_direct_formula(data):
    """Hand-rolled MVN log-likelihood through the innovations decomposition."""
    X, y = data
    kernel = quasisep.Matern32(scale=1.5)
    gp = GaussianProcess(kernel, X, diag=0.2, solver=KalmanSolver)

    K = np.asarray(kernel(X, X)) + 0.2 * np.eye(50)
    sign, logdet = np.linalg.slogdet(K)
    expect = -0.5 * (
        np.asarray(y) @ np.linalg.solve(K, np.asarray(y))
        + logdet
        + 50 * np.log(2 * np.pi)
    )
    assert_allclose(gp.log_probability(y), expect)
