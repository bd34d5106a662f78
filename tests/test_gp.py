import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.solvers import DirectSolver
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture
def data():
    rng = np.random.default_rng(100)
    X = np.sort(rng.uniform(0, 10, 60))
    y = np.sin(X) + 0.1 * rng.normal(size=60)
    return jnp.asarray(X), jnp.asarray(y)


def _manual_log_prob(K, y, mean=0.0):
    r = np.asarray(y) - mean
    N = r.shape[0]
    sign, logdet = np.linalg.slogdet(K)
    return -0.5 * (r @ np.linalg.solve(K, r) + logdet + N * np.log(2 * np.pi))


def test_log_probability_matches_manual(data):
    X, y = data
    kernel = 2.0 * kernels.ExpSquared(scale=1.3)
    gp = GaussianProcess(kernel, X, diag=0.05)
    tau2 = np.square(np.asarray(X)[:, None] - np.asarray(X)[None, :])
    K = 2.0 * np.exp(-0.5 * tau2 / 1.3**2) + 0.05 * np.eye(60)
    assert_allclose(gp.log_probability(y), _manual_log_prob(K, y))


def test_mean_handling(data):
    X, y = data
    kernel = kernels.Matern32(scale=1.5)

    for mean, mu in [
        (2.0, 2.0),
        (lambda x: 0.1 * x, 0.1 * np.asarray(X)),
    ]:
        gp = GaussianProcess(kernel, X, diag=0.1, mean=mean)
        assert_allclose(gp.loc, np.broadcast_to(mu, (60,)))
        tau = np.abs(np.asarray(X)[:, None] - np.asarray(X)[None, :]) / 1.5
        K = (1 + np.sqrt(3) * tau) * np.exp(-np.sqrt(3) * tau) + 0.1 * np.eye(60)
        assert_allclose(
            gp.log_probability(y), _manual_log_prob(K, y, mean=mu)
        )


def test_sample_statistics(data):
    X, _ = data
    X = X[:20]
    kernel = kernels.ExpSquared(scale=2.0)
    gp = GaussianProcess(kernel, X, diag=0.1, mean=1.5)
    samples = gp.sample(jax.random.PRNGKey(1), (100_000,))
    assert samples.shape == (100_000, 20)
    np.testing.assert_allclose(
        np.mean(np.asarray(samples), axis=0), np.full(20, 1.5), atol=0.02
    )
    emp_cov = np.cov(np.asarray(samples), rowvar=False)
    np.testing.assert_allclose(emp_cov, np.asarray(gp.covariance), atol=0.02)


def test_condition_and_predict(data):
    X, y = data
    kernel = kernels.Matern52(scale=1.2)
    gp = GaussianProcess(kernel, X, diag=0.05)
    X_test = jnp.linspace(-1, 11, 25)

    log_prob, cond = gp.condition(y, X_test)
    assert_allclose(log_prob, gp.log_probability(y))

    # Manual posterior
    Xn, Xt = np.asarray(X), np.asarray(X_test)
    tau = lambda A, B: np.sqrt(5) * np.abs(A[:, None] - B[None, :]) / 1.2
    k = lambda A, B: (1 + tau(A, B) + tau(A, B) ** 2 / 3) * np.exp(-tau(A, B))
    K = k(Xn, Xn) + 0.05 * np.eye(60)
    Ks = k(Xn, Xt)
    Kss = k(Xt, Xt)
    mu = Ks.T @ np.linalg.solve(K, np.asarray(y))
    cov = Kss - Ks.T @ np.linalg.solve(K, Ks)

    # Posterior second moments are cancellation-prone; their absolute
    # floor scales with the mode's precision.
    var_atol = 1e-5 if cond.variance.dtype == jnp.float64 else 1e-3
    assert_allclose(cond.loc, mu, atol=1e-5)
    assert_allclose(np.asarray(cond.variance), np.diag(cov), atol=var_atol)

    mu2, var2 = gp.predict(y, X_test, return_var=True)
    assert_allclose(mu2, mu, atol=1e-5)
    mu3, cov3 = gp.predict(y, X_test, return_cov=True)
    assert_allclose(np.asarray(cov3), cov, atol=var_atol)


def test_condition_at_train_points(data):
    X, y = data
    gp = GaussianProcess(kernels.Matern32(scale=1.0), X, diag=0.1)
    _, cond = gp.condition(y)
    # Same-points fast path must agree with the explicit kernel path.
    _, cond2 = gp.condition(y, X)
    assert_allclose(cond.loc, cond2.loc, atol=1e-5)


def test_condition_shape_validation(data):
    X, y = data
    gp = GaussianProcess(kernels.Matern32(scale=1.0), X, diag=0.1)
    with pytest.raises(ValueError):
        gp.condition(y, jnp.ones((10, 3)))


def test_invalid_mean_shape(data):
    X, _ = data
    with pytest.raises(ValueError):
        GaussianProcess(
            kernels.Matern32(scale=1.0),
            X,
            mean=lambda x: jnp.stack([x, x]),
        )


def test_default_jitter_dtype(data):
    X, y = data
    gp = GaussianProcess(kernels.ExpSquared(), X)
    assert np.isfinite(float(gp.log_probability(y)))


def test_multivariate_inputs():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(30, 3))
    y = rng.normal(size=30)
    kernel = kernels.ExpSquared(scale=1.5)
    gp = GaussianProcess(kernel, X, diag=0.1)
    r2 = np.sum(
        np.square(X[:, None, :] - X[None, :, :]), axis=-1
    ) / 1.5**2
    K = np.exp(-0.5 * r2) + 0.1 * np.eye(30)
    assert_allclose(gp.log_probability(y), _manual_log_prob(K, y))


def test_gp_is_pytree(data):
    X, y = data
    gp = GaussianProcess(kernels.Matern32(scale=1.0), X, diag=0.1)

    @jax.jit
    def lp(gp, y):
        return gp.log_probability(y)

    assert_allclose(lp(gp, y), gp.log_probability(y))


def test_gradients_flow(data):
    X, y = data

    def loss(params):
        kernel = params["amp"] * kernels.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1)
        return -gp.log_probability(y)

    params = {"amp": jnp.float64(1.0), "scale": jnp.float64(1.5)}
    g = jax.grad(loss)(params)
    assert np.isfinite(float(g["amp"]))
    assert np.isfinite(float(g["scale"]))
    if g["amp"].dtype == jnp.float64:
        # Finite-difference check (x64 only: the eps=1e-6 forward quotient
        # is round-off noise at f32 resolution).
        eps = 1e-6
        for k in params:
            shifted = dict(params)
            shifted[k] = params[k] + eps
            fd = (loss(shifted) - loss(params)) / eps
            assert_allclose(g[k], fd, atol=1e-3, rtol=1e-3)


def test_explicit_solver_choice(data):
    X, y = data
    gp = GaussianProcess(
        kernels.Matern32(scale=1.0), X, diag=0.1, solver=DirectSolver
    )
    assert isinstance(gp.solver, DirectSolver)
