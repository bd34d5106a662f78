import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.samplers import run_mcmc

MU = np.array([1.0, -2.0, 0.5])
SD = np.array([0.5, 1.5, 1.0])


def log_prob(p):
    return -0.5 * jnp.sum(jnp.square((p["x"] - MU) / SD))


@pytest.mark.parametrize("sampler", ["nuts", "hmc"])
def test_gaussian_moments(sampler):
    samples, info = run_mcmc(
        jax.random.PRNGKey(0),
        log_prob,
        {"x": jnp.zeros(3)},
        num_chains=16,
        num_warmup=400,
        num_samples=400,
        sampler=sampler,
        num_leapfrog=16,
    )
    x = np.asarray(samples["x"]).reshape(-1, 3)
    np.testing.assert_allclose(x.mean(0), MU, atol=0.1)
    np.testing.assert_allclose(x.std(0), SD, atol=0.15)
    assert np.all(np.isfinite(np.asarray(info.accept_prob)))


def test_nuts_accept_near_target():
    _, info = run_mcmc(
        jax.random.PRNGKey(1),
        log_prob,
        {"x": jnp.zeros(3)},
        num_chains=8,
        num_warmup=500,
        num_samples=200,
        target_accept=0.8,
    )
    acc = float(np.mean(np.asarray(info.accept_prob)))
    assert 0.6 < acc < 0.99


def test_correlated_target():
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def lp(p):
        return -0.5 * p["x"] @ prec @ p["x"]

    samples, _ = run_mcmc(
        jax.random.PRNGKey(2),
        lp,
        {"x": jnp.zeros(2)},
        num_chains=16,
        num_warmup=500,
        num_samples=500,
    )
    x = np.asarray(samples["x"]).reshape(-1, 2)
    emp = np.cov(x, rowvar=False)
    np.testing.assert_allclose(emp, cov, atol=0.15)


def test_pytree_positions():
    def lp(p):
        return -0.5 * (
            jnp.sum(jnp.square(p["a"] - 1.0))
            + jnp.sum(jnp.square(p["b"]["c"] + 2.0))
        )

    init = {"a": jnp.zeros(2), "b": {"c": jnp.zeros(())}}
    samples, _ = run_mcmc(
        jax.random.PRNGKey(3), lp, init,
        num_chains=8, num_warmup=300, num_samples=300,
    )
    assert samples["a"].shape == (300, 8, 2)
    assert samples["b"]["c"].shape == (300, 8)
    np.testing.assert_allclose(
        np.asarray(samples["a"]).mean((0, 1)), [1.0, 1.0], atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(samples["b"]["c"]).mean(), -2.0, atol=0.1
    )
