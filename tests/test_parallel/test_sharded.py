"""Mesh-sharded samplers on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.parallel import (
    local_chunk,
    make_mesh,
    run_mcmc_sharded,
    run_smc_sharded,
)

MU = np.array([1.0, -2.0])
SD = np.array([0.5, 1.5])


def log_prob(p):
    return -0.5 * jnp.sum(jnp.square((p["x"] - MU) / SD))


def log_prior(p):
    return -0.5 * jnp.sum(jnp.square(p["x"]) / 16.0)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh()


def test_local_chunk(mesh):
    assert local_chunk(32, mesh) == 4
    with pytest.raises(ValueError):
        local_chunk(33, mesh)


def test_sharded_mcmc_moments(mesh):
    samples, info = run_mcmc_sharded(
        jax.random.PRNGKey(0),
        log_prob,
        {"x": jnp.zeros(2)},
        mesh=mesh,
        num_chains=32,
        num_warmup=300,
        num_samples=300,
    )
    x = np.asarray(samples["x"]).reshape(-1, 2)
    np.testing.assert_allclose(x.mean(0), MU, atol=0.1)
    np.testing.assert_allclose(x.std(0), SD, atol=0.15)
    # Output really is sharded over chains
    assert samples["x"].shape == (300, 32, 2)


def test_sharded_smc_matches_analytic(mesh):
    parts = {"x": 4.0 * jax.random.normal(jax.random.PRNGKey(1), (2048, 2))}
    out = run_smc_sharded(
        jax.random.PRNGKey(2), log_prior, log_prob, parts, mesh=mesh
    )
    x = np.asarray(out["particles"]["x"])
    post_var = 1.0 / (1.0 / 16.0 + 1.0 / SD**2)
    post_mean = post_var * MU / SD**2
    np.testing.assert_allclose(x.mean(0), post_mean, atol=0.15)
    np.testing.assert_allclose(x.std(0), np.sqrt(post_var), atol=0.15)

    var_sum = 16.0 + SD**2
    logZ = np.sum(-0.5 * (MU**2 / var_sum + np.log(var_sum / SD**2)))
    np.testing.assert_allclose(float(out["log_evidence"]), logZ, atol=0.2)


def test_gp_posterior_sharded(mesh):
    """End-to-end: GP hyperparameter posterior with sharded chains."""
    from tinygp_tpu import GaussianProcess
    from tinygp_tpu.kernels import quasisep

    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 10, 80))
    truth = {"log_scale": np.log(1.5), "log_amp": np.log(1.2)}
    kernel = np.exp(2 * truth["log_amp"]) * quasisep.Matern32(
        scale=np.exp(truth["log_scale"])
    )
    y = GaussianProcess(kernel, t, diag=0.01).sample(jax.random.PRNGKey(5))
    t, y = jnp.asarray(t), jnp.asarray(y)

    def log_post(p):
        gp = GaussianProcess(
            jnp.exp(2 * p["log_amp"])
            * quasisep.Matern32(scale=jnp.exp(p["log_scale"])),
            t,
            diag=0.01,
        )
        lp = gp.log_probability(y)
        prior = -0.5 * (p["log_amp"] ** 2 + p["log_scale"] ** 2)
        return lp + prior

    samples, _ = run_mcmc_sharded(
        jax.random.PRNGKey(0),
        log_post,
        {"log_scale": jnp.zeros(()), "log_amp": jnp.zeros(())},
        mesh=mesh,
        num_chains=8,
        num_warmup=200,
        num_samples=200,
        jitter_init=0.3,
    )
    ls = np.asarray(samples["log_scale"]).ravel()
    assert np.all(np.isfinite(ls))
    # Posterior concentrates near the truth (loose MC bound).
    assert abs(ls.mean() - truth["log_scale"]) < 0.5
