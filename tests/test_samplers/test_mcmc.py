import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.samplers import nuts, run_mcmc, window_adaptation
from tinygp_tpu.samplers.hmc import _warmup_schedule

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


def test_find_initial_step_size_scales_with_target():
    from tinygp_tpu.samplers import find_initial_step_size
    from tinygp_tpu.samplers.hmc import nuts

    def make_states(sd):
        lp = lambda z: -0.5 * jnp.sum(jnp.square(z / sd))
        init_fn, _ = nuts(lp)
        z0 = 0.1 * sd * jax.random.normal(jax.random.PRNGKey(0), (32, 4))
        return lp, jax.vmap(init_fn)(z0)

    lp, states = make_states(1.0)
    eps_wide = float(
        find_initial_step_size(lp, states, jax.random.PRNGKey(1))
    )
    lp, states = make_states(0.01)
    eps_narrow = float(
        find_initial_step_size(lp, states, jax.random.PRNGKey(1))
    )
    # The search lands within an order of magnitude of the posterior scale
    # and tracks it across two decades.
    assert 0.05 < eps_wide < 5.0
    assert 5e-4 < eps_narrow < 5e-2
    assert eps_narrow < eps_wide / 10


def test_warmup_schedule_structure():
    # Long warmup: standard buffers, doubling windows, remainder absorbed.
    init, switches, term = _warmup_schedule(1000)
    assert init == 75
    assert term == 50
    assert switches[0] == 75 + 25 - 1
    widths = np.diff([init - 1] + switches)
    assert all(b == 2 * a for a, b in zip(widths[:-2], widths[1:-1]))
    assert switches[-1] == 1000 - term - 1
    # Short warmup: proportional buffers, at least one window, no overrun.
    init, switches, term = _warmup_schedule(40)
    assert init >= 1 and term >= 1 and switches
    assert switches[-1] == 40 - term - 1


def test_staged_windows_handle_ill_conditioned_target():
    """An axis-aligned Gaussian with a 1e4 spread in curvature: without
    staged mass adaptation the dual-averaged step size chases the stiffest
    direction and acceptance collapses; with the expanding windows the
    final accept stat must land on the 0.8 target and the moments must be
    right on every scale."""
    sd = np.logspace(-2, 0, 6)  # cond(cov) = 1e4

    def lp(p):
        return -0.5 * jnp.sum(jnp.square(p["x"] / sd))

    num_chains, num_warmup = 16, 600
    init_fn, step_fn = nuts(
        lambda z: lp({"x": z}), max_tree_depth=9
    )
    adapt = window_adaptation(
        step_fn, num_warmup=num_warmup, target_accept=0.8
    )
    key_init, key_warm = jax.random.split(jax.random.PRNGKey(42))
    z0 = 0.1 * jax.random.normal(key_init, (num_chains, 6)) * sd[None, :]
    states = jax.vmap(init_fn)(z0)
    keys = jax.random.split(key_warm, num_chains)
    states, step_size, inv_mass, info = adapt(keys, states)

    # Adaptation succeeded: the terminal-buffer accept stat is on target,
    # and the learned metric tracks the true per-axis variances.
    assert abs(float(info.final_accept) - 0.8) < 0.05
    ratio = np.asarray(inv_mass) / sd**2
    assert np.all(ratio > 0.2) and np.all(ratio < 5.0)
    assert float(step_size) > 0.0
    # Divergence counts are reported per window and stay bounded.
    div = np.asarray(info.divergences_per_window)
    assert div.shape == (len(_warmup_schedule(num_warmup)[1]) + 2,)
    assert div.sum() < 0.05 * num_chains * num_warmup


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
