"""R-hat / ESS diagnostics against cases with known answers."""

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.samplers.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
    summary,
)


def _ar1(rng, t, c, rho):
    out = np.zeros((t, c))
    out[0] = rng.normal(size=c)
    innov = rng.normal(size=(t, c)) * np.sqrt(1 - rho**2)
    for i in range(1, t):
        out[i] = rho * out[i - 1] + innov[i]
    return out


def test_iid_chains():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(500, 8)))
    rhat = float(potential_scale_reduction(x))
    ess = float(effective_sample_size(x))
    assert abs(rhat - 1.0) < 0.02
    # iid draws: ESS within ~25% of the sample count.
    assert 0.75 * 4000 < ess <= 4000


def test_autocorrelated_chains():
    rng = np.random.default_rng(1)
    rho = 0.9
    x = jnp.asarray(_ar1(rng, 2000, 8, rho))
    ess = float(effective_sample_size(x))
    # AR(1) efficiency factor is (1-rho)/(1+rho) ~ 0.0526.
    expected = 16000 * (1 - rho) / (1 + rho)
    assert 0.5 * expected < ess < 2.0 * expected
    # Stationary, well-mixed in distribution: R-hat still near 1.
    assert float(potential_scale_reduction(x)) < 1.05


def test_unconverged_chains_flagged():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(400, 4))
    x[:, :2] += 5.0  # two chains stuck in a different mode
    rhat = float(potential_scale_reduction(jnp.asarray(x)))
    assert rhat > 1.5
    # ESS collapses when chains disagree.
    ess = float(effective_sample_size(jnp.asarray(x)))
    assert ess < 100


def test_within_chain_drift_flagged_by_split():
    # A trend inside every chain: plain R-hat would pass, split R-hat
    # must not.
    rng = np.random.default_rng(3)
    t = 400
    drift = np.linspace(-2, 2, t)[:, None]
    x = jnp.asarray(rng.normal(size=(t, 4)) + drift)
    assert float(potential_scale_reduction(x)) > 1.2


def test_summary_over_pytree():
    rng = np.random.default_rng(4)
    samples = {
        "a": jnp.asarray(rng.normal(size=(200, 4, 2))),
        "b": jnp.asarray(rng.normal(size=(200, 4))),
    }
    out = summary(samples)
    (a_key,) = [k for k in out if "a" in k]
    assert out[a_key]["rhat"].shape == (2,)
    assert np.all(np.abs(np.asarray(out[a_key]["rhat"]) - 1.0) < 0.05)
    (b_key,) = [k for k in out if "b" in k]
    assert out[b_key]["ess"].shape == (1,)
