"""Statistical validation of the samplers on a real GP posterior.

BASELINE config #4 asks for many-chain NUTS on the modeling-tutorial
posterior (``/root/reference/docs/tutorials/modeling.ipynb``: ExpSquared
kernel, log-amplitude / log-scale / log-noise with Gaussian priors) with
moments validated within Monte-Carlo error. No external PPL exists in this
environment, so the cross-check is *algorithmic*: NUTS (gradient-based)
and tempered SMC (gradient-free, annealed from the prior) must agree on
the posterior moments — two fully independent inference routes through
the same log-density.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.samplers import run_mcmc, run_smc

# -- the posterior ---------------------------------------------------------

N = 40
_rng = np.random.default_rng(42)
_X = np.sort(_rng.uniform(0, 10, N))
_true = {"amp": 1.2, "scale": 1.8, "noise": 0.25}
_K = _true["amp"] * np.exp(-0.5 * (np.subtract.outer(_X, _X) / _true["scale"]) ** 2)
_y = np.linalg.cholesky(_K + 1e-10 * np.eye(N)) @ _rng.normal(
    size=N
) + _true["noise"] * _rng.normal(size=N)
X, y = jnp.asarray(_X), jnp.asarray(_y)

PARAMS0 = {
    "log_amp": jnp.zeros(()),
    "log_scale": jnp.zeros(()),
    "log_noise": jnp.asarray(-1.0),
}


def log_prior(p):
    return -0.5 * sum(jnp.sum(jnp.square(v)) for v in p.values())


def log_like(p):
    kernel = jnp.exp(p["log_amp"]) * kernels.ExpSquared(
        scale=jnp.exp(p["log_scale"])
    )
    gp = GaussianProcess(kernel, X, diag=jnp.exp(2 * p["log_noise"]))
    return gp.log_probability(y)


def log_posterior(p):
    return log_prior(p) + log_like(p)


def _moments(tree):
    flat = {k: np.asarray(v).reshape(-1) for k, v in tree.items()}
    return (
        {k: v.mean() for k, v in flat.items()},
        {k: v.std() for k, v in flat.items()},
        {k: v for k, v in flat.items()},
    )


NUM_CHAINS = 64


def test_nuts_and_smc_agree_on_gp_posterior():
    # Many-chain NUTS... (sizes tuned so this stays meaningful but cheap on
    # the single-core CI host; the full-size 256-chain run lives on TPU in
    # benchmarks/sampler_rate.py)
    samples, info = run_mcmc(
        jax.random.PRNGKey(0),
        log_posterior,
        PARAMS0,
        num_chains=NUM_CHAINS,
        num_warmup=200,
        num_samples=128,
        max_tree_depth=5,
        jitter_init=0.5,
        steps_per_dispatch=None,
    )
    mean_n, sd_n, draws_n = _moments(samples)

    # ... vs gradient-free tempered SMC from the prior.
    key = jax.random.PRNGKey(1)
    n_part = 512
    parts = {
        k: jnp.asarray(_rng.standard_normal(n_part) * 1.0 + float(v))
        for k, v in PARAMS0.items()
    }
    smc = run_smc(key, log_prior, log_like, parts, num_mutations=6)
    mean_s, sd_s, _ = _moments(smc.particles)

    for k in PARAMS0:
        # Agreement within Monte-Carlo error: the NUTS standard error is
        # sd/sqrt(ESS); be conservative and take ESS = num_chains (one
        # independent draw per chain), plus the SMC cloud's own noise.
        mcse = sd_n[k] / np.sqrt(NUM_CHAINS) + sd_s[k] / np.sqrt(NUM_CHAINS)
        assert abs(mean_n[k] - mean_s[k]) < max(4 * mcse, 0.1), (
            k, mean_n[k], mean_s[k], sd_n[k], sd_s[k],
        )
        # Spreads from the two algorithms match to 30%.
        assert 0.7 < sd_n[k] / sd_s[k] < 1.4, (k, sd_n[k], sd_s[k])

    # The generating parameters sit inside the posterior mass.
    for k, truth in [
        ("log_amp", np.log(_true["amp"])),
        ("log_scale", np.log(_true["scale"])),
        ("log_noise", np.log(_true["noise"])),
    ]:
        assert abs(mean_n[k] - truth) < 4 * sd_n[k], (k, mean_n[k], truth)

    # Sampler health: few divergences, finite accept stats.
    div_frac = float(np.mean(np.asarray(info.diverging)))
    assert div_frac < 0.02
    assert np.all(np.isfinite(np.asarray(info.accept_prob)))
