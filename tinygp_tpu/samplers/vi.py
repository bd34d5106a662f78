"""Automatic differentiation variational inference (ADVI).

A new subsystem with no reference counterpart: fits a Gaussian
approximation — diagonal (mean-field) or full-covariance
(``full_rank=True``, Cholesky-parameterized) — to an unconstrained
posterior by stochastic maximization of the ELBO with the
reparameterization trick. Everything is batched: the Monte-Carlo ELBO
samples vectorize with ``vmap`` and the optimization loop is a single
``lax.scan``, so the whole fit compiles to one XLA program.
"""

from __future__ import annotations

__all__ = ["ADVIResult", "ADVIFullRankResult", "fit_advi", "sample_advi"]

from collections.abc import Callable
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array
from tinygp_tpu.samplers.hmc import _ravel_spec


class ADVIResult(NamedTuple):
    """The fitted mean-field approximation (flat coordinates)."""

    mean: Array
    log_std: Array
    elbo_trace: Array
    unravel: Any


class ADVIFullRankResult(NamedTuple):
    """The fitted full-covariance approximation (flat coordinates)."""

    mean: Array
    scale_tril: Array
    elbo_trace: Array
    unravel: Any


def fit_advi(
    key: jax.Array,
    log_prob_fn: Callable[[Any], Array],
    init_params: Any,
    *,
    num_steps: int = 1000,
    num_elbo_samples: int = 8,
    learning_rate: float = 1e-2,
    init_log_std: float = -2.0,
    full_rank: bool = False,
) -> ADVIResult | ADVIFullRankResult:
    """Fit a Gaussian posterior approximation.

    Args:
        key: PRNG key.
        log_prob_fn: Log density of a single pytree position
            (unconstrained space).
        init_params: Initialization pytree (the variational mean starts
            here).
        num_steps: Optimizer steps.
        num_elbo_samples: MC samples per ELBO estimate.
        learning_rate: Adam learning rate.
        full_rank: Fit a full covariance (Cholesky-parameterized) instead
            of the mean-field diagonal — captures posterior correlations
            at O(dim^2) variational parameters.

    Returns:
        An :class:`ADVIResult` (or :class:`ADVIFullRankResult`); draw
        posterior samples with :func:`sample_advi`.
    """
    import optax

    ravel, unravel, dim = _ravel_spec(init_params)
    flat_log_prob = lambda z: log_prob_fn(unravel(z))

    def build_scale(phi):
        if full_rank:
            mean, log_diag, off = phi
            L = jnp.tril(off, -1) + jnp.diag(jnp.exp(log_diag))
            return mean, log_diag, L
        mean, log_std = phi
        return mean, log_std, None

    def elbo(phi, key):
        mean, log_scale, L = build_scale(phi)
        eps = jax.random.normal(key, (num_elbo_samples, dim))
        if full_rank:
            zs = mean[None, :] + eps @ L.T
        else:
            zs = mean[None, :] + jnp.exp(log_scale)[None, :] * eps
        logp = jax.vmap(flat_log_prob)(zs)
        # Gaussian entropy: 0.5*log(2*pi*e) per dim + log|scale|.
        entropy = jnp.sum(log_scale) + 0.5 * dim * (1.0 + jnp.log(2 * jnp.pi))
        return jnp.mean(logp) + entropy

    optimizer = optax.adam(learning_rate)
    if full_rank:
        phi0 = (
            ravel(init_params),
            jnp.full(dim, init_log_std),
            jnp.zeros((dim, dim)),
        )
    else:
        phi0 = (ravel(init_params), jnp.full(dim, init_log_std))
    opt_state0 = optimizer.init(phi0)

    def step(carry, key):
        phi, opt_state = carry
        loss, grads = jax.value_and_grad(lambda p: -elbo(p, key))(phi)
        updates, opt_state = optimizer.update(grads, opt_state)
        phi = optax.apply_updates(phi, updates)
        return (phi, opt_state), -loss

    keys = jax.random.split(key, num_steps)
    (phi, _), trace = jax.lax.scan(step, (phi0, opt_state0), keys)
    if full_rank:
        _, _, L = build_scale(phi)
        return ADVIFullRankResult(
            mean=phi[0], scale_tril=L, elbo_trace=trace, unravel=unravel
        )
    return ADVIResult(
        mean=phi[0], log_std=phi[1], elbo_trace=trace, unravel=unravel
    )


def sample_advi(
    key: jax.Array,
    result: ADVIResult | ADVIFullRankResult,
    num_samples: int,
) -> Any:
    """Draw pytree samples from a fitted ADVI approximation."""
    eps = jax.random.normal(key, (num_samples, result.mean.shape[0]))
    if isinstance(result, ADVIFullRankResult):
        zs = result.mean[None, :] + eps @ result.scale_tril.T
    else:
        zs = result.mean[None, :] + jnp.exp(result.log_std)[None, :] * eps
    return jax.vmap(result.unravel)(zs)
