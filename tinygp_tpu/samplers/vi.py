"""Automatic differentiation variational inference (mean-field ADVI).

A new subsystem with no reference counterpart: fits a diagonal-Gaussian
approximation to a (unconstrained) posterior by stochastic maximization of
the ELBO with the reparameterization trick. Everything is batched — the
Monte-Carlo ELBO samples vectorize with ``vmap`` and the optimization loop
is a single ``lax.scan``, so the whole fit compiles to one XLA program.
"""

from __future__ import annotations

__all__ = ["ADVIResult", "fit_advi", "sample_advi"]

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


def fit_advi(
    key: jax.Array,
    log_prob_fn: Callable[[Any], Array],
    init_params: Any,
    *,
    num_steps: int = 1000,
    num_elbo_samples: int = 8,
    learning_rate: float = 1e-2,
    init_log_std: float = -2.0,
) -> ADVIResult:
    """Fit a diagonal-Gaussian posterior approximation.

    Args:
        key: PRNG key.
        log_prob_fn: Log density of a single pytree position
            (unconstrained space).
        init_params: Initialization pytree (the variational mean starts
            here).
        num_steps: Optimizer steps.
        num_elbo_samples: MC samples per ELBO estimate.
        learning_rate: Adam learning rate.

    Returns:
        An :class:`ADVIResult`; draw posterior samples with
        :func:`sample_advi`.
    """
    import optax

    ravel, unravel, dim = _ravel_spec(init_params)
    flat_log_prob = lambda z: log_prob_fn(unravel(z))

    def elbo(phi, key):
        mean, log_std = phi
        eps = jax.random.normal(key, (num_elbo_samples, dim))
        zs = mean[None, :] + jnp.exp(log_std)[None, :] * eps
        logp = jax.vmap(flat_log_prob)(zs)
        # Gaussian entropy: 0.5*log(2*pi*e) + log_std per dimension.
        entropy = jnp.sum(log_std) + 0.5 * dim * (1.0 + jnp.log(2 * jnp.pi))
        return jnp.mean(logp) + entropy

    optimizer = optax.adam(learning_rate)
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
    return ADVIResult(
        mean=phi[0], log_std=phi[1], elbo_trace=trace, unravel=unravel
    )


def sample_advi(
    key: jax.Array, result: ADVIResult, num_samples: int
) -> Any:
    """Draw pytree samples from a fitted ADVI approximation."""
    eps = jax.random.normal(key, (num_samples, result.mean.shape[0]))
    zs = result.mean[None, :] + jnp.exp(result.log_std)[None, :] * eps
    return jax.vmap(result.unravel)(zs)
