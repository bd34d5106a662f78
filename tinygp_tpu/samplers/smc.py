"""Adaptive tempered Sequential Monte Carlo.

A new subsystem with no reference counterpart. Anneals from the prior to
the posterior through a sequence of tempered targets
``pi_beta ∝ prior * likelihood^beta``, with the temperature ladder chosen
adaptively from the effective sample size, systematic resampling, and
random-walk Metropolis (or HMC-style) mutation moves.

Multi-host design: particles carry a leading axis that shards over the
device mesh; the only cross-device interactions are *global reductions over
the particle axis* (log-weight normalization, the ESS, the resampling CDF) —
exactly the ``psum``/``all_gather`` collectives, emitted automatically when
the step is wrapped in ``shard_map`` (see
:mod:`tinygp_tpu.parallel.sharded`).
"""

from __future__ import annotations

__all__ = ["SMCResult", "run_smc"]

from collections.abc import Callable
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array
from tinygp_tpu.samplers.hmc import _ravel_spec


class SMCResult(NamedTuple):
    particles: Any
    """Posterior particles; equally weighted (the final stage resamples)."""
    log_weights: Array
    """Normalized log-weights of ``particles`` — uniform ``-log(n)``."""
    log_evidence: Array
    """Log marginal likelihood estimate from the tempering identity."""
    betas: Array
    """The adaptive temperature ladder, shape ``(max_stages,)``; entries
    beyond ``num_stages`` are NaN. ``betas[num_stages-1] == 1.0``."""
    acceptance: Array
    """Mutation-move acceptance rate per stage (NaN beyond the ladder)."""
    num_stages: Array


def _systematic_resample(key: jax.Array, log_weights: Array) -> Array:
    """Systematic resampling: one uniform, N strata. Returns indices."""
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cdf = jnp.cumsum(w)
    u = (jax.random.uniform(key) + jnp.arange(n)) / n
    return jnp.searchsorted(cdf, u, side="right").clip(0, n - 1)


def _ess(log_weights: Array) -> Array:
    logw = log_weights - jax.scipy.special.logsumexp(log_weights)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * logw))


def _next_beta(log_like: Array, beta: Array, target_ess: float):
    """Largest temperature increment keeping ESS above the target,
    found with a fixed-depth bisection (static control flow)."""
    n = log_like.shape[0]

    def ess_at(new_beta):
        return _ess((new_beta - beta) * log_like)

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target_ess * n
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, 32, body, (beta, jnp.asarray(1.0, beta.dtype))
    )
    full = ess_at(jnp.asarray(1.0, beta.dtype)) >= target_ess * n
    return jnp.where(full, 1.0, lo)


def run_smc(
    key: jax.Array,
    log_prior_fn: Callable[[Any], Array],
    log_like_fn: Callable[[Any], Array],
    init_particles: Any,
    *,
    num_mutations: int = 5,
    target_ess: float = 0.5,
    max_stages: int = 50,
    rw_scale: float = 0.5,
) -> SMCResult:
    """Run adaptive tempered SMC from the prior to the posterior.

    Args:
        key: PRNG key.
        log_prior_fn / log_like_fn: Log densities of a single pytree
            position (unconstrained space).
        init_particles: Particles drawn from the prior, stacked along a
            leading axis on every leaf.
        num_mutations: Random-walk Metropolis moves per stage.
        target_ess: ESS fraction triggering the temperature choice.
        max_stages: Static bound on the number of tempering stages.
        rw_scale: Proposal scale relative to the particle-cloud std.

    Returns:
        An :class:`SMCResult` with equally-weighted posterior particles and
        the log-evidence estimate.
    """
    leaves = jax.tree_util.tree_leaves(init_particles)
    n = leaves[0].shape[0]
    example = jax.tree_util.tree_map(lambda x: x[0], init_particles)
    ravel, unravel, dim = _ravel_spec(example)
    zs0 = jax.vmap(ravel)(init_particles)

    flat_prior = lambda z: log_prior_fn(unravel(z))
    flat_like = lambda z: log_like_fn(unravel(z))

    def mutate(key, zs, beta):
        """num_mutations random-walk MH steps targeting pi_beta."""
        # Preconditioned proposal: scale by the per-dimension particle std
        # (a cheap adaptive covariance; the global reduction shards as psum).
        std = jnp.std(zs, axis=0) + 1e-12

        def logpi(z):
            return flat_prior(z) + beta * flat_like(z)

        def one_move(carry, key):
            zs, logp, n_acc = carry
            key_prop, key_acc = jax.random.split(key)
            prop = zs + rw_scale * std[None, :] * jax.random.normal(
                key_prop, zs.shape
            )
            logp_prop = jax.vmap(logpi)(prop)
            logp_prop = jnp.where(
                jnp.isnan(logp_prop), -jnp.inf, logp_prop
            )
            accept = (
                jnp.log(jax.random.uniform(key_acc, (n,)))
                < logp_prop - logp
            )
            zs = jnp.where(accept[:, None], prop, zs)
            logp = jnp.where(accept, logp_prop, logp)
            n_acc = n_acc + jnp.mean(accept.astype(zs.dtype))
            return (zs, logp, n_acc), None

        logp = jax.vmap(logpi)(zs)
        (zs, _, n_acc), _ = jax.lax.scan(
            one_move,
            (zs, logp, jnp.zeros((), zs.dtype)),
            jax.random.split(key, num_mutations),
        )
        return zs, n_acc / num_mutations

    def stage(carry):
        key, zs, beta, log_Z, k, betas, accs = carry
        key, key_res, key_mut = jax.random.split(key, 3)

        log_like = jax.vmap(flat_like)(zs)
        log_like = jnp.where(jnp.isnan(log_like), -jnp.inf, log_like)
        new_beta = _next_beta(log_like, beta, target_ess)
        incr = (new_beta - beta) * log_like
        log_Z = log_Z + jax.scipy.special.logsumexp(incr) - jnp.log(n)

        idx = _systematic_resample(key_res, incr)
        zs = zs[idx]
        zs, acc_rate = mutate(key_mut, zs, new_beta)
        betas = betas.at[k].set(new_beta)
        accs = accs.at[k].set(acc_rate)
        return key, zs, new_beta, log_Z, k + 1, betas, accs

    def cond(carry):
        _, _, beta, _, k, _, _ = carry
        return (beta < 1.0) & (k < max_stages)

    key, zs, beta, log_Z, k, betas, accs = jax.lax.while_loop(
        cond,
        stage,
        (
            key,
            zs0,
            jnp.asarray(0.0, zs0.dtype),
            jnp.asarray(0.0, zs0.dtype),
            jnp.asarray(0, jnp.int32),
            jnp.full(max_stages, jnp.nan, zs0.dtype),
            jnp.full(max_stages, jnp.nan, zs0.dtype),
        ),
    )

    return SMCResult(
        particles=jax.vmap(unravel)(zs),
        log_weights=jnp.full(n, -jnp.log(jnp.asarray(n, zs.dtype))),
        log_evidence=log_Z,
        betas=betas,
        acceptance=accs,
        num_stages=k,
    )
