"""Mesh-sharded samplers: chains and particles across TPU devices.

The single-device samplers in :mod:`tinygp_tpu.samplers` are written
per-chain and lifted with ``vmap``; here the chain/particle axis is
additionally sharded over a :class:`jax.sharding.Mesh` with ``shard_map``.
Cross-device interaction is limited to:

- **MCMC warmup**: the dual-averaging accept statistic is a ``pmean`` over
  the chain axis (every device adapts the same step size / mass matrix);
- **SMC**: log-weight normalization and the ESS are ``pmean``-style
  reductions, and resampling ``all_gather``s the (small) weight vector and
  particle cloud so every device can select its strata — the standard
  distributed systematic-resampling layout.

These collectives ride ICI within a slice and DCN across slices; nothing
here assumes a particular topology.
"""

from __future__ import annotations

__all__ = ["run_mcmc_sharded", "run_smc_sharded"]

from collections.abc import Callable
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tinygp_tpu.helpers import Array
from tinygp_tpu.parallel.mesh import chain_axis, local_chunk
from tinygp_tpu.samplers.hmc import (
    HMCState,
    _ravel_spec,
    hmc,
    nuts,
    window_adaptation,
)
from tinygp_tpu.samplers.smc import _next_beta, _systematic_resample


def run_mcmc_sharded(
    key: jax.Array,
    log_prob_fn: Callable[[Any], Array],
    init_params: Any,
    *,
    mesh: Mesh,
    num_chains: int,
    num_warmup: int = 500,
    num_samples: int = 1000,
    sampler: str = "nuts",
    max_tree_depth: int = 8,
    num_leapfrog: int = 32,
    target_accept: float = 0.8,
    initial_step_size: float = 0.1,
    jitter_init: float = 1.0,
    axis: str = chain_axis,
) -> tuple[Any, Any]:
    """Run vectorized MCMC with chains sharded over a device mesh.

    Semantics match :func:`tinygp_tpu.samplers.run_mcmc`, but the chain axis
    is distributed: each device integrates ``num_chains / num_devices``
    chains, and the warmup adaptation statistics are reduced with ``pmean``
    so all devices share one step size and mass matrix.

    Returns ``(samples, info)`` with ``samples`` shaped
    ``(num_samples, num_chains, ...)`` on every leaf, sharded over the chain
    axis.
    """
    local_chunk(num_chains, mesh, axis)  # validate divisibility

    ravel, unravel, dim = _ravel_spec(init_params)
    flat_log_prob = lambda z: log_prob_fn(unravel(z))

    if sampler == "nuts":
        init_fn, step_fn = nuts(flat_log_prob, max_tree_depth=max_tree_depth)
    elif sampler == "hmc":
        init_fn, step_fn = hmc(flat_log_prob, num_leapfrog=num_leapfrog)
    else:
        raise ValueError(f"unknown sampler: {sampler}")

    key_init, key_warm, key_run = jax.random.split(key, 3)
    z0 = ravel(init_params)
    z_chains = z0[None, :] + jitter_init * jax.random.normal(
        key_init, (num_chains, dim)
    )
    chain_keys = jax.random.split(key_warm, num_chains)

    spec_chain = P(axis)
    z_chains = jax.device_put(z_chains, NamedSharding(mesh, spec_chain))

    # The same staged (expanding-window) adaptation as the single-device
    # path, with the chain-axis reductions extended across devices.
    adapt = window_adaptation(
        step_fn,
        num_warmup=num_warmup,
        target_accept=target_accept,
        initial_step_size=initial_step_size,
        axis=axis,
    )

    def device_program(z_local, keys_local):
        """Everything one device does: warmup + sampling on its chains."""
        states = jax.vmap(init_fn)(z_local)

        all_keys = jax.vmap(
            lambda i: jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                keys_local, i
            )
        )(jnp.arange(num_warmup))
        carry, _ = jax.lax.scan(
            adapt.body, adapt.init(states), (jnp.arange(num_warmup), all_keys)
        )
        states, step_size, inv_mass, _warm_info = adapt.finish(carry)

        # ---- sampling ----
        def sample_body(states, step):
            keys = jax.vmap(
                lambda k: jax.random.fold_in(jax.random.fold_in(k, step), 1)
            )(keys_local)
            states, infos = jax.vmap(
                lambda k, s: step_fn(k, s, step_size, inv_mass)
            )(keys, states)
            return states, (states.z, infos.accept_prob, infos.num_steps)

        _, (zs, accs, steps) = jax.lax.scan(
            sample_body, states, jnp.arange(num_samples)
        )
        return zs, accs, steps

    sharded = shard_map(
        device_program,
        mesh=mesh,
        in_specs=(spec_chain, spec_chain),
        out_specs=(P(None, axis), P(None, axis), P(None, axis)),
        check_vma=False,
    )
    zs, accs, steps = jax.jit(sharded)(z_chains, chain_keys)
    samples = jax.vmap(jax.vmap(unravel))(zs)
    return samples, {"accept_prob": accs, "num_steps": steps}


def run_smc_sharded(
    key: jax.Array,
    log_prior_fn: Callable[[Any], Array],
    log_like_fn: Callable[[Any], Array],
    init_particles: Any,
    *,
    mesh: Mesh,
    num_mutations: int = 5,
    target_ess: float = 0.5,
    max_stages: int = 50,
    rw_scale: float = 0.5,
    axis: str = chain_axis,
) -> dict[str, Any]:
    """Adaptive tempered SMC with particles sharded over a device mesh.

    Cross-device resampling: every device ``all_gather``s the global
    log-weights and particle cloud (hyperparameter spaces are small), runs
    the shared systematic-resampling rule with the *same* uniform draw, and
    keeps its own stratum — communication is one all-gather per stage.

    Returns a dict with equally-weighted ``particles`` (sharded), the
    ``log_evidence`` estimate, the final ``beta`` and stage count.
    """
    leaves = jax.tree_util.tree_leaves(init_particles)
    n_total = leaves[0].shape[0]
    n_local = local_chunk(n_total, mesh, axis)
    example = jax.tree_util.tree_map(lambda x: x[0], init_particles)
    ravel, unravel, dim = _ravel_spec(example)
    zs0 = jax.vmap(ravel)(init_particles)
    zs0 = jax.device_put(zs0, NamedSharding(mesh, P(axis)))

    flat_prior = lambda z: log_prior_fn(unravel(z))
    flat_like = lambda z: log_like_fn(unravel(z))

    def device_program(key, zs_local):
        my_index = jax.lax.axis_index(axis)

        def logsumexp_global(x_local):
            m = jax.lax.pmax(jnp.max(x_local), axis_name=axis)
            s = jax.lax.psum(jnp.sum(jnp.exp(x_local - m)), axis_name=axis)
            return m + jnp.log(s)

        def mutate(key, zs, beta):
            mean = jax.lax.pmean(jnp.mean(zs, axis=0), axis_name=axis)
            var = jax.lax.pmean(
                jnp.mean(jnp.square(zs - mean[None, :]), axis=0),
                axis_name=axis,
            )
            std = jnp.sqrt(var) + 1e-12

            def logpi(z):
                return flat_prior(z) + beta * flat_like(z)

            def one_move(carry, key):
                zs, logp, acc = carry
                key_prop, key_acc = jax.random.split(key)
                prop = zs + rw_scale * std[None, :] * jax.random.normal(
                    key_prop, zs.shape
                )
                logp_prop = jax.vmap(logpi)(prop)
                logp_prop = jnp.where(
                    jnp.isnan(logp_prop), -jnp.inf, logp_prop
                )
                accept = (
                    jnp.log(jax.random.uniform(key_acc, (n_local,)))
                    < logp_prop - logp
                )
                zs = jnp.where(accept[:, None], prop, zs)
                logp = jnp.where(accept, logp_prop, logp)
                acc = acc + jax.lax.pmean(
                    jnp.mean(accept.astype(zs.dtype)), axis_name=axis
                )
                return (zs, logp, acc), None

            logp = jax.vmap(logpi)(zs)
            (zs, _, acc), _ = jax.lax.scan(
                one_move,
                (zs, logp, jnp.zeros((), zs.dtype)),
                jax.random.split(key, num_mutations),
            )
            return zs, acc / num_mutations

        def stage(carry):
            key, zs, beta, log_Z, k, betas, accs = carry
            key, key_res, key_mut = jax.random.split(key, 3)

            log_like = jax.vmap(flat_like)(zs)
            log_like = jnp.where(jnp.isnan(log_like), -jnp.inf, log_like)

            # Global adaptive temperature: needs all log-likes.
            gathered_ll = jax.lax.all_gather(
                log_like, axis_name=axis, tiled=True
            )
            new_beta = _next_beta(gathered_ll, beta, target_ess)
            incr_local = (new_beta - beta) * log_like
            log_Z = log_Z + logsumexp_global(incr_local) - jnp.log(
                jnp.asarray(n_total, zs.dtype)
            )

            # Distributed systematic resampling: shared key → identical
            # global index vector on every device; keep our stratum.
            gathered_incr = jax.lax.all_gather(
                incr_local, axis_name=axis, tiled=True
            )
            gathered_zs = jax.lax.all_gather(zs, axis_name=axis, tiled=True)
            idx = _systematic_resample(key_res, gathered_incr)
            mine = jax.lax.dynamic_slice_in_dim(
                idx, my_index * n_local, n_local
            )
            zs = gathered_zs[mine]

            zs, acc = mutate(key_mut, zs, new_beta)
            betas = betas.at[k].set(new_beta)
            accs = accs.at[k].set(acc)
            return key, zs, new_beta, log_Z, k + 1, betas, accs

        def cond(carry):
            _, _, beta, _, k, _, _ = carry
            return (beta < 1.0) & (k < max_stages)

        _, zs, _beta, log_Z, k, betas, accs = jax.lax.while_loop(
            cond,
            stage,
            (
                key,
                zs_local,
                jnp.asarray(0.0, zs_local.dtype),
                jnp.asarray(0.0, zs_local.dtype),
                jnp.asarray(0, jnp.int32),
                jnp.full(max_stages, jnp.nan, zs_local.dtype),
                jnp.full(max_stages, jnp.nan, zs_local.dtype),
            ),
        )
        return zs, log_Z, k, betas, accs

    sharded = shard_map(
        device_program,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(), P(), P(), P()),
        check_vma=False,
    )
    zs, log_Z, k, betas, accs = jax.jit(sharded)(key, zs0)
    return {
        "particles": jax.vmap(unravel)(zs),
        "log_evidence": log_Z,
        "betas": betas,
        "num_stages": k,
        "acceptance": accs,
    }
