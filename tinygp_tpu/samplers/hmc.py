"""Vectorized Hamiltonian Monte Carlo and iterative NUTS for TPU.

These samplers are new subsystems with no reference counterpart (the
reference deliberately ships no inference algorithms —
``/root/reference/docs/motivation.md:16-24``); they implement the
BASELINE.json north star: 1024+-chain vectorized hyperparameter posteriors
with the GP marginal likelihood as the target.

TPU-first design:

- Everything is written per-chain and lifted with ``vmap``; thousands of
  chains batch into MXU/VPU-friendly shapes.
- NUTS uses the *iterative* tree-building scheme (Phan et al.; the approach
  used by modern JAX PPLs) with a static ``max_tree_depth``: one
  ``while_loop`` whose trip count is bounded by ``2^max_depth``, O(log N)
  checkpoint storage for the U-turn conditions, and no recursion — so the
  whole transition compiles to a single fused XLA program that ``vmap`` and
  ``shard_map`` can batch and shard.
- All position states are pytrees; mass-matrix adaptation is diagonal per
  leaf (flattened internally).
"""

from __future__ import annotations

__all__ = ["hmc", "nuts", "window_adaptation", "run_mcmc", "WarmupInfo", "find_initial_step_size"]

import os
from collections.abc import Callable
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array


def _ravel_spec(example: Any):
    """Build (ravel, unravel, dim) for a pytree position."""
    leaves, treedef = jax.tree_util.tree_flatten(example)
    shapes = [jnp.shape(x) for x in leaves]
    sizes = [int(jnp.size(x)) for x in leaves]
    dim = sum(sizes)

    def ravel(tree):
        parts = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate([jnp.reshape(p, (-1,)) for p in parts])

    def unravel(flat):
        out = []
        idx = 0
        for shape, size in zip(shapes, sizes):
            out.append(jnp.reshape(flat[idx : idx + size], shape))
            idx += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return ravel, unravel, dim


class HMCState(NamedTuple):
    """Per-chain sampler state (flat position space)."""

    z: Array
    log_prob: Array
    grad: Array


class HMCInfo(NamedTuple):
    """Diagnostics emitted by each transition."""

    accept_prob: Array
    accepted: Array
    energy: Array
    num_steps: Array
    diverging: Array


def _leapfrog(value_and_grad, z, r, grad, step_size, inv_mass):
    r = r + 0.5 * step_size * grad
    z = z + step_size * inv_mass * r
    lp, grad = value_and_grad(z)
    r = r + 0.5 * step_size * grad
    return z, r, lp, grad


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(jnp.square(r) * inv_mass)


def hmc(
    log_prob_fn: Callable[[Array], Array],
    *,
    num_leapfrog: int = 32,
):
    """Build a fixed-length HMC transition on a *flat* position vector.

    Returns ``(init_fn, step_fn)`` where ``step_fn(key, state, step_size,
    inv_mass)`` performs one accept/reject trajectory.
    """
    value_and_grad = jax.value_and_grad(log_prob_fn)

    def init_fn(z0: Array) -> HMCState:
        lp, grad = value_and_grad(z0)
        return HMCState(z=z0, log_prob=lp, grad=grad)

    def step_fn(key, state: HMCState, step_size, inv_mass):
        key_mom, key_acc = jax.random.split(key)
        r0 = jax.random.normal(key_mom, state.z.shape) / jnp.sqrt(inv_mass)
        energy0 = -state.log_prob + _kinetic(r0, inv_mass)

        def body(_, carry):
            z, r, lp, grad = carry
            z, r, lp, grad = _leapfrog(
                value_and_grad, z, r, grad, step_size, inv_mass
            )
            return z, r, lp, grad

        z, r, lp, grad = jax.lax.fori_loop(
            0, num_leapfrog, body, (state.z, r0, state.log_prob, state.grad)
        )
        energy1 = -lp + _kinetic(r, inv_mass)
        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(delta))
        accept = jax.random.uniform(key_acc) < accept_prob
        new_state = HMCState(
            z=jnp.where(accept, z, state.z),
            log_prob=jnp.where(accept, lp, state.log_prob),
            grad=jnp.where(accept, grad, state.grad),
        )
        info = HMCInfo(
            accept_prob=accept_prob,
            accepted=accept,
            energy=energy1,
            num_steps=jnp.asarray(num_leapfrog),
            diverging=delta < -1000.0,
        )
        return new_state, info

    return init_fn, step_fn


# ---------------------------------------------------------------------------
# Iterative NUTS
# ---------------------------------------------------------------------------


class _TreeState(NamedTuple):
    """The running trajectory state during iterative doubling."""

    z_left: Array
    r_left: Array
    grad_left: Array
    z_right: Array
    r_right: Array
    grad_right: Array
    z_proposal: Array
    lp_proposal: Array
    grad_proposal: Array
    log_sum_weight: Array
    sum_r: Array
    depth: Array
    turning: Array
    diverging: Array
    sum_accept: Array
    num_steps: Array


def _is_turning(r_left, r_right, sum_r, inv_mass):
    """Generalized U-turn condition on the momentum sum."""
    v = sum_r * inv_mass
    left = jnp.dot(v, r_left)
    right = jnp.dot(v, r_right)
    return (left <= 0.0) | (right <= 0.0)


def nuts(
    log_prob_fn: Callable[[Array], Array],
    *,
    max_tree_depth: int = 8,
    max_delta_energy: float = 1000.0,
):
    """Build an iterative multinomial NUTS transition on a flat vector.

    Returns ``(init_fn, step_fn)`` with the same signature as :func:`hmc`.
    The transition runs a ``while_loop`` of tree doublings (up to
    ``max_tree_depth``); each doubling runs ``2^depth`` leapfrog steps in a
    ``while_loop`` with O(``max_tree_depth``) checkpoints for the internal
    U-turn checks — fully iterative and static-shaped for XLA.
    """
    value_and_grad = jax.value_and_grad(log_prob_fn)

    def init_fn(z0: Array) -> HMCState:
        lp, grad = value_and_grad(z0)
        return HMCState(z=z0, log_prob=lp, grad=grad)

    def _build_subtree(key, state, direction, depth, step_size, inv_mass, energy0):
        """Integrate 2^depth steps in one direction, with internal U-turn
        checks via binary checkpointing.

        Returns a summary of the new subtree: endpoints, a multinomial
        proposal, its total weight, momentum sum, and turning/divergence
        flags.
        """
        dim = state.z_left.shape[0]
        num_steps = jnp.asarray(1, jnp.int32) << depth

        # Pick the endpoint to extend from.
        z = jnp.where(direction > 0, state.z_right, state.z_left)
        r = jnp.where(direction > 0, state.r_right, state.r_left)
        grad = jnp.where(direction > 0, state.grad_right, state.grad_left)

        # Checkpoints (position/momentum) for the subtree U-turn conditions:
        # leaf i's relevant ancestors live at the set bits of i.
        ckpt_r = jnp.zeros((max_tree_depth, dim))
        ckpt_sum_r = jnp.zeros((max_tree_depth, dim))

        def leaf_cond(carry):
            step, *_rest, turning, diverging = carry
            return (step < num_steps) & ~turning & ~diverging

        def leaf_body(carry):
            (
                step,
                key,
                z,
                r,
                grad,
                z_prop,
                lp_prop,
                grad_prop,
                log_sum_w,
                sum_r,
                sum_acc,
                ckpt_r,
                ckpt_sum_r,
                turning,
                diverging,
            ) = carry

            eps = direction * step_size
            z, r, lp, grad = _leapfrog(value_and_grad, z, r, grad, eps, inv_mass)
            energy = -lp + _kinetic(r, inv_mass)
            delta = energy0 - energy
            delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
            diverging = delta < -max_delta_energy
            sum_acc = sum_acc + jnp.minimum(1.0, jnp.exp(delta))

            # Multinomial (progressive) sampling within the subtree.
            log_w = delta
            new_log_sum = jnp.logaddexp(log_sum_w, log_w)
            key, sub = jax.random.split(key)
            take = jax.random.uniform(sub) < jnp.exp(log_w - new_log_sum)
            z_prop = jnp.where(take, z, z_prop)
            lp_prop = jnp.where(take, lp, lp_prop)
            grad_prop = jnp.where(take, grad, grad_prop)

            sum_r = sum_r + r

            # Internal U-turn checks against checkpointed ancestors. For
            # leaf index s (0-based), compare against checkpoints at levels
            # given by the trailing-ones structure of s+1.
            idx = step
            # Store checkpoint when idx is even at level = count of trailing
            # zeros of idx... emulate the standard scheme: for each level l,
            # if this leaf starts a new 2^l block, record (r, sum_r-prefix).
            def check_level(l, args):
                ckpt_r, ckpt_sum_r, turning = args
                block = jnp.asarray(1, jnp.int32) << l
                starts_block = (idx % block) == 0
                ckpt_r = jnp.where(
                    starts_block, ckpt_r.at[l].set(r), ckpt_r
                )
                ckpt_sum_r = jnp.where(
                    starts_block, ckpt_sum_r.at[l].set(sum_r - r), ckpt_sum_r
                )
                ends_block = ((idx + 1) % block) == 0
                seg_sum = sum_r - ckpt_sum_r[l]
                turn_l = _is_turning(ckpt_r[l], r, seg_sum, inv_mass)
                turning = turning | (ends_block & turn_l & (block > 1))
                return ckpt_r, ckpt_sum_r, turning

            ckpt_r, ckpt_sum_r, turning = jax.lax.fori_loop(
                0, max_tree_depth, check_level, (ckpt_r, ckpt_sum_r, turning)
            )

            return (
                step + 1,
                key,
                z,
                r,
                grad,
                z_prop,
                lp_prop,
                grad_prop,
                new_log_sum,
                sum_r,
                sum_acc,
                ckpt_r,
                ckpt_sum_r,
                turning,
                diverging,
            )

        init = (
            jnp.asarray(0, jnp.int32),
            key,
            z,
            r,
            grad,
            z,  # placeholder proposal (weight -inf below)
            jnp.asarray(-jnp.inf, state.lp_proposal.dtype),
            grad,
            jnp.asarray(-jnp.inf),
            jnp.zeros(dim),
            jnp.asarray(0.0),
            ckpt_r,
            ckpt_sum_r,
            jnp.asarray(False),
            jnp.asarray(False),
        )
        out = jax.lax.while_loop(leaf_cond, leaf_body, init)
        (
            steps_done,
            _key,
            z_end,
            r_end,
            grad_end,
            z_prop,
            lp_prop,
            grad_prop,
            log_sum_w,
            sum_r,
            sum_acc,
            _cr,
            _csr,
            turning,
            diverging,
        ) = out
        return (
            z_end,
            r_end,
            grad_end,
            z_prop,
            lp_prop,
            grad_prop,
            log_sum_w,
            sum_r,
            turning,
            diverging,
            sum_acc,
            steps_done,
        )

    def step_fn(key, state: HMCState, step_size, inv_mass, depth_cap=None):
        # ``depth_cap``: optional TRACED bound <= max_tree_depth. The warmup
        # can anneal it (shallow trees while chains are far from the typical
        # set and the step size is untuned) without recompiling — the tree
        # state and checkpoint buffers stay sized for max_tree_depth.
        cap = (
            jnp.asarray(max_tree_depth, jnp.int32)
            if depth_cap is None
            else jnp.minimum(
                jnp.asarray(depth_cap, jnp.int32), max_tree_depth
            )
        )
        key_mom, key_tree = jax.random.split(key)
        r0 = jax.random.normal(key_mom, state.z.shape) / jnp.sqrt(inv_mass)
        energy0 = -state.log_prob + _kinetic(r0, inv_mass)

        tree = _TreeState(
            z_left=state.z,
            r_left=r0,
            grad_left=state.grad,
            z_right=state.z,
            r_right=r0,
            grad_right=state.grad,
            z_proposal=state.z,
            lp_proposal=state.log_prob,
            grad_proposal=state.grad,
            log_sum_weight=jnp.asarray(0.0),
            sum_r=r0,
            depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            sum_accept=jnp.asarray(0.0),
            num_steps=jnp.asarray(0, jnp.int32),
        )

        def cond(carry):
            _, tree = carry
            return (tree.depth < cap) & ~tree.turning & ~tree.diverging

        def body(carry):
            key, tree = carry
            key, key_dir, key_sub, key_accept = jax.random.split(key, 4)
            direction = jnp.where(
                jax.random.bernoulli(key_dir), 1.0, -1.0
            )
            (
                z_end,
                r_end,
                grad_end,
                z_prop,
                lp_prop,
                grad_prop,
                log_sum_w,
                sum_r,
                sub_turning,
                sub_diverging,
                sum_acc,
                steps_done,
            ) = _build_subtree(
                key_sub, tree, direction, tree.depth, step_size, inv_mass,
                energy0,
            )

            # Update the extended endpoint.
            z_left = jnp.where(direction > 0, tree.z_left, z_end)
            r_left = jnp.where(direction > 0, tree.r_left, r_end)
            grad_left = jnp.where(direction > 0, tree.grad_left, grad_end)
            z_right = jnp.where(direction > 0, z_end, tree.z_right)
            r_right = jnp.where(direction > 0, r_end, tree.r_right)
            grad_right = jnp.where(direction > 0, grad_end, tree.grad_right)

            # Biased progressive sampling between old tree and new subtree.
            valid = ~(sub_turning | sub_diverging)
            accept_new = (
                jax.random.uniform(key_accept)
                < jnp.exp(jnp.minimum(log_sum_w - tree.log_sum_weight, 0.0))
            ) & valid
            z_proposal = jnp.where(accept_new, z_prop, tree.z_proposal)
            lp_proposal = jnp.where(accept_new, lp_prop, tree.lp_proposal)
            grad_proposal = jnp.where(
                accept_new, grad_prop, tree.grad_proposal
            )

            total_sum_r = tree.sum_r + sum_r
            turning_total = _is_turning(r_left, r_right, total_sum_r, inv_mass)

            new_tree = _TreeState(
                z_left=z_left,
                r_left=r_left,
                grad_left=grad_left,
                z_right=z_right,
                r_right=r_right,
                grad_right=grad_right,
                z_proposal=z_proposal,
                lp_proposal=lp_proposal,
                grad_proposal=grad_proposal,
                log_sum_weight=jnp.logaddexp(
                    tree.log_sum_weight, jnp.where(valid, log_sum_w, -jnp.inf)
                ),
                sum_r=total_sum_r,
                depth=tree.depth + 1,
                turning=sub_turning | turning_total,
                diverging=sub_diverging,
                sum_accept=tree.sum_accept + sum_acc,
                num_steps=tree.num_steps + steps_done,
            )
            return key, new_tree

        _, tree = jax.lax.while_loop(cond, body, (key_tree, tree))

        new_state = HMCState(
            z=tree.z_proposal,
            log_prob=tree.lp_proposal,
            grad=tree.grad_proposal,
        )
        accept_prob = tree.sum_accept / jnp.maximum(
            tree.num_steps.astype(tree.sum_accept.dtype), 1.0
        )
        info = HMCInfo(
            accept_prob=accept_prob,
            # Multinomial NUTS has no single Metropolis accept; "accepted"
            # reports whether the transition moved off the initial point.
            accepted=jnp.any(tree.z_proposal != state.z),
            energy=-tree.lp_proposal,
            num_steps=tree.num_steps,
            diverging=tree.diverging,
        )
        return new_state, info

    return init_fn, step_fn


# ---------------------------------------------------------------------------
# Warmup: dual averaging + diagonal mass adaptation (windowed)
# ---------------------------------------------------------------------------


class DualAveragingState(NamedTuple):
    log_step: Array
    log_step_avg: Array
    grad_avg: Array
    t: Array
    mu: Array


def _da_init(step_size):
    return DualAveragingState(
        log_step=jnp.log(step_size),
        log_step_avg=jnp.log(step_size),
        grad_avg=jnp.zeros(()),
        t=jnp.zeros(()),
        mu=jnp.log(10.0 * step_size),
    )


def _da_update(state: DualAveragingState, accept_prob, target=0.8):
    t = state.t + 1.0
    eta = 1.0 / (t + 10.0)
    grad_avg = (1.0 - eta) * state.grad_avg + eta * (target - accept_prob)
    log_step = state.mu - grad_avg * jnp.sqrt(t) / 0.05
    weight = t ** -0.75
    log_step_avg = weight * log_step + (1.0 - weight) * state.log_step_avg
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step_avg,
        grad_avg=grad_avg,
        t=t,
        mu=state.mu,
    )


class WarmupInfo(NamedTuple):
    """Warmup diagnostics returned by :func:`window_adaptation`."""

    divergences_per_window: Array
    """Divergent-transition counts, one entry per adaptation window
    (initial fast buffer, each expanding slow window, final fast buffer)."""

    final_accept: Array
    """Cross-chain mean accept-stat over the final fast buffer — should
    land near ``target_accept`` when adaptation succeeded."""


def _warmup_schedule(num_warmup: int) -> tuple[int, list[int], int]:
    """Expanding ("slow") mass-window schedule over the warmup.

    The layout is the standard staged scheme: an initial fast buffer that
    adapts only the step size while chains find the typical set, a series
    of doubling covariance-estimation windows (25, 50, 100, ... steps), and
    a terminal fast buffer that re-equilibrates the step size against the
    final mass matrix. Returns ``(init_buffer, switch_steps, term_buffer)``
    where ``switch_steps`` are the step indices *after which* the mass
    matrix updates.
    """
    init_buffer, term_buffer, base = 75, 50, 25
    if init_buffer + base + term_buffer > num_warmup:
        # Short warmup: shrink the buffers proportionally, keep >= 1 window.
        init_buffer = max(1, int(0.15 * num_warmup))
        term_buffer = max(1, int(0.1 * num_warmup))
        base = num_warmup - init_buffer - term_buffer
        if base < 1:
            return num_warmup, [], 0
    switch_steps = []
    start, size = init_buffer, base
    while True:
        # Absorb the remainder into the last window when doubling again
        # would overrun the terminal buffer.
        if start + 3 * size > num_warmup - term_buffer:
            size = num_warmup - term_buffer - start
        switch_steps.append(start + size - 1)
        start += size
        if start >= num_warmup - term_buffer:
            break
        size *= 2
    return init_buffer, switch_steps, term_buffer


def find_initial_step_size(
    log_prob_fn: Callable[[Array], Array],
    states: HMCState,
    key: jax.Array,
    *,
    initial: float = 1.0,
    max_doublings: int = 20,
) -> Array:
    """A reasonable starting step size (Hoffman & Gelman, Algorithm 4).

    Doubles/halves the step until the cross-chain mean accept probability
    of a single leapfrog step crosses 1/2 — a few cheap device calls that
    save the dual-averaging loop from spending its first window walking
    an order of magnitude.
    """
    value_and_grad = jax.value_and_grad(log_prob_fn)
    dtype = states.z.dtype

    @jax.jit
    def search(z, lp, grad, key):
        # One device program: the doubling loop is a ``lax.while_loop``, so
        # the host pays a single dispatch instead of up to ``max_doublings``
        # round trips (each ~25-40 ms through the tunnel).
        r0 = jax.random.normal(key, z.shape)

        def mean_accept(eps):
            def one(z, r, lp, grad):
                _, r1, lp1, _ = _leapfrog(
                    value_and_grad, z, r, grad, eps, 1.0
                )
                delta = (lp1 - 0.5 * jnp.sum(r1 * r1)) - (
                    lp - 0.5 * jnp.sum(r * r)
                )
                return jnp.exp(
                    jnp.minimum(
                        jnp.where(jnp.isnan(delta), -jnp.inf, delta), 0.0
                    )
                )

            return jnp.mean(jax.vmap(one)(z, r0, lp, grad))

        p0 = mean_accept(jnp.asarray(initial, dtype))
        direction = jnp.where(p0 > 0.5, 1.0, -1.0).astype(dtype)

        def cond(carry):
            _eps, it, done = carry
            return (~done) & (it < max_doublings)

        def body(carry):
            eps, it, _done = carry
            eps = eps * (2.0**direction).astype(dtype)
            p = mean_accept(eps)
            crossed = jnp.where(direction > 0, p <= 0.5, p >= 0.5)
            return eps, it + 1, crossed

        eps, _, _ = jax.lax.while_loop(
            cond,
            body,
            (jnp.asarray(initial, dtype), jnp.asarray(0, jnp.int32), False),
        )
        return eps

    return search(states.z, states.log_prob, states.grad, key)


def window_adaptation(
    step_fn,
    *,
    num_warmup: int,
    target_accept: float = 0.8,
    initial_step_size: float = 0.1,
    axis: str | None = None,
    step_kwargs_fn=None,
):
    """Warmup: dual-averaged step size + staged diagonal mass adaptation.

    Mass estimation runs over expanding (doubling) windows; at each window
    boundary the regularized Welford variance becomes the new inverse mass,
    the estimator resets, and step-size adaptation re-anchors at the
    current step size — so early, badly-conditioned exploration never
    contaminates the final metric.

    Shared across chains: the accept statistic and the position moments are
    averaged over the chain axis, so all chains adapt one step size and one
    mass matrix. When ``axis`` names a mesh axis (the body is running under
    ``shard_map`` with chains sharded over it), the reductions extend
    across devices with ``pmean``/``psum``.

    Returns ``run(keys, states) -> (states, step_size, inv_mass, info)``,
    where ``keys``/``states`` carry a leading chain axis and ``info`` is a
    :class:`WarmupInfo`.

    ``step_kwargs_fn``, when given, maps the (traced) step index to extra
    keyword arguments for ``step_fn`` — e.g. an annealed ``depth_cap`` for
    NUTS during the initial fast buffer. ``init`` accepts an optional
    ``step_size`` override so a searched initial step need not be baked
    into the (cacheable) closure.
    """
    init_buffer, switch_steps, term_buffer = _warmup_schedule(num_warmup)
    num_windows = len(switch_steps) + 2

    def chain_mean(x, reduce_axis=None):
        m = jnp.mean(x, axis=reduce_axis)
        return jax.lax.pmean(m, axis) if axis is not None else m

    def chain_sum(x):
        s = jnp.sum(x)
        return jax.lax.psum(s, axis) if axis is not None else s

    def init(states: HMCState, step_size=None):
        dim = states.z.shape[-1]
        if step_size is None:
            step_size = initial_step_size
        return (
            states,
            _da_init(jnp.asarray(step_size)),
            jnp.ones(dim),
            jnp.zeros(dim),
            jnp.zeros(dim),
            jnp.zeros(()),
            jnp.zeros(num_windows),  # divergence count per window
            jnp.zeros(2),  # (sum accept, count) over the terminal buffer
        )

    def finish(carry):
        states, da, inv_mass, _m, _m2, _n, div, acc = carry
        info = WarmupInfo(
            divergences_per_window=div,
            final_accept=acc[0] / jnp.maximum(acc[1], 1.0),
        )
        return states, jnp.exp(da.log_step_avg), inv_mass, info

    switch_arr = jnp.asarray(switch_steps, jnp.int32).reshape(-1)
    # Window id of a step: 0 = init buffer, 1..k = slow windows, k+1 = term.
    starts = jnp.asarray(
        [init_buffer] + [s + 1 for s in switch_steps], jnp.int32
    ).reshape(-1)

    def body(carry, inputs):
        states, da, inv_mass, wmean, wm2, wn, div, acc = carry
        step, keys = inputs
        step_size = jnp.exp(da.log_step)
        extra = {} if step_kwargs_fn is None else step_kwargs_fn(step)
        states, infos = jax.vmap(
            lambda k, s: step_fn(k, s, step_size, inv_mass, **extra)
        )(keys, states)
        # Cross-chain (and, under shard_map, cross-device) mean accept stat.
        accept = chain_mean(infos.accept_prob)
        da = _da_update(da, accept, target=target_accept)

        widx = jnp.sum(step >= starts)
        div = div.at[widx].add(chain_sum(infos.diverging))
        in_term = step >= num_warmup - term_buffer
        acc = jnp.where(in_term, acc + jnp.stack([accept, jnp.ones_like(accept)]), acc)

        in_slow = (step >= init_buffer) & (step < num_warmup - term_buffer)
        n = wn + 1.0
        delta = states.z - wmean[None, :]
        wmean_new = wmean + chain_mean(delta, reduce_axis=0) / n
        wm2_new = wm2 + chain_mean(
            delta * (states.z - wmean_new[None, :]), reduce_axis=0
        )
        wmean = jnp.where(in_slow, wmean_new, wmean)
        wm2 = jnp.where(in_slow, wm2_new, wm2)
        wn = jnp.where(in_slow, n, wn)

        # Window boundary: switch in the regularized variance estimate,
        # restart the estimator, re-anchor step-size adaptation.
        at_switch = jnp.any(step == switch_arr)
        var = wm2 / jnp.maximum(wn, 1.0)
        # Shrink toward unit scale at low sample counts (the usual
        # n/(n+5) regularization) so tiny windows can't produce a wild
        # metric.
        var = (wn / (wn + 5.0)) * var + 1e-3 * (5.0 / (wn + 5.0))
        var = jnp.where(jnp.isfinite(var) & (var > 0), var, 1.0)
        inv_mass = jnp.where(at_switch, var, inv_mass)
        wmean = jnp.where(at_switch, jnp.zeros_like(wmean), wmean)
        wm2 = jnp.where(at_switch, jnp.zeros_like(wm2), wm2)
        wn = jnp.where(at_switch, jnp.zeros_like(wn), wn)
        da = jax.tree_util.tree_map(
            lambda reset, keep: jnp.where(at_switch, reset, keep),
            _da_init(jnp.exp(da.log_step)),
            da,
        )
        return (states, da, inv_mass, wmean, wm2, wn, div, acc), None

    def run(keys, states: HMCState, step_size=None):
        all_keys = jax.vmap(
            lambda i: jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, i)
        )(jnp.arange(num_warmup))
        carry, _ = jax.lax.scan(
            body, init(states, step_size), (jnp.arange(num_warmup), all_keys)
        )
        return finish(carry)

    run.init = init
    run.body = body
    run.finish = finish
    return run


_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_LIMIT = 8


def _mcmc_programs(
    log_prob_fn,
    treedef,
    leaf_sig,
    num_chains,
    num_warmup,
    sampler,
    max_tree_depth,
    num_leapfrog,
    target_accept,
    warmup_depth_cap,
):
    """Build (and cache) every jitted program one MCMC configuration needs.

    Keyed on the log-prob callable's identity plus the static run
    configuration, so repeated ``run_mcmc`` calls with the same model reuse
    traces and compiled executables instead of re-tracing per call (the
    chunked NUTS programs are large; re-tracing them dominated repeat-run
    wall time). All run-specific values (PRNG keys, the searched initial
    step size) enter as traced arguments, never as closure constants.
    """
    cache_key = (
        log_prob_fn,
        treedef,
        leaf_sig,
        num_chains,
        num_warmup,
        sampler,
        max_tree_depth,
        num_leapfrog,
        target_accept,
        warmup_depth_cap,
    )
    cached = _PROGRAM_CACHE.get(cache_key)
    if cached is not None:
        return cached

    example = jax.tree_util.tree_unflatten(
        treedef, [jnp.zeros(s, d) for s, d in leaf_sig]
    )
    ravel, unravel, dim = _ravel_spec(example)
    flat_log_prob = lambda z: log_prob_fn(unravel(z))

    if sampler == "nuts":
        init_fn, step_fn = nuts(flat_log_prob, max_tree_depth=max_tree_depth)
    elif sampler == "hmc":
        init_fn, step_fn = hmc(flat_log_prob, num_leapfrog=num_leapfrog)
    else:
        raise ValueError(f"unknown sampler: {sampler}")

    step_kwargs_fn = None
    if sampler == "nuts" and warmup_depth_cap is not None:
        init_buffer = _warmup_schedule(num_warmup)[0]
        cap = min(int(warmup_depth_cap), max_tree_depth)

        def step_kwargs_fn(step):
            # Shallow trees while chains walk toward the typical set with an
            # untuned step size (the initial fast buffer); full depth once
            # mass adaptation starts. Traced, so no recompilation.
            return {
                "depth_cap": jnp.where(step < init_buffer, cap, max_tree_depth)
            }

    adapt = window_adaptation(
        step_fn,
        num_warmup=num_warmup,
        target_accept=target_accept,
        step_kwargs_fn=step_kwargs_fn,
    )

    def sample_body(key_run, carry, step):
        states, step_size, inv_mass = carry
        keys = jax.random.split(
            jax.random.fold_in(key_run, step), num_chains
        )
        states, infos = jax.vmap(
            lambda k, s: step_fn(k, s, step_size, inv_mass)
        )(keys, states)
        return (states, step_size, inv_mass), (states.z, infos)

    chunk_fns: dict = {}

    def warm_chunk(length):
        fn = chunk_fns.get(("warm", length))
        if fn is None:

            def go(carry, step0, warm_keys):
                steps = step0 + jnp.arange(length)
                all_keys = jax.vmap(
                    lambda i: jax.vmap(
                        jax.random.fold_in, in_axes=(0, None)
                    )(warm_keys, i)
                )(steps)
                carry, _ = jax.lax.scan(adapt.body, carry, (steps, all_keys))
                return carry

            fn = chunk_fns[("warm", length)] = jax.jit(go)
        return fn

    def sample_chunk(length):
        fn = chunk_fns.get(("sample", length))
        if fn is None:

            def go(carry, step0, key_run):
                steps = step0 + jnp.arange(length)
                return jax.lax.scan(
                    partial(sample_body, key_run), carry, steps
                )

            fn = chunk_fns[("sample", length)] = jax.jit(go)
        return fn

    programs = {
        "ravel": ravel,
        "unravel": unravel,
        "dim": dim,
        "flat_log_prob": flat_log_prob,
        "init_fn": init_fn,
        "step_fn": step_fn,
        "adapt": adapt,
        "warm_chunk": warm_chunk,
        "sample_chunk": sample_chunk,
    }
    if len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_LIMIT:
        _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
    _PROGRAM_CACHE[cache_key] = programs
    return programs


def run_mcmc(
    key: jax.Array,
    log_prob_fn: Callable[[Any], Array],
    init_params: Any,
    *,
    num_chains: int = 4,
    num_warmup: int = 500,
    num_samples: int = 1000,
    sampler: str = "nuts",
    max_tree_depth: int = 8,
    num_leapfrog: int = 32,
    target_accept: float = 0.8,
    initial_step_size: float | None = 0.1,
    jitter_init: float = 1.0,
    steps_per_dispatch: int | None = 50,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 1,
    warmup_depth_cap: int | None = 4,
) -> tuple[Any, HMCInfo]:
    """End-to-end vectorized MCMC over a pytree-valued posterior.

    Args:
        key: PRNG key.
        log_prob_fn: Log density of a *single* pytree position.
        init_params: An example position pytree (chains are initialized by
            jittering it).
        num_chains: Number of vectorized chains.
        sampler: ``"nuts"`` or ``"hmc"``.
        steps_per_dispatch: Execute the warmup/sampling loops in device
            programs of at most this many transitions, stitched host-side.
            Bounded executions keep long runs inside device watchdog /
            RPC-timeout limits and give the host a checkpointing hook; the
            per-step RNG streams are derived from step indices, so results
            are bit-identical to ``None`` (one program per phase).
        checkpoint_path: If set, save the full sampler state (phase, step,
            chain states, adaptation state, collected samples) to this
            ``.npz`` after every ``checkpoint_every`` dispatches, and —
            when the file already exists — RESUME from it instead of
            starting over. Pair with ``steps_per_dispatch``.
        checkpoint_every: Dispatches between checkpoint writes.
        warmup_depth_cap: NUTS only — cap the tree depth at this value
            during the initial fast warmup buffer (default 4). Early
            warmup explores with an untuned step size far from the typical
            set, where deep trees cost leapfrogs without improving
            adaptation; the cap is lifted (traced, no recompile) once mass
            adaptation starts. ``None`` disables the anneal.

    Returns:
        ``(samples, info)`` where ``samples`` has leading dims
        ``(num_samples, num_chains)`` on every leaf.
    """
    import numpy as np

    from tinygp_tpu.utils.checkpoint import load_pytree, save_pytree

    treedef = jax.tree_util.tree_structure(init_params)
    leaf_sig = tuple(
        (getattr(l, "shape", ()), jnp.result_type(l))
        for l in jax.tree_util.tree_leaves(init_params)
    )
    programs = _mcmc_programs(
        log_prob_fn,
        treedef,
        leaf_sig,
        num_chains,
        num_warmup,
        sampler,
        max_tree_depth,
        num_leapfrog,
        target_accept,
        warmup_depth_cap,
    )
    ravel = programs["ravel"]
    unravel = programs["unravel"]
    dim = programs["dim"]
    adapt = programs["adapt"]

    key_init, key_warm, key_run, key_eps = jax.random.split(key, 4)
    z0 = ravel(init_params)
    z_chains = z0[None, :] + jitter_init * jax.random.normal(
        key_init, (num_chains, dim)
    )
    states = jax.vmap(programs["init_fn"])(z_chains)

    if initial_step_size is None:
        # Standard coarse search: start dual averaging within a factor of
        # two of a workable step instead of walking there one window at a
        # time.
        initial_step_size = find_initial_step_size(
            programs["flat_log_prob"], states, key_eps
        )
    initial_step_size = jnp.asarray(initial_step_size, z_chains.dtype)

    warm_keys = jax.random.split(key_warm, num_chains)

    if steps_per_dispatch is None:
        states, step_size, inv_mass, _warm_info = adapt(
            warm_keys, states, initial_step_size
        )
        _, (zs, infos) = programs["sample_chunk"](num_samples)(
            (states, step_size, inv_mass),
            jnp.asarray(0, jnp.int32),
            key_run,
        )
        samples = jax.vmap(jax.vmap(unravel))(zs)
        return samples, infos

    # --- chunked dispatch (bit-identical; bounded device programs) --------
    def warm_chunk(carry, step0, length):
        return programs["warm_chunk"](length)(
            carry, jnp.asarray(step0, jnp.int32), warm_keys
        )

    def sample_chunk(carry, step0, length):
        return programs["sample_chunk"](length)(
            carry, jnp.asarray(step0, jnp.int32), key_run
        )

    # Host-side run state: everything needed to resume, as one pytree.
    zdtype = np.asarray(z_chains).dtype
    run_state = {
        "phase": np.zeros((), np.int32),  # 0 = warmup, 1 = sampling
        "step": np.zeros((), np.int32),
        "warm": adapt.init(states, initial_step_size),
        "states": states,
        "step_size": jnp.zeros(()),
        "inv_mass": jnp.ones(dim),
        "zs": np.zeros((num_samples, num_chains, dim), zdtype),
        "info": HMCInfo(
            accept_prob=np.zeros((num_samples, num_chains), zdtype),
            accepted=np.zeros((num_samples, num_chains), bool),
            energy=np.zeros((num_samples, num_chains), zdtype),
            num_steps=np.zeros((num_samples, num_chains), np.int32),
            diverging=np.zeros((num_samples, num_chains), bool),
        ),
    }
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        run_state = load_pytree(checkpoint_path, run_state)

    dispatches = 0

    def maybe_checkpoint(force=False):
        nonlocal dispatches
        dispatches += 1
        if checkpoint_path is not None and (
            force or dispatches % checkpoint_every == 0
        ):
            save_pytree(checkpoint_path, run_state)

    while int(run_state["phase"]) == 0 and int(run_state["step"]) < num_warmup:
        step = int(run_state["step"])
        length = min(steps_per_dispatch, num_warmup - step)
        run_state["warm"] = warm_chunk(run_state["warm"], step, length)
        run_state["step"] = np.asarray(step + length, np.int32)
        maybe_checkpoint()

    if int(run_state["phase"]) == 0:
        states, step_size, inv_mass, _warm_info = adapt.finish(
            run_state["warm"]
        )
        run_state.update(
            phase=np.ones((), np.int32),
            step=np.zeros((), np.int32),
            states=states,
            step_size=step_size,
            inv_mass=inv_mass,
        )
        maybe_checkpoint(force=True)

    while int(run_state["step"]) < num_samples:
        step = int(run_state["step"])
        length = min(steps_per_dispatch, num_samples - step)
        carry = (
            run_state["states"],
            run_state["step_size"],
            run_state["inv_mass"],
        )
        (states, *_), (z_chunk, info_chunk) = sample_chunk(
            carry, step, length
        )
        run_state["states"] = states
        run_state["zs"][step : step + length] = np.asarray(z_chunk)
        for name in HMCInfo._fields:
            getattr(run_state["info"], name)[step : step + length] = (
                np.asarray(getattr(info_chunk, name))
            )
        run_state["step"] = np.asarray(step + length, np.int32)
        maybe_checkpoint()

    if checkpoint_path is not None:
        save_pytree(checkpoint_path, run_state)

    samples = jax.vmap(jax.vmap(unravel))(jnp.asarray(run_state["zs"]))
    info = HMCInfo(
        *(jnp.asarray(getattr(run_state["info"], f)) for f in HMCInfo._fields)
    )
    return samples, info
