"""MCMC convergence diagnostics: split R-hat and effective sample size.

No reference counterpart (the reference ships no samplers); these are the
standard production checks for the chains :func:`tinygp_tpu.samplers.
run_mcmc` returns. Conventions follow the modern defaults: *split* R-hat
(each chain halved, so within-chain drift registers as disagreement) and
Geyer's initial-monotone-sequence ESS.

TPU note: autocorrelations are computed by direct masked matmuls over the
draw axis rather than FFTs — this backend lowers no complex-valued
primitives, and at typical (draws <= a few thousand) lengths the O(T^2)
contraction is a single small MXU call per chain batch.

All functions take ``(num_draws, num_chains)`` arrays (the layout
``run_mcmc`` produces per leaf) or pytrees of them via the ``*_tree``
variants.
"""

from __future__ import annotations

__all__ = ["potential_scale_reduction", "effective_sample_size", "summary"]

from typing import Any

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array


def _split_chains(x: Array) -> Array:
    """(draws, chains) -> (draws//2, 2*chains), dropping an odd draw."""
    t = (x.shape[0] // 2) * 2
    return jnp.concatenate(
        [x[: t // 2], x[t // 2 : t]], axis=1
    )


def potential_scale_reduction(x: Array) -> Array:
    """Split R-hat of one scalar quantity, shape ``(draws, chains)``.

    Values near 1 indicate the chains agree; > ~1.01 is the conventional
    flag for non-convergence.
    """
    x = _split_chains(jnp.asarray(x))
    t, c = x.shape
    chain_means = jnp.mean(x, axis=0)
    chain_vars = jnp.var(x, axis=0, ddof=1)
    w = jnp.mean(chain_vars)
    b = t * jnp.var(chain_means, ddof=1)
    var_plus = (t - 1) / t * w + b / t
    return jnp.sqrt(var_plus / w)


def _mean_autocovariance(x: Array) -> Array:
    """Chain-averaged autocovariance at all lags; x (t, c) -> (t,).

    Direct contraction, no FFT: the chain-mean lag products live in the
    (t, t) Gram matrix ``xc @ xc.T / c`` (one MXU call; ~1 MB at t=512),
    and a segment-sum over |i - j| collapses it to per-lag means. The
    trailing factor restores the biased (1/t) normalization the ESS
    estimator expects.
    """
    t = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    P = jnp.matmul(xc, xc.T, precision="highest") / x.shape[1]
    lag = jnp.abs(
        jnp.arange(t)[:, None] - jnp.arange(t)[None, :]
    ).reshape(-1)
    sums = jax.ops.segment_sum(P.reshape(-1), lag, num_segments=t)
    counts = jax.ops.segment_sum(
        jnp.ones_like(lag, dtype=x.dtype), lag, num_segments=t
    )
    return sums / counts * ((t - jnp.arange(t, dtype=x.dtype)) / t)


def effective_sample_size(x: Array) -> Array:
    """ESS of one scalar quantity, shape ``(draws, chains)``.

    Geyer's initial monotone sequence over paired autocorrelations,
    computed from the multi-chain variance estimate (so between-chain
    disagreement deflates the answer, like R-hat inflates).
    """
    x = _split_chains(jnp.asarray(x))
    t, c = x.shape
    chain_vars = jnp.var(x, axis=0, ddof=1)
    w = jnp.mean(chain_vars)
    b_over_t = jnp.var(jnp.mean(x, axis=0), ddof=1)
    var_plus = (t - 1) / t * w + b_over_t

    gamma = _mean_autocovariance(x)
    rho = 1.0 - (w - gamma) / var_plus  # rho[0] ~ 1 by construction

    # Pair consecutive lags (Geyer): p_k = rho_{2k} + rho_{2k+1}; keep
    # while positive, enforce monotone non-increase, then sum.
    t2 = t // 2
    pairs = rho[0 : 2 * t2 : 2] + rho[1 : 2 * t2 : 2]
    # Positive initial sequence: zero everything after the first
    # non-positive pair.
    positive = pairs > 0.0
    keep = jnp.cumprod(positive.astype(x.dtype))
    pairs = pairs * keep
    # Monotone: running minimum.
    pairs = jax.lax.associative_scan(jnp.minimum, pairs)
    pairs = jnp.maximum(pairs, 0.0)
    tau = -1.0 + 2.0 * jnp.sum(pairs)
    ess = (t * c) / jnp.maximum(tau, 1.0 / (t * c))
    return jnp.minimum(ess, jnp.asarray(float(t * c), x.dtype))


@jax.jit
def _leaf_diagnostics(arr: Array) -> tuple[Array, Array, Array, Array]:
    """All four statistics for a ``(draws, chains, dims)`` leaf, one program.

    ``vmap`` over the trailing dimension instead of a Python loop: a
    512-dim latent field is one compiled batch, not 1024 eager dispatches.
    """
    rhat = jax.vmap(potential_scale_reduction, in_axes=-1)(arr)
    ess = jax.vmap(effective_sample_size, in_axes=-1)(arr)
    return rhat, ess, jnp.mean(arr, axis=(0, 1)), jnp.std(arr, axis=(0, 1))


def summary(samples: Any) -> dict[str, dict[str, Array]]:
    """Per-leaf diagnostics for a ``run_mcmc`` result pytree.

    Returns ``{path: {"rhat": ..., "ess": ..., "mean": ..., "sd": ...}}``
    with one entry per flattened scalar dimension of each leaf.
    """
    out: dict[str, dict[str, Array]] = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(samples)
    for path, leaf in flat:
        name = jax.tree_util.keystr(path)
        arr = jnp.asarray(leaf)
        arr = arr.reshape(arr.shape[0], arr.shape[1], -1)
        rhat, ess, mean, sd = _leaf_diagnostics(arr)
        out[name] = {"rhat": rhat, "ess": ess, "mean": mean, "sd": sd}
    return out
