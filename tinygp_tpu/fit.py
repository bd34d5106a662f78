"""Compiled maximum-a-posteriori / maximum-likelihood fitting.

The reference leaves optimization to external libraries (its tutorials use
``jaxopt``/``optax`` loops with one XLA dispatch per step —
``/root/reference/docs/tutorials/quickstart.ipynb``, ``modeling.ipynb``).
On this stack the entire optimization runs as ONE compiled program: the
optax update is driven by ``lax.scan``, so a 500-step fit costs a single
dispatch — on a tunneled TPU (25-40 ms round trip per dispatch) that is the
difference between ~20 s of overhead and none.
"""

from __future__ import annotations

__all__ = ["fit_map", "FitResult"]

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array


class FitResult(NamedTuple):
    params: Any
    """Parameters at the best (lowest-loss) step seen, not the last one."""

    loss: Array
    """Loss at :attr:`params`."""

    losses: Array
    """Per-step loss trace, shape ``(num_steps,)``."""

    converged: Array
    """Whether the trajectory settled: the final-window mean |loss change|
    fell below ``tol`` AND the final window sits at the best loss seen (a
    flat-but-diverged tail does not count)."""


def fit_map(
    loss_fn: Callable[[Any], Array],
    init_params: Any,
    *,
    optimizer: Any | None = None,
    num_steps: int = 500,
    learning_rate: float = 0.05,
    tol: float = 1e-6,
) -> FitResult:
    """Minimize a scalar loss over a parameter pytree, fully compiled.

    Args:
        loss_fn: Scalar objective, e.g.
            ``lambda p: -build_gp(p).log_probability(y)``.
        init_params: Starting pytree.
        optimizer: Any ``optax.GradientTransformation``; defaults to
            ``optax.adam(learning_rate)``.
        num_steps: Fixed step count (static — the loop is a ``lax.scan``).
        learning_rate: Used only for the default optimizer.
        tol: Convergence report threshold on the mean per-step improvement
            over the last tenth of the trajectory (reported, not an early
            exit: a fixed-shape loop compiles once and pipelines on TPU).

    Returns:
        A :class:`FitResult`; ``result.params`` tracks the best step seen,
        so a late divergence (too-hot learning rate) cannot corrupt the fit.

    Non-finite losses are treated as +inf for the best-step tracking, so an
    excursion through an invalid region is recoverable.
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(learning_rate)

    value_and_grad = jax.value_and_grad(loss_fn)

    def step(carry, _):
        params, opt_state, best_params, best_loss = carry
        loss, grads = value_and_grad(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        guarded = jnp.where(jnp.isfinite(loss), loss, jnp.inf)
        better = guarded < best_loss
        best_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old), params, best_params
        )
        best_loss = jnp.where(better, guarded, best_loss)
        return (new_params, opt_state, best_params, best_loss), loss

    @jax.jit
    def run(init_params):
        init = (
            init_params,
            optimizer.init(init_params),
            init_params,
            jnp.asarray(jnp.inf, jnp.result_type(float)),
        )
        (_, _, best_params, best_loss), losses = jax.lax.scan(
            step, init, None, length=num_steps
        )
        window = max(1, num_steps // 10)
        drops = -jnp.diff(losses[-window - 1 :])
        # |mean drop| < tol: a *rising* final window (late divergence under
        # a hot learning rate gives negative drops) must not read as
        # converged. And the final window must actually sit at the best
        # loss seen — otherwise the trajectory left its optimum behind.
        flat = jnp.abs(jnp.nanmean(drops)) < tol
        final_best = jnp.nanmin(losses[-window:])
        scale = jnp.maximum(1.0, jnp.abs(best_loss))
        near_best = final_best <= best_loss + 1e-3 * scale
        converged = flat & near_best
        return FitResult(best_params, best_loss, losses, converged)

    return run(init_params)
