"""GP mean functions.

API parity: ``/root/reference/src/tinygp/means.py:25-86``. A mean function
is any callable mapping a *single* input coordinate to a scalar; the GP
lifts it over datasets with ``vmap``.
"""

from __future__ import annotations

__all__ = ["MeanBase", "Mean", "Conditioned"]

from collections.abc import Callable

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.utils.module import Module, static_field


class MeanBase(Module):
    def __call__(self, X: Array) -> Array:
        raise NotImplementedError


class Mean(MeanBase):
    """A constant or callable mean.

    Args:
        value: Either a scalar constant or a callable mapping one coordinate
            to the scalar mean there.
    """

    value: Array
    func: Callable[[Array], Array] | None = static_field(default=None)

    def __init__(self, value: Array | Callable[[Array], Array]):
        if callable(value):
            # Keep a defined (zero) leaf so the pytree has a stable structure.
            self._init(func=value, value=jnp.zeros(()))
        else:
            self._init(func=None, value=value)

    def __call__(self, X: Array) -> Array:
        if self.func is not None:
            return self.func(X)
        return self.value


class Conditioned(MeanBase):
    r"""The posterior mean of a conditioned process.

    ``mu(x) = k(x, X) @ alpha (+ prior mean)`` where ``alpha = K^{-1} y``.
    """

    X: Array
    alpha: Array
    kernel: Kernel
    include_mean: bool = static_field(default=True)
    mean_function: MeanBase | None = None

    def __call__(self, X: Array) -> Array:
        Ks = jax.vmap(self.kernel.evaluate, in_axes=(None, 0))(X, self.X)
        mu = Ks @ self.alpha
        if self.include_mean and self.mean_function is not None:
            mu = mu + self.mean_function(X)
        return mu
