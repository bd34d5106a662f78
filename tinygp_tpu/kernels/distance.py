"""Distance metrics for stationary kernels.

API parity: ``/root/reference/src/tinygp/kernels/distance.py:22-59``.

The L2 metric keeps gradients finite at coincident points: a plain
``sqrt(sum((x-y)^2))`` has an undefined derivative at r = 0, so at that
point we switch (via a ``where``-guard on both the value and the operand,
the standard double-``where`` trick that keeps reverse-mode AD NaN-free) to
the L1 distance, which matches the L2 value and gives the correct
directional derivative there.
"""

from __future__ import annotations

__all__ = ["Distance", "L1Distance", "L2Distance", "UnitDistance"]

import jax.numpy as jnp

from tinygp_tpu.helpers import Array
from tinygp_tpu.utils.module import Module


class Distance(Module):
    """Abstract base class for distance metrics."""

    def distance(self, X1: Array, X2: Array) -> Array:
        """The distance between two points under this metric."""
        raise NotImplementedError

    def squared_distance(self, X1: Array, X2: Array) -> Array:
        """The squared distance; override when cheaper than squaring."""
        return jnp.square(self.distance(X1, X2))


class L1Distance(Distance):
    """Manhattan distance."""

    def distance(self, X1: Array, X2: Array) -> Array:
        return jnp.sum(jnp.abs(X1 - X2))


class L2Distance(Distance):
    """Euclidean distance with a gradient-safe r = 0 branch."""

    def distance(self, X1: Array, X2: Array) -> Array:
        r2 = self.squared_distance(X1, X2)
        at_zero = jnp.equal(r2, 0)
        safe_r2 = jnp.where(at_zero, jnp.ones_like(r2), r2)
        l1 = L1Distance().distance(X1, X2)
        return jnp.where(at_zero, l1, jnp.sqrt(safe_r2))

    def squared_distance(self, X1: Array, X2: Array) -> Array:
        return jnp.sum(jnp.square(X1 - X2))


class UnitDistance(Distance):
    """A degenerate metric that always returns 1; useful for testing."""

    def distance(self, X1: Array, X2: Array) -> Array:
        del X2
        return jnp.ones_like(jnp.sum(X1))
