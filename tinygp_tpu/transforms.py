"""Input-coordinate transforms for building expressive kernels.

API parity: ``/root/reference/src/tinygp/transforms.py:23-162``
(``Transform``, ``Linear``, ``Cholesky``, ``Subspace``).

Examples:
    A multivariate kernel with one length scale per input dimension:

    >>> import jax.numpy as jnp
    >>> from tinygp_tpu import kernels, transforms
    >>> k = transforms.Linear(
    ...     scale=1.0 / jnp.array([2.0, 0.5]),
    ...     kernel=kernels.ExpSquared(),
    ... )
    >>> X = jnp.zeros((5, 2))
    >>> k(X, X).shape
    (5, 5)
"""

from __future__ import annotations

__all__ = ["Transform", "Linear", "Cholesky", "Subspace"]

from collections.abc import Callable, Sequence
from typing import Any

import jax.numpy as jnp
from jax.scipy import linalg

from tinygp_tpu.helpers import Array
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.utils.module import static_field


class Transform(Kernel):
    """Apply an arbitrary callable to the inputs of a kernel.

    Args:
        transform: Maps an input coordinate to a transformed coordinate.
        kernel: The kernel evaluated in the transformed space.
    """

    transform: Callable[[Any], Any] = static_field()
    kernel: Kernel

    def evaluate(self, X1: Array, X2: Array) -> Array:
        return self.kernel.evaluate(self.transform(X1), self.transform(X2))


class Linear(Kernel):
    """Multiply the inputs by a scalar, per-dimension, or matrix scale.

    Args:
        scale: A 0-, 1-, or 2-dimensional scale applied as ``scale * x`` (or
            ``scale @ x`` when 2-dimensional).
        kernel: The kernel evaluated in the transformed space.
    """

    scale: Array
    kernel: Kernel

    def _apply(self, X: Array) -> Array:
        ndim = jnp.ndim(self.scale)
        if ndim < 2:
            return self.scale * X
        if ndim == 2:
            return jnp.dot(self.scale, X)
        raise ValueError(
            f"Linear scale has {ndim} dimensions; at most 2 are meaningful"
        )

    def evaluate(self, X1: Array, X2: Array) -> Array:
        return self.kernel.evaluate(self._apply(X1), self._apply(X2))


class Cholesky(Kernel):
    """Warp inputs by the inverse of a lower-triangular factor.

    Args:
        factor: A 0-, 1-, or 2-dimensional Cholesky factor; inputs are
            transformed as ``solve(factor, x)`` (or division for scalar /
            diagonal factors).
        kernel: The kernel evaluated in the transformed space.
    """

    factor: Array
    kernel: Kernel

    def _apply(self, X: Array) -> Array:
        ndim = jnp.ndim(self.factor)
        if ndim < 2:
            return X / self.factor
        if ndim == 2:
            return linalg.solve_triangular(self.factor, X, lower=True)
        raise ValueError(
            f"Cholesky factor has {ndim} dimensions; at most 2 are meaningful"
        )

    def evaluate(self, X1: Array, X2: Array) -> Array:
        return self.kernel.evaluate(self._apply(X1), self._apply(X2))

    @classmethod
    def from_parameters(
        cls, diagonal: Array, off_diagonal: Array, kernel: Kernel
    ) -> Cholesky:
        """Build from an unconstrained (diagonal, strictly-lower) packing.

        Args:
            diagonal: ``(ndim,)`` positive diagonal entries.
            off_diagonal: ``(ndim*(ndim-1)/2,)`` strictly-lower entries.
            kernel: The kernel evaluated in the transformed space.
        """
        dim = jnp.size(diagonal)
        expect = dim * (dim - 1) // 2
        if jnp.size(off_diagonal) != expect:
            raise ValueError(
                f"a {dim}-dimensional Cholesky packing takes {expect} "
                f"strictly-lower entries; got {jnp.size(off_diagonal)}"
            )
        factor = jnp.zeros((dim, dim), diagonal.dtype)
        factor = factor.at[jnp.diag_indices(dim)].set(diagonal)
        factor = factor.at[jnp.tril_indices(dim, -1)].set(off_diagonal)
        return cls(factor=factor, kernel=kernel)


class Subspace(Kernel):
    """Evaluate a kernel on a subset of the input dimensions.

    Args:
        axis: An integer or tuple of integers selecting dimensions.
        kernel: The kernel evaluated on the selected dimensions.
    """

    axis: Sequence[int] | int = static_field()
    kernel: Kernel

    def evaluate(self, X1: Array, X2: Array) -> Array:
        return self.kernel.evaluate(X1[self.axis], X2[self.axis])
