"""Kernel base class and composition algebra.

API parity target: ``/root/reference/src/tinygp/kernels/base.py:30-249``
(``Kernel`` ABC with pointwise ``evaluate`` lifted by ``vmap``, operator
overloads building ``Sum``/``Product``/``Constant`` trees, the conditioned
predictive kernel, and the ``DotProduct``/``Polynomial`` kernels).

TPU-first note: the pointwise-``evaluate`` contract is kept because it is the
extension point users write custom kernels against, but matrix construction
is routed through :meth:`Kernel.gram`, an overridable batched hook. The
default lifts ``evaluate`` with nested ``vmap`` (XLA fuses this into a single
elementwise loop over an N×M grid); the dense solver can swap in a
Pallas-tiled builder for the hot O(N²) construction without touching kernel
definitions.
"""

from __future__ import annotations

__all__ = [
    "Kernel",
    "Conditioned",
    "Custom",
    "Sum",
    "Product",
    "Constant",
    "DotProduct",
    "Polynomial",
]

from collections.abc import Callable
from typing import TYPE_CHECKING, Any

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.utils.module import Module, field, static_field

if TYPE_CHECKING:
    from tinygp_tpu.solvers.solver import Solver


class Kernel(Module):
    """The base class for all kernel implementations.

    Subclasses take parameters in their constructor and override
    :meth:`evaluate`, which receives a *single pair* of input points (scalars
    or ``(n_dim,)`` arrays). All batching/broadcasting over datasets is
    handled here via ``vmap``.

    Examples:
        Kernels compose with ``+`` and ``*`` (scalars lift to
        :class:`Constant`), and calling one builds the full matrix:

        >>> import jax.numpy as jnp
        >>> from tinygp_tpu import kernels
        >>> k = 1.5 * kernels.Matern32(scale=2.0) + 0.1
        >>> K = k(jnp.linspace(0, 1, 4), jnp.linspace(0, 1, 6))
        >>> K.shape
        (4, 6)
        >>> round(float(k.evaluate(0.3, 0.3)), 5)
        1.6
    """

    def evaluate(self, X1: Array, X2: Array) -> Array:
        """Evaluate the kernel at a single pair of inputs."""
        del X1, X2
        raise NotImplementedError

    def evaluate_diag(self, X: Array) -> Array:
        """Evaluate the kernel variance at a single input.

        Defaults to ``evaluate(X, X)``; subclasses can specialize.
        """
        return self.evaluate(X, X)

    def gram(self, X1: Array, X2: Array) -> Array:
        """Build the full cross-covariance matrix ``K[i, j] = k(X1[i], X2[j])``.

        This is the batched construction hook. The default implementation
        lifts the pointwise :meth:`evaluate` with nested ``vmap``; subclasses
        and solvers may override/bypass with hardware-tiled builders.
        """
        return jax.vmap(
            jax.vmap(self.evaluate, in_axes=(None, 0)), in_axes=(0, None)
        )(X1, X2)

    def diag(self, X: Array) -> Array:
        """Evaluate the kernel diagonal over a dataset."""
        return jax.vmap(self.evaluate_diag)(X)

    def matmul(
        self,
        X1: Array,
        X2: Array | None = None,
        y: Array | None = None,
    ) -> Array:
        """Compute ``K(X1, X2) @ y`` (densely, by default).

        Two-argument form ``matmul(X1, y)`` evaluates the symmetric
        ``K(X1, X1) @ y``. The contraction is precision-pinned (``pdot``)
        so TPU bf16 demotion cannot corrupt predictive means.
        """
        if y is None:
            X2, y = None, X2
            if y is None:
                raise TypeError("matmul() needs a right-hand side `y`")
        return pdot(self(X1, X1 if X2 is None else X2), y)

    def __call__(self, X1: Array, X2: Array | None = None) -> Array:
        if X2 is None:
            return _checked_ndim(self.diag(X1), 1, "diagonal")
        return _checked_ndim(self.gram(X1, X2), 2, "matrix")

    # -- composition algebra ------------------------------------------------
    def __add__(self, other: Kernel | Array) -> Kernel:
        return Sum(self, _as_kernel(other))

    def __radd__(self, other: Any) -> Kernel:
        # builtin sum() seeds its accumulator with the int 0; fold it away.
        return self if other == 0 else Sum(_as_kernel(other), self)

    def __mul__(self, other: Kernel | Array) -> Kernel:
        return Product(self, _as_kernel(other))

    def __rmul__(self, other: Any) -> Kernel:
        return Product(_as_kernel(other), self)


def _as_kernel(obj: Any) -> Kernel:
    """Lift a scalar into a :class:`Constant`; pass kernels through."""
    return obj if isinstance(obj, Kernel) else Constant(obj)


def _checked_ndim(k: Array, ndim: int, what: str) -> Array:
    if k.ndim != ndim:
        raise ValueError(
            f"kernel evaluation produced a {k.ndim}-d {what} where {ndim}-d "
            "was expected — a parameter or a custom evaluate() is likely "
            "carrying extra dimensions"
        )
    return k


class Conditioned(Kernel):
    """The predictive kernel of a process conditioned on data.

    ``k_cond(a, b) = k(a, b) - k(X, a)^T K^{-1} k(X, b)`` computed through two
    triangular solves against the training factorization (reference behavior:
    ``kernels/base.py:129-153``).
    """

    X: Array
    solver: Solver
    kernel: Kernel

    def evaluate(self, X1: Array, X2: Array) -> Array:
        k_vec = jax.vmap(self.kernel.evaluate, in_axes=(0, None))
        A1 = self.solver.solve_triangular(k_vec(self.X, X1))
        A2 = self.solver.solve_triangular(k_vec(self.X, X2))
        return self.kernel.evaluate(X1, X2) - pdot(A1.T, A2)

    def evaluate_diag(self, X: Array) -> Array:
        k_vec = jax.vmap(self.kernel.evaluate, in_axes=(0, None))
        A = self.solver.solve_triangular(k_vec(self.X, X))
        return self.kernel.evaluate_diag(X) - pdot(A.T, A)


class Custom(Kernel):
    """Wrap a plain callable with an ``evaluate``-like signature as a kernel."""

    function: Callable[[Any, Any], Any] = static_field()

    def evaluate(self, X1: Array, X2: Array) -> Array:
        return self.function(X1, X2)


class _Pair(Kernel):
    """Shared structure for binary kernel combinations.

    Field names are part of the public pytree/repr surface (users pattern-
    match ``kernel1``/``kernel2``), so they stay spelled out here.
    """

    kernel1: Kernel
    kernel2: Kernel

    def _both(self, method: str, *args: Array) -> tuple[Array, Array]:
        return (
            getattr(self.kernel1, method)(*args),
            getattr(self.kernel2, method)(*args),
        )


class Sum(_Pair):
    """The sum of two kernels."""

    def evaluate(self, X1: Array, X2: Array) -> Array:
        a, b = self._both("evaluate", X1, X2)
        return a + b

    def gram(self, X1: Array, X2: Array) -> Array:
        # Summing full matrices keeps each operand's batched fast path.
        a, b = self._both("gram", X1, X2)
        return a + b


class Product(_Pair):
    """The elementwise product of two kernels."""

    def evaluate(self, X1: Array, X2: Array) -> Array:
        a, b = self._both("evaluate", X1, X2)
        return a * b

    def gram(self, X1: Array, X2: Array) -> Array:
        a, b = self._both("gram", X1, X2)
        return a * b


class Constant(Kernel):
    r"""A constant kernel: :math:`k(x_i, x_j) = c`."""

    value: Array | float

    def evaluate(self, X1: Array, X2: Array) -> Array:
        del X1, X2
        if jnp.ndim(self.value):
            raise ValueError(
                "Constant kernels wrap a scalar; for array-valued amplitudes "
                "compose with transforms or a custom kernel"
            )
        return jnp.asarray(self.value)


class DotProduct(Kernel):
    r"""The dot-product kernel :math:`k(x_i, x_j) = x_i \cdot x_j`."""

    def evaluate(self, X1: Array, X2: Array) -> Array:
        # Covers scalars and vectors alike (a scalar "sum" is itself).
        return jnp.sum(X1 * X2)

    def gram(self, X1: Array, X2: Array) -> Array:
        # A single MXU matmul instead of N*M dot products.
        X1 = jnp.asarray(X1)
        X2 = jnp.asarray(X2)
        if X1.ndim == 1:
            return jnp.outer(X1, X2)
        return jnp.matmul(X1, X2.T, preferred_element_type=X1.dtype)


class Polynomial(Kernel):
    r"""A polynomial kernel.

    .. math::

        k(x_i, x_j) = [(x_i / \ell) \cdot (x_j / \ell) + \sigma^2]^P

    Args:
        order: The power :math:`P`.
        scale: The parameter :math:`\ell`.
        sigma: The parameter :math:`\sigma`.
    """

    order: Array | float
    scale: Array | float = field(default_factory=lambda: jnp.ones(()))
    sigma: Array | float = field(default_factory=lambda: jnp.zeros(()))

    def evaluate(self, X1: Array, X2: Array) -> Array:
        base = (
            jnp.sum((X1 / self.scale) * (X2 / self.scale))
            + jnp.square(self.sigma)
        )
        return base**self.order
