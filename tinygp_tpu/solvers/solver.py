"""The solver interface.

API parity: ``/root/reference/src/tinygp/solvers/solver.py:15-82``. A solver
owns the factorized covariance ``K = L @ L.T`` and exposes the primitives the
GP needs: the normalization constant, triangular solves/products, and
conditional covariances.
"""

from __future__ import annotations

__all__ = ["Solver"]

from typing import Any

import jax.numpy as jnp

from tinygp_tpu.helpers import Array
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.noise import Noise
from tinygp_tpu.utils.module import Module


class Solver(Module):
    def __init__(
        self,
        kernel: Kernel,
        X: Array,
        noise: Noise,
        *,
        covariance: Any | None = None,
    ):
        del kernel, X, noise, covariance
        raise NotImplementedError

    @classmethod
    def init(
        cls,
        kernel: Kernel,
        X: Array,
        noise: Noise,
        *,
        covariance: Any | None = None,
    ) -> Solver:
        """Backwards-compatible constructor alias."""
        return cls(kernel, X, noise, covariance=covariance)

    def variance(self) -> Array:
        """The diagonal of the covariance matrix."""
        raise NotImplementedError

    def covariance(self) -> Array:
        """The full covariance matrix (may be dense; use sparingly)."""
        raise NotImplementedError

    def normalization(self) -> Array:
        """``log|L| + (N/2) log(2 pi)`` for the factor ``L``."""
        raise NotImplementedError

    def solve_triangular(self, y: Array, *, transpose: bool = False) -> Array:
        """Solve ``L @ x = y`` (or ``L.T @ x = y`` when ``transpose``)."""
        raise NotImplementedError

    def log_likelihood(self, r: Array) -> Array:
        """The Gaussian log density of a centered residual ``r``.

        ``-0.5 r^T K^{-1} r - log|L| - (N/2) log(2 pi)``. The default
        whitens through :meth:`solve_triangular`; solvers with a fused
        factor-and-whiten path override this (the quasiseparable solver
        computes both terms in one stacked pass).
        """
        alpha = self.solve_triangular(r)
        return -0.5 * jnp.sum(jnp.square(alpha)) - self.normalization()

    def dot_triangular(self, y: Array) -> Array:
        """Compute ``L @ y``."""
        raise NotImplementedError

    def condition(
        self, kernel: Kernel, X_test: Array | None, noise: Noise
    ) -> Any:
        """The covariance of the process conditioned on the data."""
        raise NotImplementedError
