"""Stationary kernels defined through a distance metric.

API parity: ``/root/reference/src/tinygp/kernels/stationary.py:38-235``
(``Stationary`` base with a scalar ``scale`` and pluggable ``distance``;
Exp/ExpSquared/Matern32/Matern52/Cosine/ExpSineSquared/RationalQuadratic).

Each kernel is written in terms of the scalar distance ``r``; batching is
handled by the base :class:`~tinygp_tpu.kernels.base.Kernel` machinery, and
XLA fuses the elementwise math into the matrix construction loop on the VPU.
"""

from __future__ import annotations

__all__ = [
    "Stationary",
    "Exp",
    "ExpSquared",
    "Matern32",
    "Matern52",
    "Cosine",
    "ExpSineSquared",
    "RationalQuadratic",
]

import jax.numpy as jnp
import numpy as np

from tinygp_tpu.helpers import Array
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.kernels.distance import Distance, L1Distance, L2Distance
from tinygp_tpu.utils.module import field


def _require(value, kernel: str, name: str):
    """Fail construction loudly when a no-default parameter was omitted."""
    if value is None:
        raise ValueError(f"{kernel} needs its required `{name}` parameter")
    return value


class Stationary(Kernel):
    """Base class for isotropic stationary kernels.

    Args:
        scale: A *scalar* length scale in the units of ``distance``. For
            anisotropic length scales wrap the kernel in
            :class:`tinygp_tpu.transforms.Linear` or
            :class:`tinygp_tpu.transforms.Cholesky`.
        distance: The distance metric; defaults to L1 (L2 for
            :class:`ExpSquared` and :class:`RationalQuadratic`).
    """

    scale: Array | float = field(default_factory=lambda: jnp.ones(()))
    distance: Distance = field(default_factory=L1Distance)

    # Construction note (measured on v5e, N=1e4, Matern32): the default
    # nested-vmap gram fuses into a single elementwise pass that runs at
    # the HBM write roofline (~0.48 ms), i.e. ~2% of the blocked-Cholesky
    # log-lik pipeline. The explicit Pallas tiled builder
    # (tinygp_tpu.ops.pallas_gram.gram_tiled, 0.71 ms) is available for
    # fused-consumer experiments but buys nothing for a materialized K, so
    # it is not the default.

    def profile(self, r: Array) -> Array:
        """The radial profile ``k(r)``; most subclasses implement only this.

        Kernels that are cheaper (or gradient-safer) in the *squared*
        distance override :meth:`evaluate` directly instead.
        """
        raise NotImplementedError

    def evaluate(self, X1: Array, X2: Array) -> Array:
        return self.profile(self._r(X1, X2))

    def _check_scale(self) -> None:
        if jnp.ndim(self.scale):
            raise ValueError(
                "stationary kernels take a single scalar length scale; "
                "per-dimension scales are spelled as input transforms "
                "(transforms.Linear / transforms.Cholesky)"
            )

    def _r(self, X1: Array, X2: Array) -> Array:
        self._check_scale()
        return self.distance.distance(X1, X2) / self.scale

    def _r2(self, X1: Array, X2: Array) -> Array:
        self._check_scale()
        return self.distance.squared_distance(X1, X2) / jnp.square(self.scale)


class Exp(Stationary):
    r""":math:`k(r) = \exp(-r)` with :math:`r` the (scaled) L1 distance."""

    def profile(self, r: Array) -> Array:
        return jnp.exp(-r)


class ExpSquared(Stationary):
    r""":math:`k(r) = \exp(-r^2/2)` (RBF); L2 distance by default."""

    distance: Distance = field(default_factory=L2Distance)

    def evaluate(self, X1: Array, X2: Array) -> Array:
        return jnp.exp(-0.5 * self._r2(X1, X2))


class Matern32(Stationary):
    r""":math:`k(r) = (1+\sqrt{3}r)\exp(-\sqrt{3}r)`."""

    def profile(self, r: Array) -> Array:
        arg = np.sqrt(3.0) * r
        return (1.0 + arg) * jnp.exp(-arg)


class Matern52(Stationary):
    r""":math:`k(r) = (1+\sqrt{5}r+5r^2/3)\exp(-\sqrt{5}r)`."""

    def profile(self, r: Array) -> Array:
        arg = np.sqrt(5.0) * r
        return (1.0 + arg + jnp.square(arg) / 3.0) * jnp.exp(-arg)


class Cosine(Stationary):
    r""":math:`k(r) = \cos(2\pi r)` with period ``scale``."""

    def profile(self, r: Array) -> Array:
        return jnp.cos(2.0 * jnp.pi * r)


class ExpSineSquared(Stationary):
    r"""The quasiperiodic kernel :math:`k(r) = \exp(-\Gamma \sin^2 \pi r)`.

    Args:
        scale: The period :math:`P`.
        gamma: The required parameter :math:`\Gamma`.
    """

    gamma: Array | float | None = None

    def __post_init__(self) -> None:
        _require(self.gamma, "ExpSineSquared", "gamma")

    def profile(self, r: Array) -> Array:
        s = jnp.sin(jnp.pi * r)
        return jnp.exp(-self.gamma * s * s)


class RationalQuadratic(Stationary):
    r""":math:`k(r) = (1 + r^2/2\alpha)^{-\alpha}`.

    Args:
        scale: The length scale :math:`\ell`.
        alpha: The required parameter :math:`\alpha`.
    """

    alpha: Array | float | None = None

    def __post_init__(self) -> None:
        _require(self.alpha, "RationalQuadratic", "alpha")

    def evaluate(self, X1: Array, X2: Array) -> Array:
        a = self.alpha
        return jnp.power(1.0 + self._r2(X1, X2) / (2.0 * a), -a)
