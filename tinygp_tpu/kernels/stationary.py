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

from tinygp_tpu.helpers import JAXArray
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.kernels.distance import Distance, L1Distance, L2Distance
from tinygp_tpu.utils.module import field


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

    scale: JAXArray | float = field(default_factory=lambda: jnp.ones(()))
    distance: Distance = field(default_factory=L1Distance)

    # Construction note (measured on v5e, N=1e4, Matern32): the default
    # nested-vmap gram fuses into a single elementwise pass that runs at
    # the HBM write roofline (~0.48 ms), i.e. ~2% of the blocked-Cholesky
    # log-lik pipeline. The explicit Pallas tiled builder
    # (tinygp_tpu.ops.pallas_gram.gram_tiled, 0.71 ms) is available for
    # fused-consumer experiments but buys nothing for a materialized K, so
    # it is not the default.

    def _r(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        if jnp.ndim(self.scale):
            raise ValueError(
                "Only scalar scales are permitted for stationary kernels; "
                "use transforms.Linear or transforms.Cholesky for more "
                "flexibility"
            )
        return self.distance.distance(X1, X2) / self.scale

    def _r2(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        if jnp.ndim(self.scale):
            raise ValueError(
                "Only scalar scales are permitted for stationary kernels; "
                "use transforms.Linear or transforms.Cholesky for more "
                "flexibility"
            )
        return self.distance.squared_distance(X1, X2) / jnp.square(self.scale)


class Exp(Stationary):
    r""":math:`k(r) = \exp(-r)` with :math:`r` the (scaled) L1 distance."""

    def evaluate(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        return jnp.exp(-self._r(X1, X2))


class ExpSquared(Stationary):
    r""":math:`k(r) = \exp(-r^2/2)` (RBF); L2 distance by default."""

    distance: Distance = field(default_factory=L2Distance)

    def evaluate(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        return jnp.exp(-0.5 * self._r2(X1, X2))


class Matern32(Stationary):
    r""":math:`k(r) = (1+\sqrt{3}r)\exp(-\sqrt{3}r)`."""

    def evaluate(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        arg = np.sqrt(3.0) * self._r(X1, X2)
        return (1.0 + arg) * jnp.exp(-arg)


class Matern52(Stationary):
    r""":math:`k(r) = (1+\sqrt{5}r+5r^2/3)\exp(-\sqrt{5}r)`."""

    def evaluate(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        arg = np.sqrt(5.0) * self._r(X1, X2)
        return (1.0 + arg + jnp.square(arg) / 3.0) * jnp.exp(-arg)


class Cosine(Stationary):
    r""":math:`k(r) = \cos(2\pi r)` with period ``scale``."""

    def evaluate(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        return jnp.cos(2.0 * jnp.pi * self._r(X1, X2))


class ExpSineSquared(Stationary):
    r"""The quasiperiodic kernel :math:`k(r) = \exp(-\Gamma \sin^2 \pi r)`.

    Args:
        scale: The period :math:`P`.
        gamma: The required parameter :math:`\Gamma`.
    """

    gamma: JAXArray | float | None = None

    def __post_init__(self) -> None:
        if self.gamma is None:
            raise ValueError("Missing required argument 'gamma'")

    def evaluate(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        assert self.gamma is not None
        r = self._r(X1, X2)
        return jnp.exp(-self.gamma * jnp.square(jnp.sin(jnp.pi * r)))


class RationalQuadratic(Stationary):
    r""":math:`k(r) = (1 + r^2/2\alpha)^{-\alpha}`.

    Args:
        scale: The length scale :math:`\ell`.
        alpha: The required parameter :math:`\alpha`.
    """

    alpha: JAXArray | float | None = None

    def __post_init__(self) -> None:
        if self.alpha is None:
            raise ValueError("Missing required argument 'alpha'")

    def evaluate(self, X1: JAXArray, X2: JAXArray) -> JAXArray:
        assert self.alpha is not None
        r2 = self._r2(X1, X2)
        return (1.0 + 0.5 * r2 / self.alpha) ** -self.alpha
