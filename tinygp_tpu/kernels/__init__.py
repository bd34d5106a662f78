"""Kernel building blocks: compose sums/products of these, or subclass
:class:`Kernel` with a custom pointwise ``evaluate``."""

__all__ = [
    "quasisep",
    "Distance",
    "L1Distance",
    "L2Distance",
    "Kernel",
    "Conditioned",
    "Custom",
    "Sum",
    "Product",
    "Constant",
    "DotProduct",
    "Polynomial",
    "Stationary",
    "Exp",
    "ExpSquared",
    "Matern32",
    "Matern52",
    "Cosine",
    "ExpSineSquared",
    "RationalQuadratic",
]

from tinygp_tpu.kernels import quasisep
from tinygp_tpu.kernels.base import (
    Conditioned,
    Constant,
    Custom,
    DotProduct,
    Kernel,
    Polynomial,
    Product,
    Sum,
)
from tinygp_tpu.kernels.distance import Distance, L1Distance, L2Distance
from tinygp_tpu.kernels.stationary import (
    Cosine,
    Exp,
    ExpSineSquared,
    ExpSquared,
    Matern32,
    Matern52,
    RationalQuadratic,
    Stationary,
)
