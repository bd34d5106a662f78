"""Shared type aliases and small helpers.

Mirrors the public surface of the reference's ``src/tinygp/helpers.py:10-18``
(``JAXArray`` alias plus legacy ``dataclass``/``field`` shims) so downstream
code written against tinygp keeps working.
"""

from __future__ import annotations

__all__ = ["Array", "JAXArray", "dataclass", "field", "pdot"]

from typing import Any

import jax
import jax.numpy as jnp

from tinygp_tpu.utils.module import field as field

Array = jax.Array
"""The primary array annotation used throughout this package."""

JAXArray = Array
"""Compatibility alias matching the reference's public name."""


def pdot(x: Array, y: Array) -> Array:
    """Precision-pinned matmul for the solver hot paths.

    TPUs demote f32 matmul operands to bf16 by default (8 mantissa bits).
    The GP solvers' contractions are small (state dimension <= 8) but
    cancellation-heavy — log-likelihood gradients at N=5e3 came out with
    the wrong *sign* under the default precision — so every structural
    contraction goes through true-f32 accumulation. For these tiny shapes
    the cost is negligible (they are VPU-bound either way).
    """
    if hasattr(x, "blocks") or hasattr(y, "blocks"):
        # Lazy block-diagonal operands own their matmul; their per-block
        # products are precision-pinned inside Block.
        return x @ y
    return jnp.matmul(x, y, precision=jax.lax.Precision.HIGHEST)


def dataclass(cls: type[Any]) -> type[Any]:
    # Backwards-compatibility shim: Module subclasses are already dataclasses.
    return cls
