"""Dense linear-algebra kernels tiled for the TPU MXU.

``dense`` drives the blocked split-precision Cholesky;
``pallas_dense`` holds the fused Pallas kernels underneath it;
``pallas_gram`` is the tiled kernel-matrix builder. Measured analyses
live in ``docs/rooflines.md``.
"""

from tinygp_tpu.ops.dense import (
    blocked_cholesky,
    cholesky_with_fallback,
    split_matmul,
    split_syrk,
)

__all__ = [
    "blocked_cholesky",
    "cholesky_with_fallback",
    "split_matmul",
    "split_syrk",
]
