"""Dense linear-algebra kernels tiled for the TPU MXU."""

from tinygp_tpu.ops.dense import blocked_cholesky, split_matmul

__all__ = ["blocked_cholesky", "split_matmul"]
