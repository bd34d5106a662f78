"""Blocked dense Cholesky tiled for the TPU MXU.

The reference's dense path factorizes with ``jax.scipy.linalg.cholesky``
(``/root/reference/src/tinygp/solvers/direct.py:53``), which XLA lowers to
its built-in blocked TPU Cholesky running trailing updates at the slow
true-f32 MXU rate (~30 TF/s on v5e, measured; the MXU's native mode is
bf16-multiply/f32-accumulate at ~175 TF/s). This module implements a
right-looking blocked Cholesky whose O(N^3) work — the SYRK trailing
updates and the panel triangular solves — runs as **split bf16x3 GEMMs**:
each f32 operand is decomposed as ``x = hi + lo`` with ``hi = bf16(x)``,
``lo = bf16(x - hi)``, and products expand to

    X Y^T ~= Xh Yh^T + Xh Yl^T + Xl Yh^T        (error ~ 2^-16 relative)

on the MXU's fast path with f32 accumulation. For the symmetric SYRK
update the two cross terms are transposes of each other, so it needs only
TWO GEMMs: ``Lh Lh^T + (S + S^T)`` with ``S = Lh Ll^T``. This recovers
near-f32 accuracy (~1e-6 relative, vs bf16's ~4e-3) at ~2/3 of the bf16
rate — the standard precision-splitting scheme for TPU linear algebra.

Diagonal B×B blocks use the native Cholesky (negligible: nb·B^3/3 flops),
and panels apply ``inv(L11)^T`` with another split GEMM so everything hot
stays on the MXU. Matrices are padded to a block multiple by embedding in
``blockdiag(K, I)``, whose factor is ``blockdiag(L, I)``.

**Status — not the DirectSolver default.** Measured on v5e at N=1e4: this
runs ~12 ms vs XLA's native 22 ms, BUT the x2 split's ~1.5e-5 operand
error makes trailing Schur complements indefinite (NaN) at the condition
numbers real GP covariances reach; the x3 splitting that would fix it
costs the same ~30 TF/s as XLA's accurate path. Use ``blocked_cholesky``
only for well-conditioned matrices (cond ≲ 1e3); ``split_matmul`` is safe
wherever ~1e-5 relative error is acceptable (e.g. wide predictive
cross-covariance products). See ``solvers/direct.py`` for the full
measurement story.
"""

from __future__ import annotations

__all__ = ["blocked_cholesky", "split_matmul"]

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import JAXArray

# Panel width: wide enough that the trailing GEMMs dominate, small enough
# that the serial diag-block/panel chain stays short. 1024 measured best on
# v5e at N ~ 1e4.
_BLOCK = 1024
# Below this size XLA's native Cholesky wins (fixed per-panel overheads).
_MIN_BLOCKED = 4096


def _split(x: JAXArray) -> tuple[JAXArray, JAXArray]:
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm(a: JAXArray, b: JAXArray, transpose_b: bool) -> JAXArray:
    dims = ((1,), (1,)) if transpose_b else ((1,), (0,))
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def split_matmul(
    X: JAXArray, Y: JAXArray, *, transpose_y: bool = False
) -> JAXArray:
    """``X @ Y`` (or ``X @ Y.T``) via bf16x3 splitting on the MXU.

    ~1e-6 relative error at ~3x the true-f32 MXU rate. Only defined for
    float32 operands; other dtypes fall through to a plain dot.
    """
    if X.dtype != jnp.float32 or Y.dtype != jnp.float32:
        return _mm(X, Y, transpose_y)
    Xh, Xl = _split(X)
    Yh, Yl = _split(Y)
    return _mm(Xh, Yh, transpose_y) + (
        _mm(Xh, Yl, transpose_y) + _mm(Xl, Yh, transpose_y)
    )


def _split_syrk(L: JAXArray) -> JAXArray:
    """``L @ L.T`` with the 2-GEMM split: the cross terms are mutual
    transposes."""
    if L.dtype != jnp.float32:
        return _mm(L, L, True)
    hi, lo = _split(L)
    S = _mm(hi, lo, True)
    return _mm(hi, hi, True) + (S + jnp.swapaxes(S, -1, -2))


def blocked_cholesky(K: JAXArray, *, block: int = _BLOCK) -> JAXArray:
    """Lower Cholesky factor of an SPD matrix, MXU-tiled.

    Equivalent to ``jnp.linalg.cholesky(K)`` up to the split-GEMM rounding
    (~1e-6 relative on the factor). Falls back to the native kernel for
    small matrices where panel overheads dominate.
    """
    n = K.shape[0]
    if n < _MIN_BLOCKED or K.dtype != jnp.float32:
        return jnp.linalg.cholesky(K)

    pad = (-n) % block
    if pad:
        # blockdiag(K, I): the factor is blockdiag(chol(K), I).
        K = jnp.block(
            [
                [K, jnp.zeros((n, pad), K.dtype)],
                [
                    jnp.zeros((pad, n), K.dtype),
                    jnp.eye(pad, dtype=K.dtype),
                ],
            ]
        )
    m = K.shape[0]
    nb = m // block
    eye = jnp.eye(block, dtype=K.dtype)

    T = K
    cols = []
    for k in range(nb):
        A11 = T[:block, :block]
        A21 = T[block:, :block]
        L11 = jnp.linalg.cholesky(A11)
        # Panel: L21 = A21 inv(L11)^T, as a GEMM against the explicit
        # triangular inverse (B^3/2 extra flops, all MXU).
        L11invT = jax.scipy.linalg.solve_triangular(L11, eye, lower=True).T
        L21 = split_matmul(A21, L11invT)
        cols.append(jnp.concatenate([L11, L21], axis=0))
        if T.shape[0] > block:
            T = T[block:, block:] - _split_syrk(L21)

    rows = []
    for k, col in enumerate(cols):
        zpad = jnp.zeros((m - col.shape[0], block), K.dtype)
        rows.append(jnp.concatenate([zpad, col], axis=0))
    L = jnp.concatenate(rows, axis=1)
    return L[:n, :n]
