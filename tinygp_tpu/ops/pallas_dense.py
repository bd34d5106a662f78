"""Fused split-precision dense kernels for the TPU MXU (Pallas).

Why these exist: the XLA formulation of the three-term-split GEMMs in
:mod:`tinygp_tpu.ops.dense` materializes every partial product — four to
six full f32 outputs per Schur update — so the blocked Cholesky's trailing
updates run HBM-bandwidth-bound at a fraction of the MXU rate (measured:
61 ms at N=1e4/B=512, ~3x *slower* than XLA's native Cholesky). These
kernels fuse the whole split accumulation per output tile in VMEM:

- operands are loaded once per tile pair, decomposed into (hi, mid, lo)
  bf16 triples on the VPU,
- the 4-6 partial dots all run on the MXU's fast bf16 path with f32
  accumulators that never leave VMEM,
- the output (including the Schur subtraction) is written exactly once.

This is the role ``/root/reference/src/tinygp/solvers/direct.py:53``
delegates to XLA's cuSOLVER/LAPACK bindings; on TPU the fused form is the
hand-written part, and the factorization driver stays in
:func:`tinygp_tpu.ops.dense.blocked_cholesky`.

All kernels run in interpreter mode automatically off-TPU so the CPU test
suite exercises the same code path.
"""

from __future__ import annotations

__all__ = ["syrk_sub", "split_panel_matmul"]

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinygp_tpu.helpers import JAXArray


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _split3(x: JAXArray):
    """Three-term bf16 decomposition, x ~ h + m + l (VPU elementwise)."""
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _dot_nt(a: JAXArray, b: JAXArray) -> JAXArray:
    """``a @ b.T`` on the MXU with an f32 accumulator.

    Precision is pinned to DEFAULT: the operands are already bf16 by
    construction, and an ambient ``default_matmul_precision('highest')``
    (which the factorization driver sets for its *f32* solves) would ask
    Mosaic for an fp32-contraction of bf16 vectors, which it rejects.
    """
    return jax.lax.dot_general(
        a,
        b,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _syrk_sub_kernel(t_ref, li_ref, lj_ref, out_ref):
    hi, mi, li = _split3(li_ref[:])
    hj, mj, lj = _split3(lj_ref[:])
    # x y = h h' + (h m' + m h') + (h l' + l h' + m m') + O(2^-24)
    acc = _dot_nt(hi, hj)
    acc = acc + (_dot_nt(hi, mj) + _dot_nt(mi, hj))
    acc = acc + (_dot_nt(hi, lj) + (_dot_nt(li, hj) + _dot_nt(mi, mj)))
    out_ref[:] = t_ref[:] - acc


def syrk_sub(
    T: JAXArray,
    L: JAXArray,
    *,
    tile: int = 256,
    interpret: bool | None = None,
) -> JAXArray:
    """``T - L @ L.T`` fused, at f32-grade (~2^-24) operand accuracy.

    ``T`` is ``(m, m)`` f32, ``L`` is ``(m, b)`` f32 with ``m`` a multiple
    of ``tile``. One f32 output pass; everything else stays on-chip.
    """
    m, b = L.shape
    assert T.shape == (m, m) and m % tile == 0
    if interpret is None:
        interpret = not _on_tpu()
    n_t = m // tile
    return pl.pallas_call(
        _syrk_sub_kernel,
        grid=(n_t, n_t),
        in_specs=[
            pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
            pl.BlockSpec((tile, b), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, b), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * m * m * b,
            bytes_accessed=2 * 4 * m * m + 2 * 4 * m * b,
            transcendentals=0,
        ),
        interpret=interpret,
    )(T, L, L)


def _panel_kernel(a_ref, w_ref, out_ref):
    ah, am, al = _split3(a_ref[:])
    wh, wm, wl = _split3(w_ref[:])

    def dot(x, y):
        # precision pinned for the same reason as in _dot_nt.
        return jax.lax.dot_general(
            x,
            y,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    acc = dot(ah, wh)
    acc = acc + (dot(ah, wm) + dot(am, wh))
    acc = acc + (dot(ah, wl) + (dot(al, wh) + dot(am, wm)))
    out_ref[:] = acc


def split_panel_matmul(
    A: JAXArray,
    W: JAXArray,
    *,
    tile: int = 256,
    interpret: bool | None = None,
) -> JAXArray:
    """``A @ W`` fused three-term-split, for tall-skinny panels.

    ``A`` is ``(m, b)``, ``W`` is ``(b, b)`` (held in VMEM whole), ``m`` a
    multiple of ``tile``. Used for the Cholesky panel step ``A21 @
    inv(L11)^T`` where f32-grade accuracy is required but XLA's emulated
    f32 matmul wastes 6 full passes.
    """
    m, b = A.shape
    assert W.shape == (b, b) and m % tile == 0
    if interpret is None:
        interpret = not _on_tpu()
    return pl.pallas_call(
        _panel_kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, b), lambda i: (i, 0)),
            pl.BlockSpec((b, b), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, b), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * m * b * b,
            bytes_accessed=4 * (2 * m * b + b * b),
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, W)
