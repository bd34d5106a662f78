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

__all__ = [
    "syrk_sub",
    "syrk_sub_inplace",
    "split_panel_matmul",
]

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinygp_tpu.helpers import Array


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _split3(x: Array):
    """Three-term bf16 decomposition, x ~ h + m + l (VPU elementwise)."""
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _dot_nt(a: Array, b: Array) -> Array:
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


def _split2(x: Array):
    """Two-term bf16 decomposition, x ~ h + l (~2^-16 residual)."""
    h = x.astype(jnp.bfloat16)
    l = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, l


def _split_dots(xi, xj, terms: int, dot):
    """Sum of split-product dots approximating ``xi @ xj'`` (' per dot)."""
    if terms == 2:
        hi, li = _split2(xi)
        hj, lj = _split2(xj)
        # x y = h h' + (h l' + l h') + O(2^-16)
        return dot(hi, hj) + (dot(hi, lj) + dot(li, hj))
    hi, mi, li = _split3(xi)
    hj, mj, lj = _split3(xj)
    # x y = h h' + (h m' + m h') + (h l' + l h' + m m') + O(2^-24)
    acc = dot(hi, hj)
    acc = acc + (dot(hi, mj) + dot(mi, hj))
    return acc + (dot(hi, lj) + (dot(li, hj) + dot(mi, mj)))


def _make_syrk_kernel(terms: int, lower_only: bool):
    def kernel(t_ref, li_ref, lj_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(jnp.logical_not(lower_only) | (j <= i))
        def _():
            acc = _split_dots(li_ref[:], lj_ref[:], terms, _dot_nt)
            out_ref[:] = t_ref[:] - acc

        if lower_only:

            @pl.when(j > i)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

    return kernel


def syrk_sub(
    T: Array,
    L: Array,
    *,
    tile: int = 256,
    terms: int = 3,
    lower_only: bool = False,
    interpret: bool | None = None,
) -> Array:
    """``T - L @ L.T`` fused, with split-bf16 MXU accumulation.

    ``T`` is ``(m, m)`` f32, ``L`` is ``(m, b)`` f32 with ``m`` a multiple
    of ``tile``. One f32 output pass; everything else stays on-chip.

    Args:
        terms: 3 (default) for the f32-grade ~2^-24 operand error (six
            dots/tile), or 2 for ~2^-16 at half the MXU work (three dots).
        lower_only: Skip the dots for above-diagonal tiles and write zeros
            there instead — the Cholesky driver only ever reads the lower
            triangle of a Schur complement, so this halves the flops.
    """
    m, b = L.shape
    assert T.shape == (m, m) and m % tile == 0
    if interpret is None:
        interpret = not _on_tpu()
    n_t = m // tile
    flops_scale = {2: 3, 3: 6}[terms] * (0.5 if lower_only else 1.0)
    return pl.pallas_call(
        _make_syrk_kernel(terms, lower_only),
        grid=(n_t, n_t),
        in_specs=[
            pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
            pl.BlockSpec((tile, b), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, b), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops_scale * 2 * m * m * b),
            bytes_accessed=2 * 4 * m * m + 2 * 4 * m * b,
            transcendentals=0,
        ),
        interpret=interpret,
    )(T, L, L)


def _make_syrk_inplace_kernel(terms: int, extras: bool, off_t: int):
    if not extras:
        def kernel(im_ref, jm_ref, t_ref, li_ref, lj_ref, out_ref):
            del im_ref, jm_ref  # consumed by the index maps
            acc = _split_dots(li_ref[:], lj_ref[:], terms, _dot_nt)
            out_ref[:] = t_ref[:] - acc

        return kernel

    def kernel(
        im_ref, jm_ref, t_ref, li_ref, lj_ref, ak_ref,
        out_ref, rsq_ref, rsu_ref,
    ):
        del im_ref
        acc = _split_dots(li_ref[:], lj_ref[:], terms, _dot_nt)
        out_ref[:] = t_ref[:] - acc

        g = pl.program_id(0)

        # Row-tile side products, computed once per row on its first
        # visit (j == off_t in the row-major lower-tile order) while li
        # is already resident in VMEM: the factor row sums of squares
        # (diagonal-reconstruction guard) and the whitening GEMV
        # li @ ak (the running-residual update) — both otherwise cost a
        # full extra pass over L21 in HBM.
        @pl.when(jm_ref[g] == off_t)
        def _():
            li = li_ref[:]
            tile = li.shape[0]
            # Row vectors land as (8, tile//8) blocks: Mosaic requires
            # the block's trailing dims be (8k, 128k) or full-array.
            rsq_ref[:] = jnp.sum(li * li, axis=1).reshape(8, tile // 8)
            rsu = jax.lax.dot_general(
                li, ak_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rsu_ref[:] = rsu.reshape(8, tile // 8)

    return kernel


def syrk_sub_inplace(
    T: Array,
    L: Array,
    *,
    offset: int,
    tile: int = 256,
    terms: int = 3,
    interpret: bool | None = None,
    ak: Array | None = None,
):
    """In-place ``T[offset:, offset:] -= L @ L.T``, lower tiles only.

    The output buffer aliases ``T`` (which is consumed), the grid
    enumerates exactly the at-or-below-diagonal tiles of the trailing
    submatrix through scalar-prefetched index maps, and each visited tile
    is read, updated and written once — so a full right-looking Cholesky
    pass moves only ``O(N^3/(3 tile))`` reads and writes each updated
    element exactly once, with no shrinking-slice copies in between.
    Unvisited tiles (everything above the diagonal, and the already-
    factored leading rows) keep their previous contents.

    With ``ak`` (the panel's whitened residual, shape ``(b,)``), returns
    ``(T, rowsq, rsu)`` where ``rowsq[r] = sum(L[r]**2)`` and
    ``rsu = L @ ak`` — both computed inside the kernel from the li block
    already resident in VMEM, saving the factorization's two extra
    O(N^2) passes over the panel per step.
    """
    m = T.shape[0]
    mt_m, b = L.shape
    assert offset % tile == 0 and m % tile == 0 and mt_m == m - offset
    if interpret is None:
        interpret = not _on_tpu()
    off_t = offset // tile
    mt = (m - offset) // tile
    pairs = [(i, j) for i in range(mt) for j in range(i + 1)]
    i_map = jnp.asarray([i + off_t for i, _ in pairs], jnp.int32)
    j_map = jnp.asarray([j + off_t for _, j in pairs], jnp.int32)

    extras = ak is not None
    in_specs = [
        pl.BlockSpec((tile, tile), lambda g, im, jm: (im[g], jm[g])),
        pl.BlockSpec(
            (tile, b), lambda g, im, jm, o=off_t: (im[g] - o, 0)
        ),
        pl.BlockSpec(
            (tile, b), lambda g, im, jm, o=off_t: (jm[g] - o, 0)
        ),
    ]
    out_specs = pl.BlockSpec(
        (tile, tile), lambda g, im, jm: (im[g], jm[g])
    )
    out_shape = jax.ShapeDtypeStruct((m, m), jnp.float32)
    operands = [i_map, j_map, T, L, L]
    if extras:
        in_specs.append(pl.BlockSpec((1, b), lambda g, im, jm: (0, 0)))
        row_spec = pl.BlockSpec(
            (8, tile // 8), lambda g, im, jm, o=off_t: (im[g] - o, 0)
        )
        out_specs = [out_specs, row_spec, row_spec]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((mt * 8, tile // 8), jnp.float32),
            jax.ShapeDtypeStruct((mt * 8, tile // 8), jnp.float32),
        ]
        operands.append(ak.reshape(1, b))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        _make_syrk_inplace_kernel(terms, extras, off_t),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # Operand numbering includes the two scalar-prefetch arrays.
        input_output_aliases={2: 0},
        cost_estimate=pl.CostEstimate(
            flops={2: 3, 3: 6}[terms] * len(pairs) * 2 * tile * tile * b,
            bytes_accessed=2 * 4 * len(pairs) * tile * tile,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    if not extras:
        return out
    Tn, rsq, rsu = out
    return Tn, rsq.reshape(mt_m), rsu.reshape(mt_m)


def _dot_nn(x: Array, y: Array) -> Array:
    # precision pinned for the same reason as in _dot_nt.
    return jax.lax.dot_general(
        x,
        y,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dot_f32(x: Array, y: Array, *, transpose_y: bool = False) -> Array:
    """Accurate-f32 matmul for the small in-kernel factorization steps."""
    dims = ((1,), (1,)) if transpose_y else ((1,), (0,))
    return jax.lax.dot_general(
        x,
        y,
        (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _make_panel_kernel(terms: int):
    def kernel(a_ref, w_ref, out_ref):
        out_ref[:] = _split_dots(a_ref[:], w_ref[:], terms, _dot_nn)

    return kernel


def split_panel_matmul(
    A: Array,
    W: Array,
    *,
    tile: int = 256,
    terms: int = 3,
    interpret: bool | None = None,
    at: tuple[int, int] | None = None,
    rows: int | None = None,
) -> Array:
    """``A[at[0]:at[0]+rows, at[1]:at[1]+b] @ W`` fused split-bf16.

    ``W`` is ``(b, b)`` (held in VMEM whole). With ``at=None`` the whole
    of ``A`` (shape ``(rows, b)``) is the panel; with ``at=(r0, c0)`` the
    panel is read directly out of the larger matrix ``A`` through the
    block index map — no sliced copy ever materializes. Used for the
    Cholesky panel step ``A21 @ inv(L11)^T`` where near-f32 accuracy is
    required but XLA's emulated f32 matmul wastes 6 full passes.
    """
    b = W.shape[0]
    if at is None:
        at = (0, 0)
        rows = A.shape[0]
    assert rows is not None and rows % tile == 0
    r0, c0 = at
    assert r0 % tile == 0 and c0 % b == 0
    rt, ct = r0 // tile, c0 // b
    if interpret is None:
        interpret = not _on_tpu()
    return pl.pallas_call(
        _make_panel_kernel(terms),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, b), lambda i: (i + rt, ct)),
            pl.BlockSpec((b, b), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, b), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops={2: 3, 3: 6}[terms] * 2 * rows * b * b,
            bytes_accessed=4 * (2 * rows * b + b * b),
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, W)
