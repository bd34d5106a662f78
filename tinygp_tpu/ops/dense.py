"""Blocked dense Cholesky tiled for the TPU MXU.

The reference's dense path factorizes with ``jax.scipy.linalg.cholesky``
(``/root/reference/src/tinygp/solvers/direct.py:53``), which XLA lowers to
its built-in blocked TPU Cholesky running trailing updates at the slow
true-f32 MXU rate (~30 TF/s on v5e, measured; the MXU's native mode is
bf16-multiply/f32-accumulate at ~175 TF/s). This module drives a
right-looking blocked factorization whose O(N^3) bulk — the SYRK trailing
updates — runs through the fused Pallas kernels in
:mod:`tinygp_tpu.ops.pallas_dense` as **split-bf16 GEMMs** on the fast
MXU path, updating the trailing matrix in place and touching only its
lower-triangle tiles.

Split scheme: an f32 operand decomposes into bf16 pieces

    x = h + m + l,   h = bf16(x),  m = bf16(x - h),  l = bf16(x - h - m)

with |m| <~ 2^-8 |x| and |l| <~ 2^-16 |x| (bf16 keeps 8 significand
bits). The 3-term product expansion (six dots, with the symmetric update
needing only the lower tiles) carries ~2^-24 operand error — native-f32
grade; the 2-term expansion (three dots) carries ~2^-16, which measures
*as accurate as the native f32 kernel* on jittered GP benchmark matrices
but breaks down at sqrt(eps)-jitter conditioning. The split order is
therefore chosen at runtime from a caller-supplied eigenvalue floor when
available (:func:`cholesky_with_fallback`), e.g. the GP noise floor.

Measured at N=1e4 f32 on v5e (BENCH_DETAILS.json / benchmarks/):
native XLA Cholesky 21.2 ms; this factorization 23.1 ms (3-term) /
16.6 ms (2-term); the fused-kernel redesign took the split approach from
a 61 ms bandwidth-bound XLA formulation (every partial GEMM materialized)
to MXU-flop-bound.

The serial panel work per block column (a B x B diagonal Cholesky and the
triangular panel solve, together O(N^2 B) flops) runs under a pinned
``default_matmul_precision("highest")`` scope — the backend otherwise
demotes those internal f32 matmuls to bf16 operands, whose panel error
pushed trailing Schur complements indefinite.

Robustness measures:

- the matrix is symmetrically pre-scaled to unit diagonal before
  factoring (``D^-1/2 K D^-1/2``), which removes dynamic-range-driven
  cancellation; the factor is rescaled on the way out;
- breakdown reads as NaNs on the factor diagonal, exactly like the native
  kernel; :func:`cholesky_with_fallback` re-factors natively in that
  event (one ``lax.cond``);
- gradients never differentiate the factorization internals: a custom VJP
  implements the standard Cholesky reverse rule (verified bit-equal to
  XLA's own) with two native triangular solves.

Matrices are padded to a block multiple by embedding in
``blockdiag(K, I)``, whose factor is ``blockdiag(chol(K), I)``.
"""

from __future__ import annotations

__all__ = [
    "blocked_cholesky",
    "blocked_loglik_terms",
    "cholesky_with_fallback",
    "kernel_loglik_terms",
    "split_matmul",
    "split_syrk",
]

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tinygp_tpu.helpers import Array
from tinygp_tpu.ops import pallas_dense

# Panel width. The trailing SYRK fraction of the flops is ~(1 - 3B/2N), so
# small B keeps the fast path dominant, while per-column fixed costs (the
# diagonal Cholesky + panel TRSM) push the other way. 512 measured best on
# v5e for N ~ 1e4.
_BLOCK = 512
# Below this size XLA's native Cholesky wins (fixed per-panel overheads).
_MIN_BLOCKED = 4096
# Split order for the fused GEMMs: 3 = f32-grade (~2^-24 operand error),
# 2 = ~2^-16 at half the MXU work. On well-conditioned matrices (e.g. the
# N=1e4 Matern benchmark with diag=0.1) the 2-term factor is as accurate
# as the native f32 kernel at ~2/3 the time, but it breaks down at the
# sqrt(eps)-jitter conditioning real GP fits reach — so 3 (which holds up
# wherever native f32 does) is the default and 2 is opt-in.
_TERMS = 3


def _split3(x: Array) -> tuple[Array, Array, Array]:
    """Three-term bf16 decomposition of an f32 array, x ~ h + m + l."""
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _mm(a: Array, b: Array, transpose_b: bool) -> Array:
    dims = ((1,), (1,)) if transpose_b else ((1,), (0,))
    return lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


def split_matmul(
    X: Array, Y: Array, *, transpose_y: bool = False
) -> Array:
    """``X @ Y`` (or ``X @ Y.T``) via three-term bf16 splitting on the MXU.

    Six fast-path GEMMs; ~6e-8 relative operand error (f32-grade). Only
    defined for float32 operands; other dtypes fall through to a plain dot.
    """
    if X.dtype != jnp.float32 or Y.dtype != jnp.float32:
        return _mm(X, Y, transpose_y)
    Xh, Xm, Xl = _split3(X)
    Yh, Ym, Yl = _split3(Y)
    return (
        _mm(Xh, Yh, transpose_y)
        + (_mm(Xh, Ym, transpose_y) + _mm(Xm, Yh, transpose_y))
        + (
            _mm(Xh, Yl, transpose_y)
            + _mm(Xl, Yh, transpose_y)
            + _mm(Xm, Ym, transpose_y)
        )
    )


def split_syrk(L: Array) -> Array:
    """``L @ L.T`` with the 4-GEMM three-term split.

    Cross terms of matching order are mutual transposes, so the expansion
    h h' + (h m' + .T) + (h l' + .T + m m') needs four MXU passes for
    f32-grade (~6e-8) accuracy — vs six for a general product.
    """
    if L.dtype != jnp.float32:
        return _mm(L, L, True)
    h, m, l = _split3(L)
    S1 = _mm(h, m, True)
    S2 = _mm(h, l, True)
    out = _mm(h, h, True) + (S1 + jnp.swapaxes(S1, -1, -2))
    return out + (S2 + jnp.swapaxes(S2, -1, -2) + _mm(m, m, True))


def _scaled(K: Array) -> tuple[Array, Array]:
    d = jnp.diagonal(K)
    s = jnp.where(d > 0, lax.rsqrt(jnp.maximum(d, jnp.finfo(K.dtype).tiny)), 1.0)
    return K * s[:, None] * s[None, :], s


def blocked_cholesky(
    K: Array,
    *,
    block: int = _BLOCK,
    min_size: int = _MIN_BLOCKED,
    terms: int = _TERMS,
) -> Array:
    """Lower Cholesky factor of an SPD matrix, MXU-tiled.

    Equivalent to ``jnp.linalg.cholesky(K)`` up to f32-grade rounding in
    the split trailing updates. Falls back to the native kernel for small
    matrices (below ``min_size``) where panel overheads dominate. On
    breakdown (matrix not numerically PD at ~f32 precision) the factor
    contains NaNs, exactly like the native kernel; see
    :func:`cholesky_with_fallback`.
    """
    n = K.shape[0]
    if n < max(min_size, block) or K.dtype != jnp.float32:
        return jnp.linalg.cholesky(K)
    return _blocked_chol(K, block, terms)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _blocked_chol(K: Array, block: int, terms: int) -> Array:
    with jax.default_matmul_precision("highest"):
        return _blocked_cholesky_impl(K, block, terms)


def _blocked_chol_fwd(K, block, terms):
    L = _blocked_chol(K, block, terms)
    return L, L


def _blocked_chol_bwd(block, terms, L, Lbar):
    # The standard Cholesky reverse rule (bit-matched against JAX's native
    # VJP in tests): with X = L^T Lbar and P = tril(X) - diag(X)/2,
    # Kbar = sym(L^{-T} P L^{-1}). The factorization internals (Pallas
    # kernels included) never appear on the AD tape — only two native
    # triangular solves and one pinned GEMM.
    with jax.default_matmul_precision("highest"):
        X = jnp.matmul(L.T, Lbar)
        P = jnp.tril(X) - 0.5 * jnp.diag(jnp.diagonal(X))
        S = jax.scipy.linalg.solve_triangular(L, P, lower=True, trans=1)
        S = jax.scipy.linalg.solve_triangular(L, S.T, lower=True, trans=1).T
        return (0.5 * (S + S.T),)


_blocked_chol.defvjp(_blocked_chol_fwd, _blocked_chol_bwd)


def _blocked_cholesky_impl(K: Array, block: int, terms: int) -> Array:
    # The highest-precision context matters on TPU: the *internal* matmuls
    # of the diagonal-tile Cholesky and the triangular solve otherwise run
    # with bf16-demoted operands (the backend default), which is enough
    # error in the panels to push later Schur complements indefinite. The
    # explicitly-split GEMMs are unaffected (their operands are already
    # bf16 with pinned f32 accumulation).
    n = K.shape[0]
    K, s = _scaled(K)

    pad = (-n) % block
    if pad:
        # blockdiag(K, I): the factor is blockdiag(chol(K), I).
        K = jnp.block(
            [
                [K, jnp.zeros((n, pad), K.dtype)],
                [jnp.zeros((pad, n), K.dtype), jnp.eye(pad, dtype=K.dtype)],
            ]
        )
    m = K.shape[0]
    nb = m // block
    # The fused Pallas kernels tile at 256 when the panel width allows.
    tile = 256 if block % 256 == 0 else block

    # T is the working matrix, full size throughout: the fused trailing
    # update aliases its buffer and touches only the trailing lower tiles,
    # so no shrinking-slice copies ever happen. Only the lower triangle of
    # T is kept valid. Factor panels collect in a list and assemble with
    # ONE concatenate at the end — a dynamic_update_slice chain into a
    # full-size L is NOT done in place by XLA here and costs a full-matrix
    # copy per panel (measured: ~15 ms at N=1e4).
    eye = jnp.eye(block, dtype=K.dtype)
    T = K
    cols = []
    for k in range(nb):
        lo = k * block
        A11 = lax.dynamic_slice(T, (lo, lo), (block, block))
        # symmetrize_input=False: beyond the first panel, T only carries a
        # valid lower triangle (the fused SYRK skips the mirror tiles), and
        # the factorization never needs more. (A fused Pallas
        # chol-plus-inverse for this step was tried and measured ~1.3 ms
        # SLOWER over the whole factorization than this native pair —
        # docs/rooflines.md §1, negative results.)
        L11 = lax.linalg.cholesky(A11, symmetrize_input=False)
        if k + 1 < nb:
            L11invT = jax.scipy.linalg.solve_triangular(
                L11, eye, lower=True
            ).T
            hi = lo + block
            # Panel: L21 = A21 inv(L11)^T as a fused split GEMM, with A21
            # read straight out of T through the block maps — no sliced
            # copies materialize. Panel accuracy feeds every later Schur
            # complement, so it uses the same split order as the trailing
            # updates.
            L21 = pallas_dense.split_panel_matmul(
                T, L11invT, tile=tile, terms=terms, at=(hi, lo),
                rows=m - hi,
            )
            T = pallas_dense.syrk_sub_inplace(
                T, L21, offset=hi, tile=tile, terms=terms
            )
            body = jnp.concatenate([L11, L21], axis=0)
        else:
            body = L11
        zpad = jnp.zeros((lo, block), K.dtype)
        cols.append(jnp.concatenate([zpad, body], axis=0))

    L = jnp.concatenate(cols, axis=1)[:n, :n]
    return L * (1.0 / s)[:, None]


# Relative eigenvalue floor above which the 2-term split is numerically
# safe: its accumulated Schur error sits around 2^-16 x O(10), well below
# this, while sqrt(eps)-jitter matrices (floor ~3e-4) need the 3-term path.
_FAST_FLOOR = 1e-2

# Max relative error allowed on diag(L L^T) vs diag(K) before the factor is
# declared silently inaccurate and re-done natively. Healthy split factors
# sit ~1e-4 (2-term) / ~1e-6 (3-term) at N=1e4; a breakdown-adjacent factor
# is O(1) wrong. Order-of-magnitude headroom on both sides.
_DIAG_RESID_TOL = 3e-3


def cholesky_with_fallback(
    K: Array,
    *,
    block: int = _BLOCK,
    min_size: int = _MIN_BLOCKED,
    terms: int | None = None,
    rel_floor: Array | None = None,
) -> Array:
    """Blocked split-precision Cholesky, re-factoring natively on breakdown.

    When ``rel_floor`` — a lower bound on ``lambda_min`` of the
    unit-diagonal-scaled matrix, e.g. ``min(noise_diag / total_diag)`` for
    a GP covariance — is provided and ``terms`` is not forced, the split
    order is chosen at runtime: well-conditioned matrices take the 2-term
    path (~2/3 the time), borderline ones the f32-grade 3-term path.

    The factor-quality guard is two-fold. Outright breakdown reads as NaNs
    on the factor diagonal (like the native kernel). Silent accuracy loss —
    a near-indefinite-but-finite factor — is caught by the diagonal
    reconstruction identity: exact Cholesky satisfies
    ``sum_j L[i, j]^2 == K[i, i]`` row by row, and every trailing-update
    (SYRK) rounding error lands additively in exactly that identity, so a
    large relative diagonal residual *is* a large factor error. Either
    trigger pays one accurate native re-factorization rather than surface
    a spurious failure. Both guards together cost O(N^2) reductions.
    """
    n = K.shape[0]
    if n < max(min_size, block) or K.dtype != jnp.float32:
        return jnp.linalg.cholesky(K)
    if terms is None and rel_floor is not None:
        L = lax.cond(
            rel_floor > _FAST_FLOOR,
            lambda K: blocked_cholesky(
                K, block=block, min_size=min_size, terms=2
            ),
            lambda K: blocked_cholesky(
                K, block=block, min_size=min_size, terms=3
            ),
            K,
        )
    else:
        L = blocked_cholesky(
            K,
            block=block,
            min_size=min_size,
            terms=_TERMS if terms is None else terms,
        )
    # Guard 1: NaN on the factor diagonal (outright breakdown).
    dL = jnp.diagonal(L)
    bad = jnp.any(jnp.isnan(dL)) | jnp.any(dL <= 0)
    # Guard 2: diagonal reconstruction residual. diag(L L^T) = K's diagonal
    # holds to the split paths' operand error (~2^-16 x O(sqrt(N/B)) for
    # 2-term) when the factorization is healthy; accumulated Schur-update
    # error appears here 1:1, so a large relative residual flags a
    # finite-but-wrong factor that the NaN check would miss.
    dK = jnp.diagonal(K)
    resid = jnp.abs(jnp.sum(jnp.square(L), axis=1) - dK)
    rel = jnp.max(resid / jnp.maximum(jnp.abs(dK), jnp.finfo(K.dtype).tiny))
    bad = bad | (rel > _DIAG_RESID_TOL) | jnp.isnan(rel)
    return lax.cond(bad, jnp.linalg.cholesky, lambda _: L, K)


# Removed (measured negative, 2026-08-20): a blocked triangular
# substitution with split-bf16 panel GEMMs for wide right-hand sides
# (`solve_triangular_many`/`_solve_many`) and its use with `split_syrk`
# in DirectSolver.condition. End to end at N=1e4/M=6e3 it measured 0.77x
# the native formulation AND ~1e-2 absolute error in the whitened
# cross-covariance (split operand error amplified by cond(L) across the
# sequential panels), which posterior-variance cancellation turned into
# negative variances. benchmarks/condition_bench.json is the record.


def _native_loglik_terms(K: Array, r: Array) -> tuple[Array, Array]:
    """Reference ``(r^T K^-1 r, log|chol(K)|)`` via the native kernels."""
    L = jnp.linalg.cholesky(K)
    a = jax.scipy.linalg.solve_triangular(L, r, lower=True)
    return jnp.sum(jnp.square(a)), jnp.sum(jnp.log(jnp.diagonal(L)))


def _scaled_loglik_impl(
    T: Array, rs: Array, block: int, terms: int, want_factor: bool
):
    """Factor a scaled padded SPD system and whiten ``rs`` in one loop.

    ``T`` is the ``(m, m)`` unit-diagonal symmetrically-scaled covariance,
    padded to a ``block`` multiple with identity rows/columns; only its
    lower triangle must be valid. ``rs`` is the matching scaled residual
    (zero in the pad). The blocked right-looking factorization of
    :func:`blocked_cholesky` with three structural changes that remove
    every auxiliary O(N^2) pass the log-likelihood doesn't need:

    - forward substitution runs INSIDE the panel loop: each panel's
      whitened coefficients come from the already-computed panel inverse
      (one (B,)x(B,B) vector-matrix product) and the running residual is
      updated with one GEMV against the freshly written ``L21`` — so the
      separate O(N^2) TRSM (2.4 ms at N=1e4 on v5e) disappears;
    - the factor is never assembled or rescaled (callers adjust
      ``log|L| = sum log diag(Ls) - sum log s`` themselves);
    - the diagonal-reconstruction guard accumulates per panel from values
      already in registers (``sum(body^2, axis=1)`` against the scaled
      diagonal's exact value 1), instead of re-reading the factor.

    Returns ``(quad, half_logdet_scaled, bad, Ls_or_None)``. ``bad`` flags
    NaN/non-positive pivots or a large diagonal residual.
    """
    m = T.shape[0]
    with jax.default_matmul_precision("highest"):
        nb = m // block
        # tile 512 beats 256 for the trailing updates: measured 7.6 vs
        # 9.0 ms for the full N=1e4 SYRK series on v5e (2026-08-20) —
        # the wider li/lj dots push the per-tile balance from DMA-bound
        # to MXU-bound.
        tile = block if block % 512 == 0 else 256
        eye = jnp.eye(block, dtype=T.dtype)

        rs = rs.astype(T.dtype)
        quad = jnp.zeros((), T.dtype)
        half_logdet = jnp.zeros((), T.dtype)
        bad_pivot = jnp.zeros((), bool)
        rowsq = jnp.zeros(m, T.dtype)
        cols = [] if want_factor else None
        for k in range(nb):
            lo = k * block
            A11 = lax.dynamic_slice(T, (lo, lo), (block, block))
            L11 = lax.linalg.cholesky(A11, symmetrize_input=False)
            dL = jnp.diagonal(L11)
            bad_pivot = bad_pivot | jnp.any(~(dL > 0))
            half_logdet = half_logdet + jnp.sum(jnp.log(dL))
            rk = lax.dynamic_slice(rs, (lo,), (block,))
            if k + 1 < nb:
                L11invT = jax.scipy.linalg.solve_triangular(
                    L11, eye, lower=True
                ).T
                # alpha_k = L11^{-1} r_k as one vector-matrix product
                # against the panel inverse already needed for L21.
                ak = jnp.matmul(rk[None, :], L11invT)[0]
                hi = lo + block
                L21 = pallas_dense.split_panel_matmul(
                    T, L11invT, tile=tile, terms=terms, at=(hi, lo),
                    rows=m - hi,
                )
                # The trailing update also emits, from the li block
                # already in VMEM, the factor row sums-of-squares (the
                # reconstruction guard) and the whitening GEMV L21 @ ak
                # — removing two separate O((m-hi) b) passes per panel.
                T, l21_sq, rsu = pallas_dense.syrk_sub_inplace(
                    T, L21, offset=hi, tile=tile, terms=terms, ak=ak
                )
                tail = lax.dynamic_slice(rs, (hi,), (m - hi,))
                rs = lax.dynamic_update_slice(rs, tail - rsu, (hi,))
                body_sq = jnp.concatenate(
                    [jnp.sum(jnp.square(L11), axis=1), l21_sq]
                )
                if want_factor:
                    cols.append(jnp.concatenate([L11, L21], axis=0))
            else:
                ak = jax.scipy.linalg.solve_triangular(L11, rk, lower=True)
                body_sq = jnp.sum(jnp.square(L11), axis=1)
                if want_factor:
                    cols.append(L11)
            quad = quad + jnp.sum(jnp.square(ak))
            seg = lax.dynamic_slice(rowsq, (lo,), (m - lo,))
            rowsq = lax.dynamic_update_slice(rowsq, seg + body_sq, (lo,))

        # Scaled diagonal is exactly 1 (pad rows are identity rows), so the
        # reconstruction residual needs no reference vector.
        maxdev = jnp.max(jnp.abs(rowsq - 1.0))
        bad = bad_pivot | (maxdev > _DIAG_RESID_TOL) | jnp.isnan(maxdev)

        factor = None
        if want_factor:
            padded = []
            for k, body in enumerate(cols):
                zpad = jnp.zeros((k * block, block), T.dtype)
                padded.append(jnp.concatenate([zpad, body], axis=0))
            factor = jnp.concatenate(padded, axis=1)
        return quad, half_logdet, bad, factor


def _native_scaled_terms(T: Array, rs: Array) -> tuple[Array, Array]:
    """Accurate fallback on the scaled padded system (lower triangle)."""
    Ls = lax.linalg.cholesky(T, symmetrize_input=False)
    a = jax.scipy.linalg.solve_triangular(Ls, rs, lower=True)
    return jnp.sum(jnp.square(a)), jnp.sum(jnp.log(jnp.diagonal(Ls)))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _scaled_loglik(
    T: Array, rs: Array, block: int, terms: int, lower_only: bool = False
):
    quad, half_logdet, bad, _ = _scaled_loglik_impl(
        T, rs, block, terms, want_factor=False
    )
    return lax.cond(
        bad,
        _native_scaled_terms,
        lambda *_: (quad, half_logdet),
        T,
        rs,
    )


def _scaled_loglik_fwd(T, rs, block, terms, lower_only):
    quad, half_logdet, bad, Ls = _scaled_loglik_impl(
        T, rs, block, terms, want_factor=True
    )

    def native(T, rs):
        Ls = lax.linalg.cholesky(T, symmetrize_input=False)
        a = jax.scipy.linalg.solve_triangular(Ls, rs, lower=True)
        return (
            jnp.sum(jnp.square(a)),
            jnp.sum(jnp.log(jnp.diagonal(Ls))),
            Ls,
        )

    quad, half_logdet, Lout = lax.cond(
        bad, native, lambda *_: (quad, half_logdet, Ls), T, rs
    )
    return (quad, half_logdet), (Lout, rs)


def _scaled_loglik_bwd(block, terms, lower_only, res, cts):
    # quad = rs^T T^-1 rs, half_logdet = 0.5 log|T|; with cotangents
    # (qbar, lbar): Tbar = -qbar beta beta^T + 0.5 lbar T^-1 and
    # rsbar = 2 qbar beta, where beta = T^-1 rs. beta costs two thin
    # triangular solves; T^-1 one N-RHS solve plus a fast-path split SYRK.
    # The scaling/padding that produced T differentiates OUTSIDE this
    # boundary through ordinary AD of the (elementwise) construction.
    Ls, rs = res
    qbar, lbar = cts
    with jax.default_matmul_precision("highest"):
        a = jax.scipy.linalg.solve_triangular(Ls, rs, lower=True)
        beta = jax.scipy.linalg.solve_triangular(Ls, a, lower=True, trans=1)
        Linv = jax.scipy.linalg.solve_triangular(
            Ls, jnp.eye(Ls.shape[0], dtype=Ls.dtype), lower=True
        )
    Tinv = split_syrk(jnp.swapaxes(Linv, -1, -2))
    Tbar = -qbar * jnp.outer(beta, beta) + (0.5 * lbar) * Tinv
    Tbar = 0.5 * (Tbar + Tbar.T)
    if lower_only:
        # The primal reads only tril(T) (strip-built operands leave the
        # upper triangle zero), so the gradient with respect to the input
        # AS CONSUMED doubles the strict-lower entries and zeroes the
        # upper — the symmetric form above is correct only when the caller
        # materializes both triangles.
        Tbar = 2.0 * jnp.tril(Tbar, -1) + jnp.diag(jnp.diagonal(Tbar))
    rsbar = (2.0 * qbar) * beta
    return Tbar, rsbar


_scaled_loglik.defvjp(_scaled_loglik_fwd, _scaled_loglik_bwd)


def _scaled_terms_dispatch(T, rs, block, terms, rel_floor, lower_only=False):
    """Runtime split-order selection on the scaled system."""
    if terms is None and rel_floor is not None:
        return lax.cond(
            rel_floor > _FAST_FLOOR,
            lambda T, rs: _scaled_loglik(T, rs, block, 2, lower_only),
            lambda T, rs: _scaled_loglik(T, rs, block, 3, lower_only),
            T,
            rs,
        )
    return _scaled_loglik(
        T, rs, block, _TERMS if terms is None else terms, lower_only
    )


def _safe_rsqrt(d: Array) -> Array:
    return jnp.where(
        d > 0, lax.rsqrt(jnp.maximum(d, jnp.finfo(d.dtype).tiny)), 1.0
    )


def blocked_loglik_terms(
    K: Array,
    r: Array,
    *,
    block: int = _BLOCK,
    min_size: int = _MIN_BLOCKED,
    terms: int | None = None,
    rel_floor: Array | None = None,
) -> tuple[Array, Array]:
    """``(r^T K^-1 r, log|chol(K)|)`` in one fused blocked pass.

    The dense analog of the quasiseparable solver's fused
    ``log_likelihood`` path: factorization and whitening share one panel
    loop (see :func:`_scaled_loglik_impl`), with the same runtime split-
    order selection and breakdown fallback as
    :func:`cholesky_with_fallback`. Differentiable (the factorization has
    a custom VJP; the scaling differentiates by ordinary AD).

    Replaces, at the call site, the reference's factor-then-solve pair
    ``/root/reference/src/tinygp/solvers/direct.py:53,66-70``.
    """
    n = K.shape[0]
    if n < max(min_size, block) or K.dtype != jnp.float32:
        return _native_loglik_terms(K, r)
    s = _safe_rsqrt(jnp.diagonal(K))
    pad = (-n) % block
    Ks = K * s[:, None] * s[None, :]
    if pad:
        Ks = jnp.block(
            [
                [Ks, jnp.zeros((n, pad), K.dtype)],
                [jnp.zeros((pad, n), K.dtype), jnp.eye(pad, dtype=K.dtype)],
            ]
        )
    rs = r * s
    if pad:
        rs = jnp.concatenate([rs, jnp.zeros(pad, rs.dtype)])
    quad, hld_scaled = _scaled_terms_dispatch(Ks, rs, block, terms, rel_floor)
    return quad, hld_scaled - jnp.sum(jnp.log(s))


def kernel_loglik_terms(
    kernel,
    X,
    noise_diag: Array,
    r: Array,
    *,
    variance: Array | None = None,
    block: int = _BLOCK,
    terms: int | None = None,
    rel_floor: Array | None = None,
) -> tuple[Array, Array]:
    """Fused log-likelihood terms straight from the kernel — no gram matrix.

    Builds the scaled padded working matrix in per-panel STRIPS evaluated
    directly from ``kernel`` on slices of ``X`` (only at-or-below-diagonal
    panels), so:

    - the kernel function evaluates on N^2/2 + O(N B) point pairs instead
      of N^2 (the gram build is transcendental-bound: 4 ms of the 24 ms
      N=1e4 pipeline was kernel evaluation, half of it above the
      diagonal);
    - the noise add, the unit-diagonal scaling, and the block padding all
      fuse into the one pass that writes each strip (the materialized-K
      route costs three extra full passes: measured 1.2 ms scatter-based
      noise add + 1.2 ms scale + 1.2 ms pad at N=1e4);
    - the full covariance is never materialized: the strips concatenate
      straight into the factorization's working buffer.

    Replaces ``/root/reference/src/tinygp/kernels/base.py:94-96`` at the
    call site ``/root/reference/src/tinygp/solvers/direct.py:51-53``.
    """
    leaves = jax.tree_util.tree_leaves(X)
    n = leaves[0].shape[0]

    def xslice(lo, hi):
        return jax.tree_util.tree_map(lambda a: a[lo:hi], X)

    if variance is None:
        variance = kernel(X) + noise_diag
    dtype = jnp.result_type(variance.dtype, r.dtype)
    if dtype != jnp.float32:
        # The split-precision panel loop is f32-only; build the gram the
        # plain way and use the native kernels (x64 mode, etc).
        ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        K = kernel(X, X) + jnp.where(
            ii == jj, noise_diag[:, None], jnp.zeros((), dtype)
        )
        return _native_loglik_terms(K, r)
    r = r.astype(dtype)
    s = _safe_rsqrt(variance)

    pad = (-n) % block
    m = n + pad
    nb = m // block
    strips = []
    for k in range(nb):
        lo = k * block
        cr = min(lo + block, n)  # last real column of this strip
        G = kernel(xslice(lo, n), xslice(lo, cr))  # (n - lo, cr - lo)
        ii = lax.broadcasted_iota(jnp.int32, G.shape, 0)
        jj = lax.broadcasted_iota(jnp.int32, G.shape, 1)
        G = G + jnp.where(
            ii == jj, noise_diag[lo:cr][None, :], jnp.zeros((), dtype)
        )
        strip = G * s[lo:n, None] * s[None, lo:cr]
        if cr < lo + block:  # pad columns (only the last strip)
            strip = jnp.concatenate(
                [strip, jnp.zeros((n - lo, lo + block - cr), dtype)], axis=1
            )
        if pad:  # pad rows: identity in the pad block, zeros elsewhere
            bottom = jnp.zeros((pad, block), dtype)
            if cr < lo + block:
                bottom = jnp.concatenate(
                    [
                        jnp.zeros((pad, cr - lo), dtype),
                        jnp.eye(pad, dtype=dtype),
                    ],
                    axis=1,
                )
            strip = jnp.concatenate([strip, bottom], axis=0)
        strips.append(
            jnp.concatenate([jnp.zeros((lo, block), dtype), strip], axis=0)
        )
    T = jnp.concatenate(strips, axis=1)
    rs = r * s
    if pad:
        rs = jnp.concatenate([rs, jnp.zeros(pad, dtype)])
    quad, hld_scaled = _scaled_terms_dispatch(
        T, rs, block, terms, rel_floor, lower_only=True
    )
    return quad, hld_scaled - jnp.sum(jnp.log(s))
