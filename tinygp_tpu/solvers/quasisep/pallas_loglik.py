"""Fully-fused single-pass quasiseparable log-likelihood TPU kernel.

One ``pallas_call`` computes ``(r^T K^-1 r, log|chol(K)|)`` for a
quasiseparable ``K = diag(d) + tril(p, q, a) + tril^T`` end to end: per
chunk it runs the Riccati covariance flow (decoupled-lookback scan), the
Cholesky emissions, the whitening (affine) scan, and the two scalar
reductions — all in VMEM. Against the two-kernel composition in
:func:`tinygp_tpu.solvers.quasisep.ops.stacked_loglik_terms` this removes,
per evaluation at N = 1e6: the Riccati-operand producer pass, the affine
tiling/untiling passes, the F-prefix and emission HBM round trips, and
every elementwise intermediate (w, c, A, B, alpha) — the scalar outputs
make the kernel's write traffic ~zero.

The math replaced is the reference's factor-then-whiten pair
``/root/reference/src/tinygp/solvers/quasisep/ops.py:352-365,463-472``.

Differentiation: a custom VJP. The forward variant saves the Riccati
prefix ``F`` (the only expensive residual) by writing it back from the
kernel; the backward recomputes the cheap emission/whitening glue under
``jax.vjp`` (re-running the affine scan, which is a small fraction of the
work) and routes the ``F`` cotangent through the hand-written Riccati
adjoint (:func:`tinygp_tpu.solvers.quasisep.scan._riccati_bwd_s`).
"""

from __future__ import annotations

__all__ = ["fused_loglik_terms", "supported"]

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinygp_tpu.solvers.quasisep import pallas_scan
from tinygp_tpu.solvers.quasisep import scan as _scan
from tinygp_tpu.solvers.quasisep.pallas_scan import (
    _SUB,
    _run_chunk_scan,
    _is_tracer_batched,
)

# Default tiles. The fused kernel holds two monoids' parked states plus
# the emission intermediates, so its VMEM high-water mark is ~2x the
# generic scan kernel's; block 32 keeps the m=2 case well under the limit.
_BLOCK = 32
_LANES = 128


def supported(d, ps, qs, as_, y) -> bool:
    """Whether the fused kernel can run for these operands.

    Enablement is fail-closed (see ``pallas_gate``): without an explicit
    ``TINYGP_TPU_PALLAS_SCAN=1`` override, the kernel only becomes the
    default when a committed passing on-device verdict exists for the
    current implementation hash. ``TINYGP_TPU_PALLAS_LOGLIK=0`` kills just
    this fused kernel while leaving the generic scan kernel alone.
    """
    from tinygp_tpu.solvers.quasisep import pallas_gate

    if os.environ.get("TINYGP_TPU_PALLAS_LOGLIK") == "0":
        return False
    if not pallas_gate.enabled():
        return False
    if not (pallas_scan.INTERPRET or jax.default_backend() == "tpu"):
        return False
    m = ps.shape[0] if getattr(ps, "ndim", 0) == 2 else 0
    if m < 1 or m > 3:
        return False
    for leaf, nd in ((d, 1), (ps, 2), (qs, 2), (as_, 2), (y, 1)):
        if _is_tracer_batched(leaf):
            return False
        if getattr(leaf, "ndim", None) != nd:
            return False
        if leaf.dtype != jnp.float32:
            return False
    n = d.shape[-1]
    # Below the associative cutoff the XLA strategy is already a single
    # cheap program; the kernel's fixed tiling overhead is not worth it.
    return n > _scan._ASSOC_CUTOFF


def _loglik_kernel(
    *refs,
    m: int,
    block: int,
    lanes: int,
    residuals: bool,
):
    """One grid step: Riccati scan -> emissions -> affine scan -> reduce."""
    n_in = m * m + 2 * m + 2
    in_refs = refs[:n_in]
    pos = n_in
    quad_ref, logdet_ref = refs[pos], refs[pos + 1]
    pos += 2
    if residuals:
        f_refs = refs[pos : pos + m * m]
        pos += m * m
        e_refs = refs[pos : pos + m]
        pos += m
        ic_ref = refs[pos]
        pos += 1
    ric_park = refs[pos : pos + 3 * m * m]
    pos += 3 * m * m
    aff_park = refs[pos : pos + m * m + m]
    pos += m * m + m
    ric_carry = refs[pos : pos + 3 * m * m]
    pos += 3 * m * m
    aff_carry = refs[pos : pos + m * m + m]

    g = pl.program_id(0)

    d_in = in_refs[0][0]  # (block, sub, lanes)
    p_in = [in_refs[1 + i][0] for i in range(m)]
    q_in = [in_refs[1 + m + i][0] for i in range(m)]
    a_in = [in_refs[1 + 2 * m + c][0] for c in range(m * m)]
    y_in = in_refs[1 + 2 * m + m * m][0]

    # Riccati matrix-fraction operands, computed in VMEM (no producer
    # pass): A0 = a - q p^T / d, F0 = q q^T / d, G0 = -p p^T / d.
    inv_d = 1.0 / d_in
    A0 = [
        a_in[i * m + j] - q_in[i] * p_in[j] * inv_d
        for i in range(m)
        for j in range(m)
    ]
    F0 = [
        q_in[i] * q_in[j] * inv_d for i in range(m) for j in range(m)
    ]
    G0 = [
        -(p_in[i] * p_in[j]) * inv_d for i in range(m) for j in range(m)
    ]

    ric_counts = (m * m, m * m, m * m)
    eye = tuple(
        1.0 if c % (m + 1) == 0 else 0.0 for c in range(m * m)
    )
    zeros = (0.0,) * (m * m)
    ric_idents = (eye, zeros, zeros)

    ric_combine_l = _scan.riccati_combine_lists(m)

    def ric_comb(earlier, later):
        return list(
            ric_combine_l(
                tuple(tuple(l) for l in earlier),
                tuple(tuple(l) for l in later),
            )
        )

    flat_elems = A0 + F0 + G0

    def ric_get_elem(s):
        vals = [x[s] for x in flat_elems]
        return [
            list(vals[k * m * m : (k + 1) * m * m]) for k in range(3)
        ]

    def ric_park_write(i, s, val):
        ric_park[i][s] = val

    def ric_park_read(i):
        return ric_park[i][:]

    final = _run_chunk_scan(
        ric_comb,
        ric_get_elem,
        ric_park_write,
        ric_park_read,
        ric_carry,
        ric_counts,
        ric_idents,
        block,
        lanes,
        False,
        g,
    )
    F = final[1]  # m*m components, each (block, sub, lanes)
    if residuals:
        for c in range(m * m):
            f_refs[c][0] = F[c]

    # Cholesky emissions: c = sqrt(d - p^T F p), w = (q - a F p) / c.
    Fp = [
        sum(F[i * m + j] * p_in[j] for j in range(m)) for i in range(m)
    ]
    c2 = d_in - sum(p_in[i] * Fp[i] for i in range(m))
    c = jnp.sqrt(c2)
    ic = 1.0 / c
    w = [
        (q_in[i] - sum(a_in[i * m + j] * Fp[j] for j in range(m))) * ic
        for i in range(m)
    ]
    wd = [w[i] * ic for i in range(m)]

    # Whitening solve operands: A = a - wd p^T, B = wd * y.
    Aaff = [
        a_in[i * m + j] - wd[i] * p_in[j]
        for i in range(m)
        for j in range(m)
    ]
    Baff = [wd[i] * y_in for i in range(m)]

    aff_counts = (m * m, m)
    aff_idents = (eye, (0.0,) * m)
    aff_combine_l = _scan.affine_combine_lists(m, 1, False)

    def aff_comb(earlier, later):
        return list(
            aff_combine_l(
                tuple(tuple(l) for l in earlier),
                tuple(tuple(l) for l in later),
            )
        )

    aff_elems = Aaff + Baff

    def aff_get_elem(s):
        vals = [x[s] for x in aff_elems]
        return [list(vals[: m * m]), list(vals[m * m :])]

    def aff_park_write(i, s, val):
        aff_park[i][s] = val

    def aff_park_read(i):
        return aff_park[i][:]

    efinal = _run_chunk_scan(
        aff_comb,
        aff_get_elem,
        aff_park_write,
        aff_park_read,
        aff_carry,
        aff_counts,
        aff_idents,
        block,
        lanes,
        False,
        g,
    )
    e = efinal[1]  # m components

    if residuals:
        # The backward kernel's residuals: the whitening states and the
        # inverse Cholesky diagonal, so the reverse pass recomputes NO
        # forward-direction scan.
        for i in range(m):
            e_refs[i][0] = e[i]
        ic_ref[0] = ic

    alpha = (y_in - sum(p_in[i] * e[i] for i in range(m))) * ic

    # The two scalar reductions accumulate into full (sub, lanes) vreg
    # tiles, reduced to scalars by the caller AFTER the pallas_call.
    # Mosaic cannot lower scalar stores to VMEM (the r04 bench crash:
    # "_masked_swap_lowering_rule: Cannot store scalars to VMEM"), and a
    # vector accumulator is also the faster shape — the per-chunk partial
    # sums stay one full-width VPU add each. Pad rows contribute exactly
    # zero to both tiles (c = 1, alpha = 0), so the outside sum is exact.
    quad_part = jnp.sum(jnp.square(alpha), axis=0)  # (sub, lanes)
    logdet_part = jnp.sum(jnp.log(c), axis=0)

    @pl.when(g == 0)
    def _():
        quad_ref[...] = jnp.zeros_like(quad_part)
        logdet_ref[...] = jnp.zeros_like(logdet_part)

    quad_ref[...] += quad_part
    logdet_ref[...] += logdet_part


def _call_kernel(d, ps, qs, as_, y, *, residuals: bool):
    m = ps.shape[0]
    n = d.shape[-1]
    # Scoped VMEM scales with the component count (~m^2): block 32 fits
    # m <= 2 but measured 19.4 MB against the 16 MB limit for the m=3
    # forward at N=1e5 (2026-08-20 compile OOM — the small-N smoke shape
    # had masked it by shrinking the block). Halve for m = 3.
    b, ln = (_BLOCK if m <= 2 else _BLOCK // 2), _LANES
    env_b = os.environ.get("TINYGP_TPU_PALLAS_LLK_BLOCK")
    env_l = os.environ.get("TINYGP_TPU_PALLAS_LLK_LANES")
    if env_b:
        b = int(env_b)
    if env_l:
        ln = int(env_l)
    while b * _SUB * ln > max(n, 1) and b > 8:
        b //= 2

    chunk = b * _SUB * ln
    nc = -(-n // chunk)
    pad = nc * chunk - n

    def tile(row, fill):
        x = row
        if pad:
            x = jnp.pad(x, (0, pad))
            idx = jnp.arange(nc * chunk)
            x = jnp.where(idx < n, x, jnp.float32(fill))
        x = x.reshape(nc, _SUB, ln, b)
        return jnp.transpose(x, (0, 3, 1, 2))

    # Pad element: d=1, p=q=0, a=I, y=0 -> an identity row of the system
    # (c = 1, alpha = 0), contributing exactly zero to both reductions.
    tiled = [tile(d, 1.0)]
    tiled += [tile(ps[i], 0.0) for i in range(m)]
    tiled += [tile(qs[i], 0.0) for i in range(m)]
    tiled += [
        tile(as_[c], 1.0 if c % (m + 1) == 0 else 0.0)
        for c in range(m * m)
    ]
    tiled.append(tile(y, 0.0))

    index_map = lambda g: (g, 0, 0, 0)
    in_specs = [pl.BlockSpec((1, b, _SUB, ln), index_map) for _ in tiled]
    # Reduction outputs are (sub, lanes) accumulator tiles (NOT (1,1)
    # scalars — Mosaic rejects scalar VMEM stores); reduced below.
    out_specs = [
        pl.BlockSpec((_SUB, ln), lambda g: (0, 0)),
        pl.BlockSpec((_SUB, ln), lambda g: (0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((_SUB, ln), jnp.float32),
        jax.ShapeDtypeStruct((_SUB, ln), jnp.float32),
    ]
    if residuals:
        out_specs += [
            pl.BlockSpec((1, b, _SUB, ln), index_map)
            for _ in range(m * m + m + 1)
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((nc, b, _SUB, ln), jnp.float32)
            for _ in range(m * m + m + 1)
        ]
    scratch = (
        [pltpu.VMEM((b, _SUB, ln), jnp.float32) for _ in range(3 * m * m)]
        + [
            pltpu.VMEM((b, _SUB, ln), jnp.float32)
            for _ in range(m * m + m)
        ]
        + [pltpu.VMEM((_SUB, ln), jnp.float32) for _ in range(3 * m * m)]
        + [
            pltpu.VMEM((_SUB, ln), jnp.float32)
            for _ in range(m * m + m)
        ]
    )

    kernel = functools.partial(
        _loglik_kernel, m=m, block=b, lanes=ln, residuals=residuals
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,),
        ),
        interpret=pallas_scan.INTERPRET,
    )(*tiled)

    quad = jnp.sum(outs[0])
    logdet = jnp.sum(outs[1])
    if not residuals:
        return quad, logdet

    def untile(x):
        x = jnp.transpose(x, (0, 2, 3, 1))
        return x.reshape(nc * chunk)[:n]

    Fs = jnp.stack([untile(outs[2 + c]) for c in range(m * m)], axis=0)
    e = jnp.stack(
        [untile(outs[2 + m * m + c]) for c in range(m)], axis=0
    )
    ic = untile(outs[2 + m * m + m])
    return quad, logdet, Fs, e, ic


@jax.custom_vjp
def fused_loglik_terms(d, ps, qs, as_, y):
    """``(alpha . alpha, sum(log c))`` in one fused Pallas pass.

    Drop-in for the two-scan composition in ``ops.stacked_loglik_terms``
    when :func:`supported` holds (caller checks).
    """
    quad, logdet = _call_kernel(d, ps, qs, as_, y, residuals=False)
    return quad, logdet


def _glue_terms(d, ps, qs, as_, y, Fs):
    """Emissions + whitening from a SAVED Riccati prefix (for the VJP)."""
    m = ps.shape[0]
    Fp = _scan._smv(Fs, ps, m, m)
    c2 = d - jnp.sum(ps * Fp, axis=0)
    c = jnp.sqrt(c2)
    inv_c = 1.0 / c
    w = (qs - _scan._smv(as_, Fp, m, m)) * inv_c
    wd = w * inv_c
    A = as_ - _scan._souter(wd, ps)
    e = _scan.affine_scan_stacked(A, wd * y, m, 1)
    alpha = (y - jnp.sum(ps * e, axis=0)) * inv_c
    return jnp.sum(jnp.square(alpha)), jnp.sum(jnp.log(c))


def _fused_fwd(d, ps, qs, as_, y):
    quad, logdet, Fs, e, ic = _call_kernel(d, ps, qs, as_, y, residuals=True)
    return (quad, logdet), (d, ps, qs, as_, y, Fs, e, ic)


def _bwd_kernel(*refs, m: int, block: int, lanes: int):
    """One reverse grid step: affine adjoint -> cotangent glue -> congruence.

    Mirrors the forward kernel's two-scans-with-glue structure in the
    reverse direction. Key identity: the whitening transitions
    ``A = a - wd p^T`` equal the Riccati linearization ``a~`` of
    :func:`tinygp_tpu.solvers.quasisep.scan._riccati_bwd_s`, so both
    reverse scans share the per-position transition (applied as a matvec
    in the affine-adjoint monoid and congruently in the state-adjoint
    monoid). All emissions are recomputed elementwise from the saved
    residuals ``(F, e, ic)`` — no forward-direction scan runs here.
    """
    n_in = 2 * m * m + 3 * m + 4
    in_refs = refs[:n_in]
    pos = n_in
    n_out = m * m + 2 * m + 2
    out_refs = refs[pos : pos + n_out]
    pos += n_out
    aff_park = refs[pos : pos + m * m + m]
    pos += m * m + m
    cong_park = refs[pos : pos + 2 * m * m]
    pos += 2 * m * m
    aff_carry = refs[pos : pos + m * m + m]
    pos += m * m + m
    cong_carry = refs[pos : pos + 2 * m * m]

    g = pl.program_id(0)

    p_in = [in_refs[i][0] for i in range(m)]
    q_in = [in_refs[m + i][0] for i in range(m)]
    a_in = [in_refs[2 * m + c][0] for c in range(m * m)]
    y_in = in_refs[2 * m + m * m][0]
    F_in = [in_refs[2 * m + m * m + 1 + c][0] for c in range(m * m)]
    e_in = [in_refs[2 * m + 2 * m * m + 1 + i][0] for i in range(m)]
    ic_in = in_refs[2 * m * m + 3 * m + 1][0]
    qb = in_refs[2 * m * m + 3 * m + 2][0]
    lb = in_refs[2 * m * m + 3 * m + 3][0]

    # --- elementwise recompute of the forward emissions -------------------
    ic2 = ic_in * ic_in
    Fp = [
        sum(F_in[i * m + j] * p_in[j] for j in range(m)) for i in range(m)
    ]
    u = [
        q_in[i] - sum(a_in[i * m + j] * Fp[j] for j in range(m))
        for i in range(m)
    ]
    wd = [u[i] * ic2 for i in range(m)]
    A = [
        a_in[i * m + j] - wd[i] * p_in[j]
        for i in range(m)
        for j in range(m)
    ]
    At = [A[j * m + i] for i in range(m) for j in range(m)]
    alpha = (y_in - sum(p_in[i] * e_in[i] for i in range(m))) * ic_in
    alphabar = 2.0 * qb * alpha
    ebar = [-(alphabar * ic_in) * p_in[i] for i in range(m)]

    eye = tuple(1.0 if c % (m + 1) == 0 else 0.0 for c in range(m * m))

    def make_comb(combine_l):
        def comb(earlier, later):
            return list(
                combine_l(
                    tuple(tuple(l) for l in earlier),
                    tuple(tuple(l) for l in later),
                )
            )

        return comb

    # --- reverse exclusive affine-adjoint scan: mu_k = lambda_{k+1} -------
    aff_counts = (m * m, m)
    aff_idents = (eye, (0.0,) * m)
    aff_comb = make_comb(_scan.affine_combine_lists(m, 1, True))
    aff_elems = At + ebar

    def aff_get_elem(s):
        vals = [x[s] for x in aff_elems]
        return [list(vals[: m * m]), list(vals[m * m :])]

    afinal = _run_chunk_scan(
        aff_comb,
        aff_get_elem,
        lambda i, s, val: aff_park[i].__setitem__(s, val),
        lambda i: aff_park[i][:],
        aff_carry,
        aff_counts,
        aff_idents,
        block,
        lanes,
        True,
        g,
    )
    mu = afinal[1]  # m components: lambda_{k+1}

    # --- cotangent glue: the direct F cotangent (congruence loads) --------
    Abar = [mu[i] * e_in[j] for i in range(m) for j in range(m)]
    wdbar = [
        mu[i] * y_in - sum(Abar[i * m + j] * p_in[j] for j in range(m))
        for i in range(m)
    ]
    ubar = [wdbar[i] * ic2 for i in range(m)]
    icbar = (
        -lb / ic_in
        + alphabar * alpha / ic_in
        + 2.0 * ic_in * sum(u[i] * wdbar[i] for i in range(m))
    )
    c2bar = -0.5 * icbar * ic_in * ic2
    Fpbar = [
        -sum(a_in[i * m + j] * ubar[i] for i in range(m))
        - c2bar * p_in[j]
        for j in range(m)
    ]
    Ybar = [Fpbar[i] * p_in[j] for i in range(m) for j in range(m)]

    # --- reverse exclusive congruence scan: Gbar_k = Fbar_{k+1} -----------
    cong_counts = (m * m, m * m)
    cong_idents = (eye, (0.0,) * (m * m))
    cong_comb = make_comb(_scan.congruence_combine_lists(m, True))
    cong_elems = At + Ybar

    def cong_get_elem(s):
        vals = [x[s] for x in cong_elems]
        return [list(vals[: m * m]), list(vals[m * m :])]

    cfinal = _run_chunk_scan(
        cong_comb,
        cong_get_elem,
        lambda i, s, val: cong_park[i].__setitem__(s, val),
        lambda i: cong_park[i][:],
        cong_carry,
        cong_counts,
        cong_idents,
        block,
        lanes,
        True,
        g,
    )
    Gbar = cfinal[1]  # m*m components: Fbar_{k+1}

    # --- elementwise input cotangents (the _riccati_bwd_s formulas) -------
    S = [Gbar[i * m + j] + Gbar[j * m + i] for i in range(m) for j in range(m)]
    Su = [
        sum(S[i * m + j] * u[j] for j in range(m)) for i in range(m)
    ]
    uSu = sum(u[i] * Su[i] for i in range(m))
    aTSu = [
        sum(a_in[i * m + j] * Su[i] for i in range(m)) for j in range(m)
    ]
    # (S a F)[ij] = sum_kl S[ik] a[kl] F[lj]
    Sa = [
        sum(S[i * m + k] * a_in[k * m + l] for k in range(m))
        for i in range(m)
        for l in range(m)
    ]
    SaF = [
        sum(Sa[i * m + l] * F_in[l * m + j] for l in range(m))
        for i in range(m)
        for j in range(m)
    ]

    dbar = c2bar - 0.5 * uSu * ic2 * ic2
    psbar = [
        -alphabar * ic_in * e_in[j]
        - sum(wd[i] * Abar[i * m + j] for i in range(m))
        - c2bar * Fp[j]
        + sum(F_in[i * m + j] * Fpbar[i] for i in range(m))
        - sum(F_in[j * m + i] * aTSu[i] for i in range(m)) * ic2
        + (uSu * ic2 * ic2) * Fp[j]
        for j in range(m)
    ]
    qsbar = [ubar[i] + Su[i] * ic2 for i in range(m)]
    asbar = [
        Abar[i * m + j]
        - ubar[i] * Fp[j]
        + SaF[i * m + j]
        - Su[i] * Fp[j] * ic2
        for i in range(m)
        for j in range(m)
    ]
    ybar = alphabar * ic_in + sum(wd[i] * mu[i] for i in range(m))

    outs = [dbar] + psbar + qsbar + asbar + [ybar]
    for ref, val in zip(out_refs, outs):
        ref[0] = val


def _call_bwd_kernel(ps, qs, as_, y, Fs, e, ic, qbar, lbar):
    """Reverse-pass pallas_call: returns (dbar, psbar, qsbar, asbar, ybar)."""
    m = ps.shape[0]
    n = y.shape[-1]
    # Same m-scaled block as the forward (see _call_kernel): the reverse
    # pass carries more streams (saved residuals + per-input cotangent
    # outputs), so m = 3 shrinks a step further.
    b, ln = (_BLOCK if m <= 2 else _BLOCK // 4), _LANES
    env_b = os.environ.get("TINYGP_TPU_PALLAS_LLK_BLOCK")
    env_l = os.environ.get("TINYGP_TPU_PALLAS_LLK_LANES")
    if env_b:
        b = int(env_b)
    if env_l:
        ln = int(env_l)
    while b * _SUB * ln > max(n, 1) and b > 8:
        b //= 2

    chunk = b * _SUB * ln
    nc = -(-n // chunk)
    pad = nc * chunk - n

    def tile(row, fill):
        x = row
        if pad:
            # Reverse scan: pad on the LEFT with scan-identity rows.
            x = jnp.pad(x, (pad, 0))
            idx = jnp.arange(nc * chunk)
            x = jnp.where(idx >= pad, x, jnp.float32(fill))
        x = x.reshape(nc, _SUB, ln, b)
        return jnp.transpose(x, (0, 3, 1, 2))

    # Pad element: identity transition (a = I, p = q = 0), zero saved
    # state, ic = 1 -> both scan elements are identities and every output
    # cotangent at a pad position is sliced off below.
    tiled = [tile(ps[i], 0.0) for i in range(m)]
    tiled += [tile(qs[i], 0.0) for i in range(m)]
    tiled += [
        tile(as_[c], 1.0 if c % (m + 1) == 0 else 0.0)
        for c in range(m * m)
    ]
    tiled.append(tile(y, 0.0))
    tiled += [tile(Fs[c], 0.0) for c in range(m * m)]
    tiled += [tile(e[i], 0.0) for i in range(m)]
    tiled.append(tile(ic, 1.0))
    # Scalar cotangents ride as broadcast streams (two extra reads of
    # N f32 ~ 8 MB at N=1e6: negligible next to SMEM plumbing).
    tiled.append(tile(jnp.broadcast_to(qbar, (n,)), 0.0))
    tiled.append(tile(jnp.broadcast_to(lbar, (n,)), 0.0))

    index_map = lambda g, nc=nc: (nc - 1 - g, 0, 0, 0)
    in_specs = [pl.BlockSpec((1, b, _SUB, ln), index_map) for _ in tiled]
    n_out = m * m + 2 * m + 2
    out_specs = [
        pl.BlockSpec((1, b, _SUB, ln), index_map) for _ in range(n_out)
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nc, b, _SUB, ln), jnp.float32)
        for _ in range(n_out)
    ]
    scratch = (
        [pltpu.VMEM((b, _SUB, ln), jnp.float32) for _ in range(m * m + m)]
        + [
            pltpu.VMEM((b, _SUB, ln), jnp.float32)
            for _ in range(2 * m * m)
        ]
        + [pltpu.VMEM((_SUB, ln), jnp.float32) for _ in range(m * m + m)]
        + [
            pltpu.VMEM((_SUB, ln), jnp.float32)
            for _ in range(2 * m * m)
        ]
    )

    kernel = functools.partial(_bwd_kernel, m=m, block=b, lanes=ln)
    outs = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,),
        ),
        interpret=pallas_scan.INTERPRET,
    )(*tiled)

    def untile(x):
        x = jnp.transpose(x, (0, 2, 3, 1))
        return x.reshape(nc * chunk)[pad:]

    dbar = untile(outs[0])
    psbar = jnp.stack([untile(outs[1 + i]) for i in range(m)], axis=0)
    qsbar = jnp.stack(
        [untile(outs[1 + m + i]) for i in range(m)], axis=0
    )
    asbar = jnp.stack(
        [untile(outs[1 + 2 * m + c]) for c in range(m * m)], axis=0
    )
    ybar = untile(outs[1 + 2 * m + m * m])
    return dbar, psbar, qsbar, asbar, ybar


def _fused_bwd(res, cts):
    d, ps, qs, as_, y, Fs, e, ic = res
    if os.environ.get("TINYGP_TPU_PALLAS_LLK_BWD", "1") == "1":
        # One fused reverse Pallas pass: both adjoint scans + all the
        # elementwise cotangent math, no forward-direction recompute.
        qbar, lbar = cts
        return _call_bwd_kernel(ps, qs, as_, y, Fs, e, ic, qbar, lbar)
    # Reference composition (also the parity oracle for the kernel): the
    # glue recomputed under jax.vjp from the saved F prefix, its F
    # cotangent routed through the hand-written Riccati adjoint.
    _, vjp = jax.vjp(_glue_terms, d, ps, qs, as_, y, Fs)
    dbar, psbar, qsbar, asbar, ybar, Fbar = vjp(cts)
    d2, p2, q2, a2 = _scan._riccati_bwd_s((d, ps, qs, as_, Fs), Fbar)
    return dbar + d2, psbar + p2, qsbar + q2, asbar + a2, ybar


fused_loglik_terms.defvjp(_fused_fwd, _fused_bwd)
