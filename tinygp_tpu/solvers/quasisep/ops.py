"""Named quasiseparable operations and structural algebra.

Behavioral parity target: ``/root/reference/src/tinygp/solvers/quasisep/
ops.py:24-512``. Unlike the reference (which hand-writes each sequential
``lax.scan`` and each ``associative_scan`` separately), every operation here
is expressed through the shared scan primitives in
:mod:`tinygp_tpu.solvers.quasisep.scan`, so the two strategies share one code
path for the math and differ only in execution.

All matvec-style operations take a ``parallel`` flag; sequential is the
oracle, parallel (associative scan) is the TPU-fast path. The structural
algebra (``elementwise_add``/``elementwise_mul``/``qsm_mul``) manipulates
generators and is scan-free except for the ``qsm_mul`` coupling recurrences.
"""

from __future__ import annotations

__all__ = [
    "stacked_loglik_terms",
    "elementwise_add",
    "elementwise_mul",
    "qsm_mul",
    "lower_matmul",
    "lower_matmul_parallel",
    "upper_matmul",
    "upper_matmul_parallel",
    "lower_solve",
    "lower_solve_parallel",
    "upper_solve",
    "upper_solve_parallel",
    "cholesky",
    "cholesky_parallel",
    "symm_inv",
    "symm_inv_parallel",
]

from functools import partial

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.solvers.quasisep.block import ensure_dense
from tinygp_tpu.solvers.quasisep import scan as _scan
from tinygp_tpu.solvers.quasisep.scan import (
    affine_scan,
    affine_scan_stacked,
    congruence_scan,
    riccati_scan,
    riccati_scan_stacked,
)

# ---------------------------------------------------------------------------
# Triangular matmuls: y = T @ x for strictly triangular T with generators
# (p, q, a). The running state e_k accumulates the generator-weighted history
# and the output contracts it against the row generator.
# ---------------------------------------------------------------------------


def _outer_rows(u: Array, x: Array) -> Array:
    """Per-row outer products: (n, m) x (n, r) -> (n, m, r)."""
    return jnp.einsum("nj,nk->njk", u, x, precision="highest")


def _contract_rows(u: Array, e: Array) -> Array:
    """Per-row contractions: (n, m) x (n, m, r) -> (n, r)."""
    return jnp.einsum("nj,njk->nk", u, e, precision="highest")


@partial(jax.jit, static_argnames=("parallel",))
def strict_lower_matmul(p, q, a, x, *, parallel: bool = False):
    e = affine_scan(a, _outer_rows(q, x), parallel=parallel)
    return _contract_rows(p, e)


@partial(jax.jit, static_argnames=("parallel",))
def strict_upper_matmul(p, q, a, x, *, parallel: bool = False):
    e = affine_scan(a.mT, _outer_rows(p, x), reverse=True, parallel=parallel)
    return _contract_rows(q, e)


# ---------------------------------------------------------------------------
# Triangular solves: fold the diagonal into the transition so the solve
# becomes a plain affine recurrence (works identically for both strategies).
# For L = diag(d) + strict_lower(p, q, a):
#   x_k = (y_k - p_k^T e_k) / d_k,  e' = a e + q x
#       => e' = (a - (q/d) p^T) e + (q/d) y
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("parallel",))
def lower_triangular_solve(d, p, q, a, y, *, parallel: bool = False):
    inv_d = 1.0 / d[:, None]
    qd = q * inv_d
    A = a - _outer_rows(qd, p)
    e = affine_scan(A, _outer_rows(qd, y), parallel=parallel)
    return (y - _contract_rows(p, e)) * inv_d


@partial(jax.jit, static_argnames=("parallel",))
def upper_triangular_solve(d, p, q, a, y, *, parallel: bool = False):
    inv_d = 1.0 / d[:, None]
    pd = p * inv_d
    A = a.mT - _outer_rows(pd, q)
    e = affine_scan(A, _outer_rows(pd, y), reverse=True, parallel=parallel)
    return (y - _contract_rows(q, e)) * inv_d


# ---------------------------------------------------------------------------
# Cholesky of a symmetric QSM: K = diag(d) + L + L^T with L strict-lower
# (p, q, a). The factor keeps p and a; only the diagonal and the right
# generator change:
#   c_k = sqrt(d_k - p_k^T F_k p_k),  w_k = (q_k - a_k F_k p_k) / c_k
# where F is the shared Riccati flow.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("parallel",))
def symm_cholesky(d, p, q, a, *, parallel: bool = False):
    F = riccati_scan(d, p, q, a, parallel=parallel)

    def emit(F_k, d_k, p_k, q_k, a_k):
        Fp = pdot(F_k, p_k)
        c = jnp.sqrt(d_k - pdot(p_k, Fp))
        w = (q_k - pdot(a_k, Fp)) / c
        return c, w

    return jax.vmap(emit)(F, d, p, q, a)


# ---------------------------------------------------------------------------
# Symmetric inverse: K^{-1} is itself quasiseparable. The forward (Riccati)
# pass produces the inverse's right generator s and transition ell; the
# backward congruence pass z_k = ell_k^T z ell_k + (p p^T)/c2_k produces the
# diagonal and left generator.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("parallel",))
def symm_solve_generators(d, p, q, a, *, parallel: bool = False):
    F = riccati_scan(d, p, q, a, parallel=parallel)

    def fwd_emit(F_k, d_k, p_k, q_k, a_k):
        Fp = pdot(F_k, p_k)
        ig = 1.0 / (d_k - pdot(p_k, Fp))
        s = ig * (q_k - pdot(a_k, Fp))
        ell = a_k - jnp.outer(s, p_k)
        return ig, s, ell

    ig, s, ell = jax.vmap(fwd_emit)(F, d, p, q, a)

    B = jnp.einsum("n,nj,nk->njk", ig, p, p, precision="highest")
    z = congruence_scan(ell.mT, B, reverse=True, parallel=parallel)

    def bwd_emit(z_k, ig_k, p_k, a_k, s_k):
        sz = pdot(s_k, z_k)
        lam = ig_k + pdot(sz, s_k)
        t = pdot(sz, a_k) - lam * p_k
        return lam, t

    lam, t = jax.vmap(bwd_emit)(z, ig, p, a, s)
    return lam, t, s, ell


# ---------------------------------------------------------------------------
# Fused log-likelihood on stacked operands: factorization and whitening in
# one pass, with every intermediate in the scans' native (components, N)
# layout — no (N, m, k) materialization, no pack/unpack transposes, and the
# single-pass Pallas scan (when enabled) consumes the operands directly.
# ---------------------------------------------------------------------------


def stacked_loglik_terms(
    d: Array, ps: Array, qs: Array, as_: Array, y: Array
) -> tuple[Array, Array]:
    """``(alpha . alpha, sum(log c))`` for ``K = diag(d) + tril + tril^T``.

    Operands are stacked: ``d``/``y`` of shape ``(N,)``, generators
    ``ps``/``qs`` of ``(m, N)``, dense transitions ``as_`` of ``(m*m, N)``.
    Mathematically identical to ``symm_cholesky`` + ``lower_triangular_
    solve`` (the reference's factor-then-whiten pair,
    ``/root/reference/src/tinygp/solvers/quasisep/ops.py:352-365,463-472``)
    but fused: the Cholesky emissions feed the solve without leaving the
    stacked layout.
    """
    # Mixed-precision operands (e.g. float64 kernel parameters under x64
    # with float32 data) promote here, where the reference's unfused route
    # would promote through ordinary jnp arithmetic; the blocked scans
    # require uniform dtypes.
    dtype = jnp.result_type(d, ps, qs, as_, y)
    d, ps, qs, as_, y = (
        x.astype(dtype) for x in (d, ps, qs, as_, y)
    )
    m = ps.shape[0]

    # On TPU at large N, one fused Pallas pass does the whole job (both
    # scans, emissions, and the reductions in VMEM; scalar outputs).
    from tinygp_tpu.solvers.quasisep import pallas_loglik

    if pallas_loglik.supported(d, ps, qs, as_, y):
        return pallas_loglik.fused_loglik_terms(d, ps, qs, as_, y)

    Fs = riccati_scan_stacked(d, ps, qs, as_)

    # Cholesky emissions: c_k = sqrt(d_k - p^T F p), w_k = (q - a F p) / c.
    Fp = _scan._smv(Fs, ps, m, m)
    c2 = d - jnp.sum(ps * Fp, axis=0)
    c = jnp.sqrt(c2)
    inv_c = 1.0 / c
    w = (qs - _scan._smv(as_, Fp, m, m)) * inv_c

    # Whitening solve L alpha = y with L = diag(c) + strict_lower(p, w, a):
    # fold the diagonal into the transition (lower_triangular_solve math).
    wd = w * inv_c
    A = as_ - _scan._souter(wd, ps)
    e = affine_scan_stacked(A, wd * y, m, 1)
    alpha = (y - jnp.sum(ps * e, axis=0)) * inv_c

    return jnp.sum(jnp.square(alpha)), jnp.sum(jnp.log(c))


def lower_matmul(p, q, a, x):
    return strict_lower_matmul(p, q, a, x, parallel=False)


def lower_matmul_parallel(p, q, a, x):
    return strict_lower_matmul(p, q, a, x, parallel=True)


def upper_matmul(p, q, a, x):
    return strict_upper_matmul(p, q, a, x, parallel=False)


def upper_matmul_parallel(p, q, a, x):
    return strict_upper_matmul(p, q, a, x, parallel=True)


def lower_solve(d, p, q, a, y):
    return lower_triangular_solve(d, p, q, a, y, parallel=False)


def lower_solve_parallel(d, p, q, a, y):
    return lower_triangular_solve(d, p, q, a, y, parallel=True)


def upper_solve(d, p, q, a, y):
    return upper_triangular_solve(d, p, q, a, y, parallel=False)


def upper_solve_parallel(d, p, q, a, y):
    return upper_triangular_solve(d, p, q, a, y, parallel=True)


def cholesky(d, p, q, a):
    return symm_cholesky(d, p, q, a, parallel=False)


def cholesky_parallel(d, p, q, a):
    return symm_cholesky(d, p, q, a, parallel=True)


def symm_inv(d, p, q, a):
    return symm_solve_generators(d, p, q, a, parallel=False)


def symm_inv_parallel(d, p, q, a):
    return symm_solve_generators(d, p, q, a, parallel=True)


# ---------------------------------------------------------------------------
# Structural algebra on whole QSMs. These dispatch on the (diag, lower,
# upper) decomposition of each operand; missing parts propagate as None.
# ---------------------------------------------------------------------------


def _decompose(m):
    """Split any QSM into its (diag, strict-lower, strict-upper) parts."""
    from tinygp_tpu.solvers.quasisep.core import (
        DiagQSM,
        StrictLowerTriQSM,
        StrictUpperTriQSM,
        SymmQSM,
    )

    diag = m if isinstance(m, DiagQSM) else getattr(m, "diag", None)
    lower = m if isinstance(m, StrictLowerTriQSM) else getattr(m, "lower", None)
    if isinstance(m, StrictUpperTriQSM):
        upper = m
    elif isinstance(m, SymmQSM):
        upper = m.lower.transpose()
    else:
        upper = getattr(m, "upper", None)
    return diag, lower, upper


def _is_symmetric(m) -> bool:
    from tinygp_tpu.solvers.quasisep.core import DiagQSM, SymmQSM

    return isinstance(m, (DiagQSM, SymmQSM))


def _recompose(diag, lower, upper, symmetric: bool):
    """Assemble a QSM from parts, choosing the tightest class."""
    from tinygp_tpu.solvers.quasisep.core import (
        LowerTriQSM,
        SquareQSM,
        SymmQSM,
        UpperTriQSM,
    )

    if lower is None and upper is None:
        return diag
    if symmetric:
        assert diag is not None and lower is not None
        return SymmQSM(diag=diag, lower=lower)
    if lower is None:
        return upper if diag is None else UpperTriQSM(diag=diag, upper=upper)
    if upper is None:
        return lower if diag is None else LowerTriQSM(diag=diag, lower=lower)
    if diag is None:
        # e.g. strict-lower + strict-upper: no compact class for this.
        return None
    return SquareQSM(diag=diag, lower=lower, upper=upper)


def _maybe(f, x, y):
    if x is None:
        return y
    if y is None:
        return x
    return f(x, y)


@jax.jit
def elementwise_add(a, b):
    """``a + b`` for two QSMs, staying quasiseparable."""
    da, la, ua = _decompose(a)
    db, lb, ub = _decompose(b)
    return _recompose(
        _maybe(lambda x, y: x.self_add(y), da, db),
        _maybe(lambda x, y: x.self_add(y), la, lb),
        _maybe(lambda x, y: x.self_add(y), ua, ub),
        _is_symmetric(a) and _is_symmetric(b),
    )


@jax.jit
def elementwise_mul(a, b):
    """Hadamard product of two QSMs (orders multiply)."""
    da, la, ua = _decompose(a)
    db, lb, ub = _decompose(b)
    mul = lambda x, y: None if (x is None or y is None) else x.self_mul(y)
    return _recompose(
        mul(da, db),
        mul(la, lb),
        mul(ua, ub),
        _is_symmetric(a) and _is_symmetric(b),
    )


def _coupling_scan(A, Bt, C, *, reverse: bool = False):
    """Exclusive prefix of the two-sided recurrence ``g' = A g B^T + C``.

    Used for the phi/psi coupling terms in the QSM-times-QSM product. Linear
    in the carry (so an associative kron-form exists) but only the
    sequential strategy is implemented — products of QSMs sit off the hot
    likelihood path.
    """

    def step(carry, inputs):
        A_k, Bt_k, C_k = inputs
        return pdot(pdot(A_k, carry), Bt_k.T) + C_k, carry

    init = jnp.zeros_like(C[0])
    _, e = jax.lax.scan(step, init, (A, Bt, C), reverse=reverse)
    return e


def _stack_cols(*parts):
    parts = [x for x in parts if x is not None]
    return jnp.concatenate(parts, axis=-1) if parts else None


def _block_upper_2x2(a_top, a_bot, coupling):
    """Per-row ``[[a_top, coupling], [0, a_bot]]`` with dense blocks."""
    a_top = ensure_dense(a_top)
    a_bot = ensure_dense(a_bot)
    m1 = a_top.shape[-1]
    m2 = a_bot.shape[-1]
    top = jnp.concatenate((a_top, coupling), axis=-1)
    zeros = jnp.zeros(a_bot.shape[:-2] + (m2, m1), dtype=a_bot.dtype)
    bot = jnp.concatenate((zeros, a_bot), axis=-1)
    return jnp.concatenate((top, bot), axis=-2)


def _block_lower_2x2(a_top, a_bot, coupling):
    """Per-row ``[[a_top, 0], [coupling, a_bot]]`` with dense blocks."""
    a_top = ensure_dense(a_top)
    a_bot = ensure_dense(a_bot)
    m1 = a_top.shape[-1]
    m2 = a_bot.shape[-1]
    zeros = jnp.zeros(a_top.shape[:-2] + (m1, m2), dtype=a_top.dtype)
    top = jnp.concatenate((a_top, zeros), axis=-1)
    bot = jnp.concatenate((coupling, a_bot), axis=-1)
    return jnp.concatenate((top, bot), axis=-2)


@jax.jit
def qsm_mul(a, b):
    """The product ``a @ b`` of two QSMs as a QSM (orders add).

    The diagonal-crossing interactions are captured by two coupling scans:
    ``phi`` couples a's lower history with b's upper history (forward), and
    ``psi`` couples a's upper future with b's lower future (backward). The
    output generators are concatenations of the operands' generators with
    coupling-corrected terms, and transitions become 2x2 block triangles.
    """
    from tinygp_tpu.solvers.quasisep.core import (
        DiagQSM,
        StrictLowerTriQSM,
        StrictUpperTriQSM,
    )

    da, la, ua = _decompose(a)
    db, lb, ub = _decompose(b)

    if la is None and ua is None and lb is None and ub is None:
        return DiagQSM(d=da.d * db.d)

    phi = None
    if la is not None and ub is not None:
        phi = _coupling_scan(
            ensure_dense(la.a),
            ensure_dense(ub.a),
            jnp.einsum("nj,nk->njk", la.q, ub.q),
        )

    psi = None
    if ua is not None and lb is not None:
        psi = _coupling_scan(
            ensure_dense(ua.a).mT,
            ensure_dense(lb.a).mT,
            jnp.einsum("nj,nk->njk", ua.p, lb.p),
            reverse=True,
        )

    @jax.vmap
    def emit(da, la, ua, db, lb, ub, phi, psi):
        # Row-wise assembly of the product's generators. Notation: the
        # product's lower generators are [t | s], upper are [u | v], with the
        # four coupling-corrected terms below.
        alpha = beta = theta = eta = lam = None
        if db is not None and la is not None:
            alpha = la.q * db.d
        if da is not None and lb is not None:
            beta = da.d * lb.p
        if da is not None and ub is not None:
            theta = da.d * ub.q
        if db is not None and ua is not None:
            eta = ua.p * db.d
        if da is not None and db is not None:
            lam = da.d * db.d

        if phi is not None:
            la_a = ensure_dense(la.a)
            ub_a = ensure_dense(ub.a)
            alpha = _maybe(jnp.add, alpha, la_a @ phi @ ub.p)
            theta = _maybe(jnp.add, theta, la.p @ phi @ ub_a.T)
            lam = _maybe(jnp.add, lam, la.p @ phi @ ub.p)

        if psi is not None:
            ua_a = ensure_dense(ua.a)
            lb_a = ensure_dense(lb.a)
            beta = _maybe(jnp.add, beta, ua.q @ psi @ lb_a)
            eta = _maybe(jnp.add, eta, ua_a.T @ psi @ lb.q)
            lam = _maybe(jnp.add, lam, ua.q @ psi @ lb.q)

        s = _stack_cols(alpha, None if lb is None else lb.q)
        t = _stack_cols(None if la is None else la.p, beta)
        v = _stack_cols(None if ua is None else ua.q, theta)
        u = _stack_cols(eta, None if ub is None else ub.p)

        if la is not None and lb is not None:
            ell = _block_upper_2x2(la.a, lb.a, jnp.outer(la.q, lb.p))
        elif la is not None:
            ell = ensure_dense(la.a)
        elif lb is not None:
            ell = ensure_dense(lb.a)
        else:
            ell = None

        if ua is not None and ub is not None:
            delta = _block_lower_2x2(ua.a, ub.a, jnp.outer(ub.q, ua.p))
        elif ua is not None:
            delta = ensure_dense(ua.a)
        elif ub is not None:
            delta = ensure_dense(ub.a)
        else:
            delta = None

        new_diag = DiagQSM(d=lam) if lam is not None else None
        new_lower = (
            StrictLowerTriQSM(p=t, q=s, a=ell)
            if (s is not None and t is not None and ell is not None)
            else None
        )
        new_upper = (
            StrictUpperTriQSM(p=u, q=v, a=delta)
            if (u is not None and v is not None and delta is not None)
            else None
        )
        return new_diag, new_lower, new_upper

    diag, lower, upper = emit(da, la, ua, db, lb, ub, phi, psi)
    # Unlike addition, a product of symmetric matrices is only symmetric when
    # they commute, which we can't assume — always keep both triangles.
    return _recompose(diag, lower, upper, symmetric=False)
