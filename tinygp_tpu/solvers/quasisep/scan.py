"""Scan primitives for quasiseparable linear algebra.

Every O(N) operation on a quasiseparable matrix — matmul, triangular solve,
Cholesky factorization, inversion — reduces to one of two first-order
recurrences over the data axis:

1. **Affine recurrence** ``g_k = A_k g_prev + B_k`` with matrix transition
   ``A_k`` (m, m) and load ``B_k`` (m, r). Triangular matmuls and solves are
   affine (solves after folding the diagonal into the transition).
2. **Riccati recurrence** ``F' = a F a^T + (q - a F p)(q - a F p)^T / (d -
   p^T F p)`` — the covariance flow underlying both the Cholesky
   factorization and the inverse of a symmetric quasiseparable matrix.

Each primitive has two execution strategies sharing one code path for the
surrounding math:

- ``parallel=False``: a sequential ``lax.scan`` over the data axis — O(N m^2)
  work, O(N) depth. The oracle path; also fastest on CPU for small m.
- ``parallel=True`` (the TPU default): a **blocked multi-level scan over
  stacked component state** (:func:`monoid_scan`). Two TPU facts drive
  this design:

  * ``lax.associative_scan``'s odd/even recursion emits an O(n)-size HLO
    program, so it is used only for levels up to ``_ASSOC_CUTOFF``; above
    that, blocked levels run a fixed number of sequential steps with all
    blocks batched across vector lanes, keeping total sequential depth
    ~(block + log2 N) for any N.
  * TPU tiles the **last two axes** of every buffer to (8, 128) lanes.
    Scan-crossing state is therefore STACKED: an (N, m, k) operand becomes
    one (m*k, N) leaf with scalar components on the second-to-last axis
    and the data axis on lanes, so materialized leaves tile as
    (C >= 6, N) instead of (m=2, N) — and a vmapped chain batch lands in
    front ((B, C, N)) with the same tiling. The m×m algebra is unrolled
    elementwise arithmetic over N-vectors on the VPU, with the component
    axis addressed at -2 so leading batch/step axes broadcast through.

The Riccati flow composes as a linear-fractional (Möbius) map on matrix
fractions, so its associative combine solves small m×m systems per merge
(closed-form adjugate inverses for m <= 3; reference math:
``solvers/quasisep/ops.py:368-386``, Foreman-Mackey et al. 2017).

Both strategies return the *exclusive* prefix (the carry *before* step k),
which is what the emission formulas consume.
"""

from __future__ import annotations

__all__ = [
    "affine_scan",
    "affine_scan_stacked",
    "congruence_scan",
    "riccati_scan",
    "riccati_scan_stacked",
    "monoid_scan",
]

import functools

import jax
import numpy as np
import jax.numpy as jnp

from tinygp_tpu.helpers import Array, pdot

# Sequential steps per level of the blocked scan. Each step is batched over
# N/_BLOCK lanes, so bigger blocks mean fewer lanes but less recursion.
_BLOCK = 64
# Below this length a single sequential scan wins.
_SEQ_CUTOFF = 128
# Up to this length, one `lax.associative_scan` level (depth log2 n, full
# lane width per step) beats another blocked level (depth _BLOCK). Its HLO
# is O(n) in slice/concat ops, so it must stay bounded; 8192 keeps compiles
# fast while capping the scan at two levels for N <= 2^26.
_ASSOC_CUTOFF = 8192
# Loop unrolling for the per-level sequential scans: while-loop iterations
# on TPU carry fixed dispatch/slice overhead, so folding several combines
# into each iteration is nearly free throughput. On CPU (the test suite)
# unrolling only multiplies XLA's compile time by the unroll factor — the
# conditioning-graph compiles dominated the suite's wall clock — so it is
# applied on accelerators only.
_UNROLL = 8


def _unroll() -> int:
    return 1 if jax.default_backend() == "cpu" else _UNROLL


# ---------------------------------------------------------------------------
# The generic blocked exclusive scan (lane-major: scan axis LAST).
# ---------------------------------------------------------------------------


def monoid_scan(
    combine,
    identity,
    elems,
    *,
    reverse: bool = False,
    pallas_ok: bool = True,
    combine_lists=None,
    needed=None,
):
    """Exclusive scan of an associative ``combine`` along the LAST axis.

    Args:
        combine: ``combine(earlier, later) -> composed``, associative in
            index order, broadcasting over any leading batch dims.
        identity: Identity element (pytree, no lane axis; broadcastable).
        elems: Pytree whose leaves all have the scan axis last (length N).
        reverse: Scan right-to-left.
        combine_lists: Optional component-level twin of ``combine`` taking
            and returning tuples of LISTS of per-component arrays (one list
            per stacked leaf, one array per component row). Enables the
            single-pass Pallas strategy, whose kernel keeps every monoid
            component in its own full-vreg tile instead of slicing a
            stacked component axis at 1/8 sublane utilization.
        needed: Optional tuple of leaf indices whose prefixes the caller
            actually consumes; the Pallas strategy skips the HBM writeback
            of the rest (their slots return zeros). ``None`` = all.

    Returns:
        Pytree like ``elems``: at lane k, the composition of all elements
        strictly before (after, if reverse) k.

    Strategy: split the lane axis into blocks of ``_BLOCK``; phase 1 runs
    the block-local exclusive scan sequentially in the block position but
    batched across all blocks on the lane axis; phase 2 recurses on the
    per-block totals; phase 3 composes block prefixes into local states
    with one vectorized combine.

    Identity leaves must carry a singleton lane axis (e.g. ``(m, m, 1)``)
    so they broadcast against any block width.
    """
    n = jax.tree_util.tree_leaves(elems)[0].shape[-1]

    def seq(elems_front):
        """Sequential exclusive scan over leading-axis-stacked elements.

        Leaves have shape (steps, ..., lanes); the carry keeps the lane
        axis.
        """
        ident = jax.tree_util.tree_map(
            lambda e, i: jnp.broadcast_to(i, e.shape[1:]), elems_front, identity
        )

        def step(carry, elem):
            new = combine(elem, carry) if reverse else combine(carry, elem)
            return new, carry

        total, excl = jax.lax.scan(
            step, ident, elems_front, reverse=reverse, unroll=_unroll()
        )
        return excl, total

    if n <= _SEQ_CUTOFF:
        # Move the lane axis to the step position, keeping a singleton lane
        # axis so the combine's lane-major contraction stays valid.
        front = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x, -1, 0)[..., None], elems
        )
        excl, _ = seq(front)
        return jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x[..., 0], 0, -1), excl
        )

    if n <= _ASSOC_CUTOFF and jax.default_backend() == "tpu":
        # One associative-scan level: log2(n) combines at full lane width.
        # TPU-only: XLA:CPU's compile time on the unrolled associative-scan
        # graph blows up superlinearly for the richer combines (observed
        # 2m46s compiling symm_cholesky of a conditioned posterior QSM at
        # n=250, vs seconds for the blocked strategy below, which computes
        # the same prefixes through lax.scan phases). On CPU the depth
        # advantage is worthless anyway — there is nothing to parallelize
        # across.
        # lax.associative_scan keeps index order under reverse=True by
        # flip-scan-flip, which hands the *higher*-index aggregate to the
        # first argument — swap to preserve our (earlier, later) contract.
        fn = (lambda a, b: combine(b, a)) if reverse else combine
        axis = jax.tree_util.tree_leaves(elems)[0].ndim - 1
        incl = jax.lax.associative_scan(fn, elems, reverse=reverse, axis=axis)

        def shift(x, ident):
            ident = jnp.broadcast_to(ident, x.shape[:-1] + (1,))
            if reverse:
                return jnp.concatenate([x[..., 1:], ident], axis=-1)
            return jnp.concatenate([ident, x[..., :-1]], axis=-1)

        return jax.tree_util.tree_map(shift, incl, identity)

    # Above the associative cutoff: prefer the single-pass Pallas kernel
    # (one pass over HBM, no per-step dispatch latency) when the operands
    # and combine qualify; otherwise run the blocked multi-level strategy.
    from tinygp_tpu.solvers.quasisep import pallas_scan

    if (
        pallas_ok
        and combine_lists is not None
        and pallas_scan.supports(elems, identity)
    ):
        return pallas_scan.pallas_monoid_scan(
            combine_lists, identity, elems, reverse=reverse, needed=needed
        )

    # Scale the block so the totals level fits one associative-scan level:
    # total sequential depth stays block + log2(n / block) for any n.
    block = _BLOCK
    while n > block * _ASSOC_CUTOFF:
        block *= 2

    num_blocks = -(-n // block)
    pad = num_blocks * block - n

    def pad_and_fill(x, ident_leaf):
        if pad:
            width = [(0, 0)] * (x.ndim - 1) + [(pad, 0) if reverse else (0, pad)]
            x = jnp.pad(x, width)
            idx = jnp.arange(num_blocks * block)
            valid = (idx >= pad) if reverse else (idx < n)
            x = jnp.where(
                valid, x, jnp.broadcast_to(ident_leaf, x.shape)
            )
        # (..., nb*c) -> (c, ..., nb): block index stays on lanes.
        x = jnp.reshape(x, x.shape[:-1] + (num_blocks, block))
        return jnp.moveaxis(x, -1, 0)

    blocked = jax.tree_util.tree_map(pad_and_fill, elems, identity)

    # Phase 1: block-local exclusive scan, batched over blocks on lanes.
    local_excl, totals = seq(blocked)

    # Phase 2: recurse on the per-block totals (lane axis = num_blocks).
    block_prefix = monoid_scan(combine, identity, totals, reverse=reverse)

    # Phase 3: fold each block's prefix into its local states.
    out = (
        combine(local_excl, block_prefix)
        if reverse
        else combine(block_prefix, local_excl)
    )

    def unblock(x):
        x = jnp.moveaxis(x, 0, -1)  # (..., nb, c)
        x = jnp.reshape(x, x.shape[:-2] + (num_blocks * block,))
        return x[..., pad:] if (reverse and pad) else x[..., :n]

    return jax.tree_util.tree_map(unblock, out)


# ---------------------------------------------------------------------------
# The three recurrences. Row-major (N-leading) API at the boundary for
# compatibility with the QSM classes; internally everything runs in the
# STACKED representation: an (N, m, k) array becomes one (m*k, N) leaf with
# scalar components on the leading axis and the data axis last. Stacked
# leaves are what materialize at scan/loop boundaries, and their trailing
# two dims (C >= 6, N) tile efficiently — both standalone and under vmap
# (a chain batch lands in front: (B, C, N)). The earlier (m, m, N) layout
# wasted 4x of every tile on the m=2 sublane and made 1024-chain NUTS
# ~4x slower than the arithmetic requires.
# ---------------------------------------------------------------------------


def _pack3(a: Array) -> Array:
    """(N, m, k) -> stacked (m*k, N)."""
    m, k = a.shape[-2], a.shape[-1]
    return jnp.transpose(a, (1, 2, 0)).reshape(m * k, a.shape[0])


def _unpack3(s: Array, m: int, k: int) -> Array:
    """Stacked (m*k, N) -> (N, m, k)."""
    return jnp.transpose(s.reshape(m, k, s.shape[-1]), (2, 0, 1))


def _smm(A, B, m, k, r):
    """Stacked matmul: (..., m*k, N) x (..., k*r, N) -> (..., m*r, N).

    The component axis sits SECOND-TO-LAST so that any leading axes
    (vmap batches, the blocked scan's step axis) broadcast through, and
    materialized leaves keep the well-tiled (C, N) trailing shape.
    """
    rows = []
    for i in range(m):
        for j in range(r):
            acc = A[..., i * k, :] * B[..., j, :]
            for l in range(1, k):
                acc = acc + A[..., i * k + l, :] * B[..., l * r + j, :]
            rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _smm_t(A, B, m, k, r):
    """Stacked ``A @ B^T``: (..., m*k, N) x (..., r*k, N) -> (..., m*r, N)."""
    rows = []
    for i in range(m):
        for j in range(r):
            acc = A[..., i * k, :] * B[..., j * k, :]
            for l in range(1, k):
                acc = acc + A[..., i * k + l, :] * B[..., j * k + l, :]
            rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _st(A, m, k):
    """Stacked transpose: (..., m*k, N) -> (..., k*m, N) row permutation.

    Static slices + restack (rather than a gather with an index array) so
    the expression stays legal inside Pallas kernels, which reject
    non-scalar captured constants.
    """
    return jnp.stack(
        [A[..., i * k + j, :] for j in range(k) for i in range(m)], axis=-2
    )


def _sadd_eye(X, m):
    """Add the m x m identity to a stacked (..., m*m, N) matrix."""
    return jnp.stack(
        [
            X[..., c, :] + 1.0 if c % (m + 1) == 0 else X[..., c, :]
            for c in range(m * m)
        ],
        axis=-2,
    )


def _smv(M, v, m, k):
    """Stacked matvec: (..., m*k, N) x (..., k, N) -> (..., m, N)."""
    rows = []
    for i in range(m):
        acc = M[..., i * k, :] * v[..., 0, :]
        for l in range(1, k):
            acc = acc + M[..., i * k + l, :] * v[..., l, :]
        rows.append(acc)
    return jnp.stack(rows, axis=-2)


def _souter(u, v):
    """Stacked outer: (..., m, N) x (..., r, N) -> (..., m*r, N)."""
    m, r = u.shape[-2], v.shape[-2]
    return jnp.stack(
        [u[..., i, :] * v[..., j, :] for i in range(m) for j in range(r)],
        axis=-2,
    )


def _seye(m: int, dtype) -> Array:
    """Stacked identity with a broadcastable singleton lane axis.

    Built with numpy so scan identities stay CONCRETE under a jit trace
    (omnistaging would stage ``jnp.eye``): the Pallas scan kernel inlines
    concrete identities as literals, and every jnp consumer promotes the
    numpy array transparently.
    """
    return np.eye(m, dtype=dtype).reshape(m * m, 1)


def _inv4_components(Mc):
    """Closed-form 4x4 inverse as 16 components, via block-Schur on 2x2s.

    ``Mc`` is a length-16 sequence of row-major components (arrays of any
    broadcast-compatible shape). With ``M = [[P, Q], [R, S]]`` in 2x2
    blocks and ``T = S - R P^-1 Q`` the Schur complement::

        M^-1 = [[P^-1 + P^-1 Q T^-1 R P^-1,  -P^-1 Q T^-1],
                [-T^-1 R P^-1,                T^-1        ]]

    Every step is 2x2 adjugate inverses and 2x2 products — pure
    elementwise arithmetic, so it runs stacked over N at full VPU width
    and lowers in Mosaic (unlike the batched LU fallback, which costs a
    pivoted per-element solve: the 2-term celerite Sum at N=1e5 measured
    353 ms through the LU path vs sub-ms through this one). The scan
    merges' ``M = I + F G`` operands are near-identity, so the pivot-free
    block elimination is numerically safe there (guarded by the same
    dense-oracle tests as m <= 3).
    """

    def inv2(x):
        a, b, c, d = x
        idet = 1.0 / (a * d - b * c)
        return [d * idet, -b * idet, -c * idet, a * idet]

    def mul2(x, y):
        a, b, c, d = x
        e, f, g, h = y
        return [a * e + b * g, a * f + b * h, c * e + d * g, c * f + d * h]

    p = [Mc[0], Mc[1], Mc[4], Mc[5]]
    q = [Mc[2], Mc[3], Mc[6], Mc[7]]
    r_ = [Mc[8], Mc[9], Mc[12], Mc[13]]
    s = [Mc[10], Mc[11], Mc[14], Mc[15]]
    pinv = inv2(p)
    rpinv = mul2(r_, pinv)
    t = [si - xi for si, xi in zip(s, mul2(rpinv, q))]
    tinv = inv2(t)
    pinvq = mul2(pinv, q)
    tl = mul2(tinv, rpinv)  # T^-1 R P^-1
    tr = mul2(pinvq, tinv)  # P^-1 Q T^-1
    topleft = [pi + xi for pi, xi in zip(pinv, mul2(tr, rpinv))]
    out = [None] * 16
    out[0], out[1], out[4], out[5] = topleft
    out[2], out[3], out[6], out[7] = [-x for x in tr]
    out[8], out[9], out[12], out[13] = [-x for x in tl]
    out[10], out[11], out[14], out[15] = tinv
    return out


def _ssolve(M, B, m, r):
    """Stacked ``solve(M, B)`` with closed-form adjugates for m <= 4."""
    if m == 1:
        return B / M[..., :1, :]
    if m == 2:
        a, b = M[..., 0, :], M[..., 1, :]
        c, d = M[..., 2, :], M[..., 3, :]
        inv_det = 1.0 / (a * d - b * c)
        inv = jnp.stack([d, -b, -c, a], axis=-2) * inv_det[..., None, :]
        return _smm(inv, B, m, m, r)
    if m == 3:
        a, b, c = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        d, e, f = M[..., 3, :], M[..., 4, :], M[..., 5, :]
        g, h, i = M[..., 6, :], M[..., 7, :], M[..., 8, :]
        A = e * i - f * h
        Bc = -(d * i - f * g)
        C = d * h - e * g
        D = -(b * i - c * h)
        E = a * i - c * g
        F = -(a * h - b * g)
        G = b * f - c * e
        H = -(a * f - c * d)
        I = a * e - b * d
        inv_det = 1.0 / (a * A + b * Bc + c * C)
        inv = (
            jnp.stack([A, D, G, Bc, E, H, C, F, I], axis=-2)
            * inv_det[..., None, :]
        )
        return _smm(inv, B, m, m, r)
    if m == 4:
        comps = [M[..., k, :] for k in range(16)]
        inv = jnp.stack(_inv4_components(comps), axis=-2)
        return _smm(inv, B, m, m, r)
    # General fallback: unstack to batched matrices for an LU solve.
    Mb = jnp.moveaxis(
        M.reshape(M.shape[:-2] + (m, m, M.shape[-1])), -1, -3
    )
    Bb = jnp.moveaxis(
        B.reshape(B.shape[:-2] + (m, r, B.shape[-1])), -1, -3
    )
    out = jnp.moveaxis(jnp.linalg.solve(Mb, Bb), -3, -1)
    return out.reshape(out.shape[:-3] + (m * r, out.shape[-1]))


# ---------------------------------------------------------------------------
# Component-list twins of the stacked helpers. A stacked (..., m*k, N) leaf
# becomes a plain Python LIST of m*k per-component arrays; the m x m algebra
# is then pure elementwise arithmetic with no component-axis slicing or
# stacking at all. The single-pass Pallas kernel runs its combines in this
# form so every op touches a full-vreg tile (slicing a stacked leaf's
# component axis inside the kernel ran at 1/8 sublane utilization — the
# measured cause of the round-3 kernel's 1.8x loss).
# ---------------------------------------------------------------------------


def _lmm(A, B, m, k, r):
    """List matmul: m*k-list x k*r-list -> m*r-list."""
    out = []
    for i in range(m):
        for j in range(r):
            acc = A[i * k] * B[j]
            for l in range(1, k):
                acc = acc + A[i * k + l] * B[l * r + j]
            out.append(acc)
    return out


def _lmm_t(A, B, m, k, r):
    """List ``A @ B^T``: m*k-list x r*k-list -> m*r-list."""
    out = []
    for i in range(m):
        for j in range(r):
            acc = A[i * k] * B[j * k]
            for l in range(1, k):
                acc = acc + A[i * k + l] * B[j * k + l]
            out.append(acc)
    return out


def _lt(A, m, k):
    """List transpose — a free reindexing."""
    return [A[i * k + j] for j in range(k) for i in range(m)]


def _ladd(X, Y):
    return [x + y for x, y in zip(X, Y)]


def _ladd_eye(X, m):
    return [
        X[c] + 1.0 if c % (m + 1) == 0 else X[c] for c in range(m * m)
    ]


def _lsolve(M, B, m, r):
    """List ``solve(M, B)`` via closed-form adjugates (m <= 4 only)."""
    if m == 1:
        return [b / M[0] for b in B]
    if m == 2:
        a, b, c, d = M
        inv_det = 1.0 / (a * d - b * c)
        inv = [d * inv_det, -b * inv_det, -c * inv_det, a * inv_det]
        return _lmm(inv, B, m, m, r)
    if m == 3:
        a, b, c, d, e, f, g, h, i = M
        A = e * i - f * h
        Bc = -(d * i - f * g)
        C = d * h - e * g
        D = -(b * i - c * h)
        E = a * i - c * g
        F = -(a * h - b * g)
        G = b * f - c * e
        H = -(a * f - c * d)
        I = a * e - b * d
        inv_det = 1.0 / (a * A + b * Bc + c * C)
        inv = [x * inv_det for x in (A, D, G, Bc, E, H, C, F, I)]
        return _lmm(inv, B, m, m, r)
    if m == 4:
        return _lmm(_inv4_components(M), B, m, m, r)
    raise NotImplementedError("list solve requires m <= 4")


def affine_combine_lists(m: int, r: int, reverse: bool):
    """Component-list combine for the affine monoid ``(A, B)``."""

    def combine(earlier, later):
        A_e, B_e = earlier
        A_l, B_l = later
        if reverse:
            return (
                _lmm(A_e, A_l, m, m, m),
                _ladd(_lmm(A_e, B_l, m, m, r), B_e),
            )
        return (
            _lmm(A_l, A_e, m, m, m),
            _ladd(_lmm(A_l, B_e, m, m, r), B_l),
        )

    return combine


def congruence_combine_lists(m: int, reverse: bool):
    """Component-list combine for the congruence monoid ``(A, B)``."""

    def combine(earlier, later):
        A_e, B_e = earlier
        A_l, B_l = later
        if reverse:
            return (
                _lmm(A_e, A_l, m, m, m),
                _ladd(_lmm_t(_lmm(A_e, B_l, m, m, m), A_e, m, m, m), B_e),
            )
        return (
            _lmm(A_l, A_e, m, m, m),
            _ladd(_lmm_t(_lmm(A_l, B_e, m, m, m), A_l, m, m, m), B_l),
        )

    return combine


def riccati_combine_lists(m: int):
    """Component-list combine for the Riccati (Möbius) monoid ``(A, F, G)``."""

    def combine(earlier, later):
        A_e, F_e, G_e = earlier
        A_l, F_l, G_l = later
        M = _ladd_eye(_lmm(F_e, G_l, m, m, m), m)
        A = _lmm(A_l, _lsolve(M, A_e, m, m), m, m, m)
        F = _ladd(
            F_l,
            _lmm_t(_lmm(A_l, _lsolve(M, F_e, m, m), m, m, m), A_l, m, m, m),
        )
        G = _ladd(
            G_e,
            _lmm(
                _lmm(_lt(A_e, m, m), _lsolve(_lt(M, m, m), G_l, m, m), m, m, m),
                A_e,
                m,
                m,
                m,
            ),
        )
        return A, F, G

    return combine


# ---------------------------------------------------------------------------
# Affine.
# ---------------------------------------------------------------------------


def _affine_scan_s(As, Bs, m, r, *, reverse: bool, exclusive: bool):
    """Stacked affine scan: As (m*m, N), Bs (m*r, N) -> exclusive states."""

    def combine(earlier, later):
        A_e, B_e = earlier
        A_l, B_l = later
        if reverse:
            # Suffix composition: earlier map applies on the outside.
            return (
                _smm(A_e, A_l, m, m, m),
                _smm(A_e, B_l, m, m, r) + B_e,
            )
        return (
            _smm(A_l, A_e, m, m, m),
            _smm(A_l, B_e, m, m, r) + B_l,
        )

    identity = (_seye(m, As.dtype), np.zeros((m * r, 1), Bs.dtype))
    excl = monoid_scan(
        combine,
        identity,
        (As, Bs),
        reverse=reverse,
        combine_lists=affine_combine_lists(m, r, reverse),
        needed=(1,) if exclusive else (0, 1),
    )
    if exclusive:
        return excl[1]
    pair = (As, Bs)
    incl = combine(pair, excl) if reverse else combine(excl, pair)
    return incl[1]


def _affine_impl(
    A: Array, B: Array, *, reverse: bool, exclusive: bool
) -> Array:
    m, r = B.shape[-2], B.shape[-1]
    e = _affine_scan_s(
        _pack3(A), _pack3(B), m, r, reverse=reverse, exclusive=exclusive
    )
    return _unpack3(e, m, r)


def _sshift_lane(X: Array, fill: Array, reverse: bool) -> Array:
    """Shift stacked leaves one step along the lane axis, filling the end."""
    fill = jnp.broadcast_to(fill, X.shape[:-1] + (1,))
    if reverse:
        return jnp.concatenate([fill, X[..., :-1]], axis=-1)
    return jnp.concatenate([X[..., 1:], fill], axis=-1)


def _affine_bwd_s(As, es, ebar_s, m, r, *, reverse: bool, exclusive: bool):
    """Stacked cotangents of the affine scan.

    The adjoint of a linear recurrence is ONE opposite-direction affine
    scan (the true transpose) plus elementwise outer products:

        gbar_k = A~_{k+1}^T gbar_{k+1} + ebar_{k(+1)}   [opposite direction]
        Bbar_k = gbar_k
        Abar_k = gbar_k g_{k-1}^T

    (indices shown for the forward scan; reverse mirrors). Everything is
    stored stacked — (N, m, m) residuals crossing a loop boundary (e.g. a
    leapfrog while_loop) would materialize with ~256x tile padding, enough
    to OOM a 1024-chain NUTS run.
    """
    At = _st(As, m, m)
    if not exclusive:
        # The adjoint of the inclusive scan consumes transitions shifted by
        # one step (identity fill), and pairs gbar with the shifted
        # (exclusive) outputs.
        At = _sshift_lane(At, _seye(m, At.dtype), reverse)
        es = _sshift_lane(es, jnp.zeros((), es.dtype), not reverse)
    gbar = _affine_scan_s(
        At, ebar_s, m, r, reverse=not reverse, exclusive=exclusive
    )
    Abar = _smm_t(gbar, es, m, r, m)
    return Abar, gbar


def _make_affine_parallel(reverse: bool, exclusive: bool):
    """Parallel affine scan with a hand-written transpose (N-major edges).

    The backward calls the *plain* implementation, so higher-order AD
    still works.
    """

    @jax.custom_vjp
    def scan(A, B):
        return _affine_impl(A, B, reverse=reverse, exclusive=exclusive)

    def fwd(A, B):
        m, r = B.shape[-2], B.shape[-1]
        As = _pack3(A)
        es = _affine_scan_s(
            As, _pack3(B), m, r, reverse=reverse, exclusive=exclusive
        )
        return _unpack3(es, m, r), (As, es)

    def bwd(res, ebar):
        As, es = res
        m, r = ebar.shape[-2], ebar.shape[-1]
        Abar, gbar = _affine_bwd_s(
            As, es, _pack3(ebar), m, r, reverse=reverse, exclusive=exclusive
        )
        return _unpack3(Abar, m, m), _unpack3(gbar, m, r)

    scan.defvjp(fwd, bwd)
    return scan


def _make_affine_parallel_s(reverse: bool, exclusive: bool):
    """The same scan with stacked (m*k, N) operands end to end.

    Used by the fused log-likelihood path so neither the forward nor the
    adjoint ever materializes an (N, m, k) layout (no pack/unpack
    transposes through HBM). ``m``/``r`` are threaded statically.
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def scan(As, Bs, m, r):
        return _affine_scan_s(As, Bs, m, r, reverse=reverse, exclusive=exclusive)

    def fwd(As, Bs, m, r):
        es = _affine_scan_s(
            As, Bs, m, r, reverse=reverse, exclusive=exclusive
        )
        return es, (As, es)

    def bwd(m, r, res, ebar_s):
        As, es = res
        return _affine_bwd_s(
            As, es, ebar_s, m, r, reverse=reverse, exclusive=exclusive
        )

    scan.defvjp(fwd, bwd)
    return scan


_AFFINE_PARALLEL = {
    (rev, exc): _make_affine_parallel(rev, exc)
    for rev in (False, True)
    for exc in (False, True)
}

_AFFINE_PARALLEL_S = {
    (rev, exc): _make_affine_parallel_s(rev, exc)
    for rev in (False, True)
    for exc in (False, True)
}


def affine_scan_stacked(
    As: Array,
    Bs: Array,
    m: int,
    r: int,
    *,
    reverse: bool = False,
    exclusive: bool = True,
) -> Array:
    """Differentiable affine scan on stacked operands.

    ``As``: ``(m*m, N)`` transitions; ``Bs``: ``(m*r, N)`` loads — the
    native layout of the blocked scan (and of the single-pass Pallas
    kernel), so no transposes are paid at either edge.
    """
    return _AFFINE_PARALLEL_S[(reverse, exclusive)](As, Bs, m, r)


def affine_scan(
    A: Array,
    B: Array,
    *,
    reverse: bool = False,
    parallel: bool = True,
    exclusive: bool = True,
) -> Array:
    """Prefix states of the affine recurrence ``g_k = A_k g_prev + B_k``.

    Args:
        A: Transitions, shape ``(n, m, m)``.
        B: Loads, shape ``(n, m, r)`` (or ``(n, m)`` for a single rhs).
        reverse: Run right-to-left (``g_k = A_k g_{k+1} + B_k``).
        parallel: Blocked stacked-scan strategy (default) or the
            sequential oracle.
        exclusive: Return the carry *before* step k (default) rather than
            after it.

    Returns:
        ``e`` with ``e.shape == B.shape``.
    """
    squeeze = B.ndim == 2
    if squeeze:
        B = B[..., None]

    if parallel:
        e = _AFFINE_PARALLEL[(reverse, exclusive)](_dense_transitions(A), B)
    else:
        def step(carry, inputs):
            A_k, B_k = inputs
            new = pdot(A_k, carry) + B_k
            return new, (carry if exclusive else new)

        init = jnp.zeros_like(B[0])
        _, e = jax.lax.scan(step, init, (A, B), reverse=reverse)

    return e[..., 0] if squeeze else e


# ---------------------------------------------------------------------------
# Congruence.
# ---------------------------------------------------------------------------


def _congruence_scan_s(As, Bs, m, *, reverse: bool):
    """Stacked congruence scan: exclusive prefix of g = A g A^T + B."""

    def combine(earlier, later):
        A_e, B_e = earlier
        A_l, B_l = later
        if reverse:
            return (
                _smm(A_e, A_l, m, m, m),
                _smm_t(_smm(A_e, B_l, m, m, m), A_e, m, m, m) + B_e,
            )
        return (
            _smm(A_l, A_e, m, m, m),
            _smm_t(_smm(A_l, B_e, m, m, m), A_l, m, m, m) + B_l,
        )

    identity = (_seye(m, As.dtype), np.zeros((m * m, 1), Bs.dtype))
    _, e = monoid_scan(
        combine,
        identity,
        (As, Bs),
        reverse=reverse,
        combine_lists=congruence_combine_lists(m, reverse),
        needed=(1,),
    )
    return e


def _congruence_impl(A: Array, B: Array, *, reverse: bool) -> Array:
    m = A.shape[-1]
    e = _congruence_scan_s(_pack3(A), _pack3(B), m, reverse=reverse)
    return _unpack3(e, m, m)


def _make_congruence_parallel(reverse: bool):
    """Parallel congruence scan with a hand-written transpose.

    The congruence recurrence is linear in the carry, so its adjoint is an
    opposite-direction congruence scan with transposed transitions:

        gbar_k = A_{k+1}^T gbar_{k+1} A_{k+1} + ebar_{k+1}
        Bbar_k = gbar_k
        Abar_k = (gbar_k + gbar_k^T) A_k g_{k-1}

    (forward-scan indices; g_{k-1} = the exclusive output e_k, symmetric).
    """

    @jax.custom_vjp
    def scan(A, B):
        return _congruence_impl(A, B, reverse=reverse)

    def fwd(A, B):
        m = A.shape[-1]
        As = _pack3(A)
        es = _congruence_scan_s(As, _pack3(B), m, reverse=reverse)
        return _unpack3(es, m, m), (As, es)

    def bwd(res, ebar):
        As, es = res
        m = ebar.shape[-1]
        gbar = _congruence_scan_s(
            _st(As, m, m), _pack3(ebar), m, reverse=not reverse
        )
        S = gbar + _st(gbar, m, m)
        Abar = _smm(_smm(S, As, m, m, m), es, m, m, m)
        return _unpack3(Abar, m, m), _unpack3(gbar, m, m)

    scan.defvjp(fwd, bwd)
    return scan


_CONGRUENCE_PARALLEL = {
    rev: _make_congruence_parallel(rev) for rev in (False, True)
}


def congruence_scan(
    A: Array,
    B: Array,
    *,
    reverse: bool = False,
    parallel: bool = True,
) -> Array:
    """Exclusive prefix of the congruence recurrence ``g_k = A_k g A_k^T + B_k``.

    Propagates a symmetric matrix carry (e.g. the backward pass of the
    symmetric quasiseparable inverse). Associative with the combine
    ``(A_l A_e, A_l B_e A_l^T + B_l)``.

    Args:
        A: Transitions, shape ``(n, m, m)``.
        B: Symmetric loads, shape ``(n, m, m)``.
        reverse: Run right-to-left and return the right-exclusive prefix.
        parallel: Blocked stacked-scan strategy (default) or sequential.
    """
    if parallel:
        return _CONGRUENCE_PARALLEL[reverse](_dense_transitions(A), B)

    def step(carry, inputs):
        A_k, B_k = inputs
        return pdot(pdot(A_k, carry), A_k.T) + B_k, carry

    init = jnp.zeros_like(B[0])
    _, e = jax.lax.scan(step, init, (A, B), reverse=reverse)
    return e


# ---------------------------------------------------------------------------
# Riccati.
# ---------------------------------------------------------------------------


def riccati_scan(
    d: Array,
    p: Array,
    q: Array,
    a: Array,
    *,
    parallel: bool = True,
) -> Array:
    """Exclusive prefix of the symmetric Riccati covariance flow.

    Propagates ``F_0 = 0`` through::

        c2_k  = d_k - p_k^T F_k p_k
        F_{k+1} = a_k F_k a_k^T + (q_k - a_k F_k p_k)(q_k - a_k F_k p_k)^T / c2_k

    and returns the stack ``F`` of shape ``(n, m, m)`` (``F_k`` before step
    ``k``). This single flow drives both the quasiseparable Cholesky
    factorization and the symmetric inverse; the per-step emissions differ
    but the carry is shared.

    The parallel strategy rewrites the flow in matrix-fraction form: each
    step is the linear-fractional map encoded by the triple ``(A, F, G)``::

        A_k = a_k - q_k p_k^T / d_k
        F_k = q_k q_k^T / d_k
        G_k = -p_k p_k^T / d_k

    and two maps merge through ``M = I + F_e @ G_l``::

        A = A_l M^{-1} A_e
        F = F_l + A_l M^{-1} F_e A_l^T
        G = G_e + A_e^T M^{-T} G_l A_e

    which is associative, so the blocked scan evaluates all prefixes in
    ~(block + log N) depth at the cost of m x m solves per merge.
    """
    if not parallel:
        def step(F, inputs):
            d_k, p_k, q_k, a_k = inputs
            Fp = pdot(F, p_k)
            c2 = d_k - pdot(p_k, Fp)
            u = q_k - pdot(a_k, Fp)
            F_next = pdot(pdot(a_k, F), a_k.T) + jnp.outer(u, u) / c2
            return F_next, F

        init = jnp.zeros_like(jnp.outer(q[0], q[0]))
        _, F = jax.lax.scan(step, init, (d, p, q, a))
        return F

    return _riccati_parallel(d, p, q, _dense_transitions(a))


def _riccati_scan_s(d, ps, qs, as_, m):
    """Stacked Riccati flow: returns the exclusive prefix F (m*m, N)."""
    inv_d = 1.0 / d
    A0 = as_ - _souter(qs, ps) * inv_d
    F0 = _souter(qs, qs) * inv_d
    G0 = -_souter(ps, ps) * inv_d

    def combine(earlier, later):
        A_e, F_e, G_e = earlier
        A_l, F_l, G_l = later
        M = _sadd_eye(_smm(F_e, G_l, m, m, m), m)
        A = _smm(A_l, _ssolve(M, A_e, m, m), m, m, m)
        F = F_l + _smm_t(
            _smm(A_l, _ssolve(M, F_e, m, m), m, m, m), A_l, m, m, m
        )
        G = G_e + _smm(
            _smm(
                _st(A_e, m, m),
                _ssolve(_st(M, m, m), G_l, m, m),
                m, m, m,
            ),
            A_e, m, m, m,
        )
        return A, F, G

    identity = (
        _seye(m, ps.dtype),
        np.zeros((m * m, 1), ps.dtype),
        np.zeros((m * m, 1), ps.dtype),
    )
    # The merge's m x m solve only lowers in Mosaic via the closed-form
    # adjugate branches. m = 4 stays on the blocked XLA strategy even
    # though _lsolve now supports it: the block-Schur combine's live
    # temporaries cost ~23 MB of scoped VMEM at ANY block size (measured
    # 2026-08-20, v5e OOM at block 16 and 8) — the single-pass kernel's
    # structure, not its tiling, is what doesn't fit fat combines. The XLA
    # strategy with the stacked Schur solve runs the 2-term celerite
    # (m=4) N=1e5 log-lik in 1.36 ms vs 353 ms through the batched-LU
    # fallback it replaces.
    _, F, _ = monoid_scan(
        combine,
        identity,
        (A0, F0, G0),
        pallas_ok=m <= 3,
        combine_lists=riccati_combine_lists(m) if m <= 3 else None,
        needed=(1,),
    )
    return F


def _riccati_impl(d, p, q, a):
    m = p.shape[1]
    F = _riccati_scan_s(d, p.T, q.T, _pack3(_dense_transitions(a)), m)
    return _unpack3(F, m, m)


@jax.custom_vjp
def _riccati_parallel(d, p, q, a):
    return _riccati_impl(d, p, q, a)


def _riccati_parallel_fwd(d, p, q, a):
    m = p.shape[1]
    ps, qs, as_ = p.T, q.T, _pack3(a)
    Fs = _riccati_scan_s(d, ps, qs, as_, m)
    # Stacked residuals: see the affine fwd note on tile padding.
    return _unpack3(Fs, m, m), (d, ps, qs, as_, Fs)


def _riccati_bwd_s(res, Ybar_s):
    """Adjoint of the Riccati flow via a congruence scan (all stacked).

    Linearizing ``phi(F) = a F a^T + u u^T / c2`` (``u = q - a F p``,
    ``c2 = d - p^T F p``) around the saved forward states gives

        (dphi/dF)^T [G] = A~^T G A~,   with  A~ = a - u p^T / c2,

    so the state adjoint ``Fbar_k = Ybar_k + A~_k^T Fbar_{k+1} A~_k`` is a
    *reverse congruence scan* with transitions ``A~^T`` and loads ``Ybar``
    — the same primitive as the forward family, at the same O(N) cost.
    Input cotangents are then elementwise in the saved states, with
    ``S = Gbar + Gbar^T`` where ``Gbar_k = Fbar_{k+1}``:

        qbar = S u / c2
        dbar = -(u . S u) / (2 c2^2)
        pbar = -F a^T S u / c2 + (u . S u) / c2^2 * F p
        abar = S a F - S u (F p)^T / c2
    """
    d, ps, qs, as_, Fs = res
    m = ps.shape[0]

    Fp = _smv(Fs, ps, m, m)
    c2 = d - jnp.sum(ps * Fp, axis=0)
    u = qs - _smv(as_, Fp, m, m)
    inv_c2 = 1.0 / c2
    atil = as_ - _souter(u, ps) * inv_c2

    # Gbar_k = Fbar_{k+1}: the right-exclusive suffix of the adjoint flow,
    # which is exactly what step k's input cotangents consume.
    Gbar = _congruence_scan_s(_st(atil, m, m), Ybar_s, m, reverse=True)

    S = Gbar + _st(Gbar, m, m)
    Su = _smv(S, u, m, m)
    uSu = jnp.sum(u * Su, axis=0)

    qbar = Su * inv_c2
    dbar = -0.5 * uSu * inv_c2**2
    aTSu = _smv(_st(as_, m, m), Su, m, m)
    pbar = -_smv(Fs, aTSu, m, m) * inv_c2 + (uSu * inv_c2**2) * Fp
    abar = _smm(_smm(S, as_, m, m, m), Fs, m, m, m) - _souter(
        Su, Fp
    ) * inv_c2
    return dbar, pbar, qbar, abar


def _riccati_parallel_bwd(res, Ybar):
    m = res[1].shape[0]
    dbar, pbar, qbar, abar = _riccati_bwd_s(res, _pack3(Ybar))
    return dbar, pbar.T, qbar.T, _unpack3(abar, m, m)


_riccati_parallel.defvjp(_riccati_parallel_fwd, _riccati_parallel_bwd)


@jax.custom_vjp
def riccati_scan_stacked(d: Array, ps: Array, qs: Array, as_: Array) -> Array:
    """Differentiable exclusive Riccati flow on stacked operands.

    ``d``: ``(N,)`` diagonal; ``ps``/``qs``: ``(m, N)`` generators;
    ``as_``: ``(m*m, N)`` dense transitions. Returns the stacked exclusive
    prefix ``F`` of shape ``(m*m, N)`` — no layout changes at either edge,
    for the fused log-likelihood path.
    """
    return _riccati_scan_s(d, ps, qs, as_, ps.shape[0])


def _riccati_stacked_fwd(d, ps, qs, as_):
    Fs = _riccati_scan_s(d, ps, qs, as_, ps.shape[0])
    return Fs, (d, ps, qs, as_, Fs)


riccati_scan_stacked.defvjp(_riccati_stacked_fwd, _riccati_bwd_s)


def _dense_transitions(A: Array) -> Array:
    """Densify lazily block-diagonal transitions for the parallel strategy.

    The blocked monoid scan composes transition products whose intermediate
    results are dense anyway, so the lazy Block structure buys nothing
    there (the sequential strategy keeps Blocks lazy).
    """
    from tinygp_tpu.solvers.quasisep.block import Block, ensure_dense

    if isinstance(A, Block):
        return jax.vmap(ensure_dense)(A)
    return A
