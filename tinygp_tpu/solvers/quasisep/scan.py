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

- ``parallel=False``: a sequential ``lax.scan`` — O(N m^2) work, O(N) depth.
  The oracle path; also fastest on CPU for small m.
- ``parallel=True``: ``lax.associative_scan`` — O(N m^3 log N) work, O(log N)
  depth. **The TPU default**: the sequential path serializes completely on
  an accelerator, while the associative form keeps the VPU/MXU busy across
  the whole batch. The Riccati flow composes as a linear-fractional (Möbius)
  map on matrix fractions, so its associative combine solves small m×m
  systems per merge (reference math: ``solvers/quasisep/ops.py:368-386``; see
  also Foreman-Mackey et al. 2017 for the celerite factorization).

Both strategies return the *exclusive* prefix (the carry *before* step k),
which is what the emission formulas consume.
"""

from __future__ import annotations

__all__ = ["affine_scan", "congruence_scan", "riccati_scan"]

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import JAXArray


def _solve_small(M: JAXArray, B: JAXArray) -> JAXArray:
    """Batched ``solve(M, B)`` specialized for the tiny state dimensions of
    quasiseparable models.

    For m <= 3, uses the closed-form adjugate inverse — pure VPU arithmetic
    with no LU custom-call, which both compiles and runs far faster on TPU
    inside an associative-scan combine. Falls back to ``jnp.linalg.solve``
    for larger m.
    """
    m = M.shape[-1]
    if m == 1:
        return B / M[..., :1, :1]
    if m == 2:
        a = M[..., 0, 0]
        b = M[..., 0, 1]
        c = M[..., 1, 0]
        d = M[..., 1, 1]
        det = a * d - b * c
        inv = (
            jnp.stack(
                [
                    jnp.stack([d, -b], axis=-1),
                    jnp.stack([-c, a], axis=-1),
                ],
                axis=-2,
            )
            / det[..., None, None]
        )
        return inv @ B
    if m == 3:
        # Adjugate (cofactor-transpose) inverse.
        a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
        g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
        A = e * i - f * h
        Bc = -(d * i - f * g)
        C = d * h - e * g
        D = -(b * i - c * h)
        E = a * i - c * g
        F = -(a * h - b * g)
        G = b * f - c * e
        H = -(a * f - c * d)
        I = a * e - b * d
        det = a * A + b * Bc + c * C
        inv = (
            jnp.stack(
                [
                    jnp.stack([A, D, G], axis=-1),
                    jnp.stack([Bc, E, H], axis=-1),
                    jnp.stack([C, F, I], axis=-1),
                ],
                axis=-2,
            )
            / det[..., None, None]
        )
        return inv @ B
    return jnp.linalg.solve(M, B)


def _exclusive_fwd(x: JAXArray) -> JAXArray:
    """Shift an inclusive forward scan to exclusive (prepend zero)."""
    return jnp.concatenate((jnp.zeros_like(x[:1]), x[:-1]), axis=0)


def _exclusive_bwd(x: JAXArray) -> JAXArray:
    """Shift an inclusive reverse scan to exclusive (append zero)."""
    return jnp.concatenate((x[1:], jnp.zeros_like(x[-1:])), axis=0)


def affine_scan(
    A: JAXArray,
    B: JAXArray,
    *,
    reverse: bool = False,
    parallel: bool = True,
    exclusive: bool = True,
) -> JAXArray:
    """Prefix states of the affine recurrence ``g_k = A_k g_prev + B_k``.

    Args:
        A: Transitions, shape ``(n, m, m)``.
        B: Loads, shape ``(n, m, r)`` (or ``(n, m)`` for a single rhs).
        reverse: If ``True``, the recurrence runs right-to-left
            (``g_k = A_k g_{k+1} + B_k``) and the prefix is taken from the
            right.
        parallel: Select the associative-scan strategy (default) or the
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
        def combine(left, right):
            A_l, B_l = left
            A_r, B_r = right
            return A_r @ A_l, A_r @ B_l + B_r

        _, g = jax.lax.associative_scan(combine, (A, B), reverse=reverse)
        if exclusive:
            g = _exclusive_bwd(g) if reverse else _exclusive_fwd(g)
        e = g
    else:
        def step(carry, inputs):
            A_k, B_k = inputs
            new = A_k @ carry + B_k
            return new, (carry if exclusive else new)

        init = jnp.zeros_like(B[0])
        _, e = jax.lax.scan(step, init, (A, B), reverse=reverse)

    return e[..., 0] if squeeze else e


def congruence_scan(
    A: JAXArray,
    B: JAXArray,
    *,
    reverse: bool = False,
    parallel: bool = True,
) -> JAXArray:
    """Exclusive prefix of the congruence recurrence ``g_k = A_k g A_k^T + B_k``.

    This propagates a symmetric matrix carry (e.g. the backward pass of the
    symmetric quasiseparable inverse). Composition is associative with the
    combine ``(A_r A_l, A_r B_l A_r^T + B_r)``.

    Args:
        A: Transitions, shape ``(n, m, m)``.
        B: Symmetric loads, shape ``(n, m, m)``.
        reverse: Run right-to-left and return the right-exclusive prefix.
        parallel: Associative scan (default) or sequential oracle.
    """
    if parallel:
        def combine(left, right):
            A_l, B_l = left
            A_r, B_r = right
            return A_r @ A_l, A_r @ B_l @ A_r.mT + B_r

        _, g = jax.lax.associative_scan(combine, (A, B), reverse=reverse)
        return _exclusive_bwd(g) if reverse else _exclusive_fwd(g)

    def step(carry, inputs):
        A_k, B_k = inputs
        return A_k @ carry @ A_k.T + B_k, carry

    init = jnp.zeros_like(B[0])
    _, e = jax.lax.scan(step, init, (A, B), reverse=reverse)
    return e


def riccati_scan(
    d: JAXArray,
    p: JAXArray,
    q: JAXArray,
    a: JAXArray,
    *,
    parallel: bool = True,
) -> JAXArray:
    """Exclusive prefix of the symmetric Riccati covariance flow.

    Propagates ``F_0 = 0`` through::

        c2_k  = d_k - p_k^T F_k p_k
        F_{k+1} = a_k F_k a_k^T + (q_k - a_k F_k p_k)(q_k - a_k F_k p_k)^T / c2_k

    and returns the stack ``F`` of shape ``(n, m, m)`` (``F_k`` before step
    ``k``). This single flow drives both the quasiseparable Cholesky
    factorization and the symmetric inverse; the per-step emissions differ
    but the carry is shared.

    The parallel strategy rewrites the flow in matrix-fraction form: each
    step acts on homogeneous coordinates as a linear-fractional map encoded
    by the triple ``(A, F, G)`` with::

        A_k = a_k - q_k p_k^T / d_k
        F_k = q_k q_k^T / d_k
        G_k = -p_k p_k^T / d_k

    and two such maps merge through ``M = I + F_l @ G_r``::

        A = A_r M^{-1} A_l
        F = F_r + A_r M^{-1} F_l A_r^T
        G = G_l + A_l^T M^{-T} G_r A_l

    which is associative, so ``lax.associative_scan`` evaluates all prefixes
    in O(log N) depth at the cost of m×m solves per merge.
    """
    if not parallel:
        def step(F, inputs):
            d_k, p_k, q_k, a_k = inputs
            c2 = d_k - p_k @ F @ p_k
            u = q_k - a_k @ F @ p_k
            F_next = a_k @ F @ a_k.T + jnp.outer(u, u) / c2
            return F_next, F

        init = jnp.zeros_like(jnp.outer(q[0], q[0]))
        _, F = jax.lax.scan(step, init, (d, p, q, a))
        return F

    m = p.shape[1]
    eye = jnp.eye(m, dtype=p.dtype)
    inv_d = 1.0 / d
    A0 = a - jnp.einsum("n,nj,nk->njk", inv_d, q, p)
    F0 = jnp.einsum("n,nj,nk->njk", inv_d, q, q)
    G0 = -jnp.einsum("n,nj,nk->njk", inv_d, p, p)

    def combine(left, right):
        A_l, F_l, G_l = left
        A_r, F_r, G_r = right
        M = eye + F_l @ G_r
        A = A_r @ _solve_small(M, A_l)
        F = F_r + A_r @ _solve_small(M, F_l) @ A_r.mT
        G = G_l + A_l.mT @ _solve_small(M.mT, G_r) @ A_l
        return A, F, G

    _, F, _ = jax.lax.associative_scan(combine, (A0, F0, G0))
    return _exclusive_fwd(F)
