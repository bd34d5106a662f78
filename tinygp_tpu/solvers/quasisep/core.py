"""The quasiseparable matrix class family.

Behavioral parity: ``/root/reference/src/tinygp/solvers/quasisep/core.py``
(definition follows Eidelman & Gohberg 1999 with the symmetric-friendly
relabeling; see also Foreman-Mackey et al. 2017 for the celerite special
case). An order-``m`` quasiseparable matrix stores, per row ``k``, generator
vectors ``p_k, q_k`` (m,) and a transition ``a_k`` (m, m), with::

    M[i, j] = p_i^T (a_{i-1} @ ... @ a_{j+1}) q_j        (i > j)
    M[i, i] = d_i
    M[i, j] = q_i^T (a_{i+1}^T @ ... @ a_{j-1}^T) p_j    (i < j, transposed
                                                          convention)

All O(N) algorithms route through :mod:`tinygp_tpu.solvers.quasisep.ops` and
accept a ``parallel`` flag selecting sequential (oracle) vs associative-scan
(TPU-fast) execution.
"""

from __future__ import annotations

__all__ = [
    "DiagQSM",
    "StrictLowerTriQSM",
    "StrictUpperTriQSM",
    "LowerTriQSM",
    "UpperTriQSM",
    "SquareQSM",
    "SymmQSM",
]

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.linalg import block_diag

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.solvers.quasisep.block import ensure_dense
from tinygp_tpu.utils.module import Module


def _ops():
    """The O(N) algorithm module, imported late to break the import cycle
    (ops builds on the classes defined here)."""
    from tinygp_tpu.solvers.quasisep import ops

    return ops


def _matvec_shape(matmul):
    """Normalize the rhs to 2-D inside, restoring the caller's shape after."""

    @functools.wraps(matmul)
    def wrapped(self: Any, x: Array, **kwargs: Any) -> Array:
        shape = x.shape
        result = matmul(self, jnp.reshape(x, (shape[0], -1)), **kwargs)
        return jnp.reshape(result, shape)

    return wrapped


class QSM(Module):
    """Base class: operator sugar shared by all square quasiseparable types."""

    # Outrank jax arrays so our overloads win in mixed expressions.
    __array_priority__ = 2000

    def transpose(self) -> Any:
        raise NotImplementedError("each QSM type defines its transpose")

    def _terms(self) -> tuple[Any, ...]:
        """Component matrices whose matvecs sum to this matrix's.

        Leaf types (diagonal, strict triangles) implement ``matmul``
        directly instead; composites get theirs from this hook.
        """
        raise NotImplementedError

    def _map_parts(self, f: Any) -> QSM:
        """Rebuild a composite with ``f`` applied to each stored part."""
        import dataclasses

        parts = {
            fl.name: f(getattr(self, fl.name))
            for fl in dataclasses.fields(self)
        }
        return type(self)(**parts)

    @_matvec_shape
    def matmul(self, x: Array, *, parallel: bool = False) -> Array:
        """Dense matvec/matmat product ``self @ x``."""
        out = None
        for term in self._terms():
            y = term.matmul(x, parallel=parallel)
            out = y if out is None else out + y
        return out

    def scale(self, other: Array) -> QSM:
        """Scalar multiple of this matrix, staying quasiseparable."""
        return self._map_parts(lambda part: part.scale(other))

    def __neg__(self) -> QSM:
        return self._map_parts(lambda part: -part)

    T = property(
        lambda self: self.transpose(), doc="Transpose (alias)."
    )

    def to_dense(self) -> Array:
        """Materialize (testing only: O(N^2) memory)."""
        return self.matmul(jnp.eye(self.shape[0], dtype=self.dtype))

    @property
    def dtype(self) -> Any:
        return jax.tree_util.tree_leaves(self)[0].dtype

    @property
    def shape(self) -> tuple[int, int]:
        n = jax.tree_util.tree_leaves(self)[0].shape[0]
        return (n, n)

    def _check_scale_operand(self, other: Any) -> Any:
        if jnp.ndim(other) > 1:
            raise ValueError(
                "a QSM can be scaled by a scalar or per-row vector only"
            )
        return other

    def __add__(self, other: Any) -> Any:
        return _ops().elementwise_add(self, other)

    def __sub__(self, other: Any) -> Any:
        return _ops().elementwise_add(self, -other)

    def __mul__(self, other: Any) -> Any:
        if isinstance(other, QSM):
            return _ops().elementwise_mul(self, other)
        return self.scale(self._check_scale_operand(other))

    def __rmul__(self, other: Any) -> Any:
        return self.scale(self._check_scale_operand(other))

    def __matmul__(self, other: Any) -> Any:
        if isinstance(other, QSM):
            return _ops().qsm_mul(self, other)
        return self.matmul(other)

    def __rmatmul__(self, other: Any) -> Any:
        # x @ M  ==  (M^T @ x^T)^T, and QSM transposes are free.
        return (self.T @ other.transpose()).transpose()


class DiagQSM(QSM):
    """A diagonal matrix: order-0 quasiseparable.

    Args:
        d (n,): The diagonal entries.
    """

    d: Array

    def transpose(self) -> DiagQSM:
        return self

    @_matvec_shape
    def matmul(self, x: Array, *, parallel: bool = False) -> Array:
        del parallel  # diagonal scaling has no scan to parallelize
        return x * self.d[:, None]

    def scale(self, other: Array) -> DiagQSM:
        return DiagQSM(d=self.d * other)

    def self_add(self, other: DiagQSM) -> DiagQSM:
        return DiagQSM(d=self.d + other.d)

    def self_mul(self, other: DiagQSM) -> DiagQSM:
        return DiagQSM(d=self.d * other.d)

    def __neg__(self) -> DiagQSM:
        return DiagQSM(d=-self.d)


class StrictLowerTriQSM(QSM):
    """A strictly lower triangular quasiseparable matrix.

    Args:
        p (n, m): Left (row) generators.
        q (n, m): Right (column) generators.
        a (n, m, m): Transition matrices.
    """

    p: Array
    q: Array
    a: Array

    def transpose(self) -> StrictUpperTriQSM:
        return StrictUpperTriQSM(p=self.p, q=self.q, a=self.a)

    @_matvec_shape
    def matmul(self, x: Array, *, parallel: bool = False) -> Array:
        return _ops().strict_lower_matmul(
            self.p, self.q, self.a, x, parallel=parallel
        )

    def scale(self, other: Array) -> StrictLowerTriQSM:
        return StrictLowerTriQSM(p=self.p * other, q=self.q, a=self.a)

    def self_add(self, other: StrictLowerTriQSM) -> StrictLowerTriQSM:
        """Sum: concatenate generators, block-diagonal the transitions."""

        @jax.vmap
        def per_row(pa, qa, aa, pb, qb, ab):
            return StrictLowerTriQSM(
                p=jnp.concatenate((pa, pb)),
                q=jnp.concatenate((qa, qb)),
                a=block_diag(ensure_dense(aa), ensure_dense(ab)),
            )

        return per_row(self.p, self.q, self.a, other.p, other.q, other.a)

    def self_mul(self, other: StrictLowerTriQSM) -> StrictLowerTriQSM:
        """Hadamard product: generators/transitions combine as Kronecker
        products, so the result's order is the product of the orders."""
        m1 = self.p.shape[1]
        m2 = other.p.shape[1]
        n = self.p.shape[0]

        def kron_vec(u, v):
            return (u[:, :, None] * v[:, None, :]).reshape(n, m1 * m2)

        a1 = jax.vmap(ensure_dense)(self.a)
        a2 = jax.vmap(ensure_dense)(other.a)
        a = jnp.einsum("nij,nkl->nikjl", a1, a2).reshape(n, m1 * m2, m1 * m2)
        return StrictLowerTriQSM(
            p=kron_vec(self.p, other.p), q=kron_vec(self.q, other.q), a=a
        )

    def __neg__(self) -> StrictLowerTriQSM:
        return StrictLowerTriQSM(p=-self.p, q=self.q, a=self.a)


class StrictUpperTriQSM(QSM):
    """A strictly upper triangular quasiseparable matrix.

    Stored as the transpose view of a :class:`StrictLowerTriQSM` (same
    fields, transposed semantics), so ``lower.transpose()`` is free.
    """

    p: Array
    q: Array
    a: Array

    def transpose(self) -> StrictLowerTriQSM:
        return StrictLowerTriQSM(p=self.p, q=self.q, a=self.a)

    @_matvec_shape
    def matmul(self, x: Array, *, parallel: bool = False) -> Array:
        return _ops().strict_upper_matmul(
            self.p, self.q, self.a, x, parallel=parallel
        )

    def scale(self, other: Array) -> StrictUpperTriQSM:
        return StrictUpperTriQSM(p=self.p, q=self.q * other, a=self.a)

    def self_add(self, other: StrictUpperTriQSM) -> StrictUpperTriQSM:
        return self.T.self_add(other.T).T

    def self_mul(self, other: StrictUpperTriQSM) -> StrictUpperTriQSM:
        return self.T.self_mul(other.T).T

    def __neg__(self) -> StrictUpperTriQSM:
        return StrictUpperTriQSM(p=-self.p, q=self.q, a=self.a)


class LowerTriQSM(QSM):
    """A lower triangular quasiseparable matrix (diagonal + strict lower)."""

    diag: DiagQSM
    lower: StrictLowerTriQSM

    def transpose(self) -> UpperTriQSM:
        return UpperTriQSM(diag=self.diag, upper=self.lower.T)

    def _terms(self):
        return (self.diag, self.lower)

    def inv(self) -> LowerTriQSM:
        """Closed-form inverse: also lower triangular quasiseparable.

        With ``g = 1/d``, the inverse has diagonal ``g``, generators
        ``(-g p, g q)`` and transitions ``a - (g q) p^T`` (fold the solve's
        diagonal correction into the transition).
        """
        d = self.diag.d
        p, q, a = self.lower.p, self.lower.q, self.lower.a
        g = 1.0 / d
        v = g[:, None] * q
        return LowerTriQSM(
            diag=DiagQSM(d=g),
            lower=StrictLowerTriQSM(
                p=-g[:, None] * p, q=v, a=a - jax.vmap(jnp.outer)(v, p)
            ),
        )

    @_matvec_shape
    def solve(self, y: Array, *, parallel: bool = False) -> Array:
        """Forward substitution: solve ``L @ x = y``."""
        return _ops().lower_triangular_solve(
            self.diag.d, self.lower.p, self.lower.q, self.lower.a, y,
            parallel=parallel,
        )


class UpperTriQSM(QSM):
    """An upper triangular quasiseparable matrix (diagonal + strict upper)."""

    diag: DiagQSM
    upper: StrictUpperTriQSM

    def transpose(self) -> LowerTriQSM:
        return LowerTriQSM(diag=self.diag, lower=self.upper.T)

    def _terms(self):
        return (self.diag, self.upper)

    def inv(self) -> UpperTriQSM:
        return self.T.inv().T

    @_matvec_shape
    def solve(self, y: Array, *, parallel: bool = False) -> Array:
        """Backward substitution: solve ``U @ x = y``."""
        return _ops().upper_triangular_solve(
            self.diag.d, self.upper.p, self.upper.q, self.upper.a, y,
            parallel=parallel,
        )


class SquareQSM(QSM):
    """A general square quasiseparable matrix (diag + lower + upper)."""

    diag: DiagQSM
    lower: StrictLowerTriQSM
    upper: StrictUpperTriQSM

    def transpose(self) -> SquareQSM:
        return SquareQSM(
            diag=self.diag, lower=self.upper.T, upper=self.lower.T
        )

    def _terms(self):
        return (self.diag, self.lower, self.upper)

    def gram(self) -> SymmQSM:
        """``self.T @ self`` as a symmetric quasiseparable matrix."""
        M = self.T @ self
        return SymmQSM(diag=M.diag, lower=M.lower)

    @jax.jit
    def inv(self) -> SquareQSM:
        """The two-pass (forward Riccati-like + backward) general inverse.

        The forward pass eliminates the lower part while tracking the
        coupling ``f`` between lower and upper generator histories; the
        backward pass reconstructs the inverse's diagonal and generators
        from the suffix state ``z``.
        """
        d = self.diag.d
        p, q, a = self.lower.p, self.lower.q, self.lower.a
        h, g, b = self.upper.p, self.upper.q, self.upper.a

        def forward(f, inputs):
            d_k, p_k, q_k, a_k, g_k, h_k, b_k = inputs
            fh = pdot(f, h_k)
            fbT = pdot(f, b_k.T)
            left = q_k - pdot(a_k, fh)
            right = g_k - pdot(p_k, fbT)
            ig = 1.0 / (d_k - pdot(p_k, fh))
            s = ig * left
            ell = a_k - jnp.outer(s, p_k)
            v = ig * right
            delta = b_k - jnp.outer(v, h_k)
            f_next = pdot(a_k, fbT) + ig * jnp.outer(left, right)
            return f_next, (ig, s, ell, v, delta)

        init = jnp.zeros((q.shape[1], g.shape[1]), dtype=q.dtype)
        _, (ig, s, ell, v, delta) = jax.lax.scan(
            forward, init, (d, p, q, a, g, h, b)
        )

        def backward(z, inputs):
            ig_k, p_k, a_k, h_k, b_k, s_k, v_k = inputs
            zs = pdot(z, s_k)
            za = pdot(z, a_k)
            lam = ig_k + pdot(v_k, zs)
            t = pdot(v_k, za) - lam * p_k
            u = pdot(b_k.T, zs) - lam * h_k
            z_prev = (
                pdot(b_k.T, za)
                - jnp.outer(u + lam * h_k, p_k)
                - jnp.outer(h_k, t)
            )
            return z_prev, (lam, t, u)

        init = jnp.zeros((h.shape[1], p.shape[1]), dtype=h.dtype)
        _, (lam, t, u) = jax.lax.scan(
            backward, init, (ig, p, a, h, b, s, v), reverse=True
        )
        return SquareQSM(
            diag=DiagQSM(d=lam),
            lower=StrictLowerTriQSM(p=t, q=s, a=ell),
            upper=StrictUpperTriQSM(p=u, q=v, a=delta),
        )


class SymmQSM(QSM):
    """A symmetric quasiseparable matrix (upper part mirrors the lower)."""

    diag: DiagQSM
    lower: StrictLowerTriQSM

    def transpose(self) -> SymmQSM:
        return self

    def _terms(self):
        return (self.diag, self.lower, self.lower.transpose())

    def inv(self, *, parallel: bool = False) -> SymmQSM:
        """The inverse, which is again symmetric quasiseparable."""
        lam, t, s, ell = _ops().symm_solve_generators(
            self.diag.d, self.lower.p, self.lower.q, self.lower.a,
            parallel=parallel,
        )
        return SymmQSM(
            diag=DiagQSM(d=lam), lower=StrictLowerTriQSM(p=t, q=s, a=ell)
        )

    def cholesky(self, *, parallel: bool = False) -> LowerTriQSM:
        """The lower Cholesky factor ``L`` with ``L @ L.T = self``."""
        c, w = _ops().symm_cholesky(
            self.diag.d, self.lower.p, self.lower.q, self.lower.a,
            parallel=parallel,
        )
        return LowerTriQSM(
            diag=DiagQSM(d=c),
            lower=StrictLowerTriQSM(p=self.lower.p, q=w, a=self.lower.a),
        )
