"""Rectangular quasiseparable matrices.

Behavioral parity: ``/root/reference/src/tinygp/solvers/quasisep/general.py``.
These represent cross-covariance matrices ``K(X1, X2)`` between *different*
coordinate sets, which is what makes O(N + M) predictive means possible. The
row set X1 need not be aligned with the column set X2; each row carries the
index ``idx`` of the last column at-or-before it, splitting the row into a
"lower" (past) and "upper" (future) contribution.
"""

from __future__ import annotations

__all__ = ["GeneralQSM"]

import functools
from typing import Any

import jax
import jax.numpy as jnp

from tinygp_tpu.helpers import Array
from tinygp_tpu.solvers.quasisep.scan import affine_scan
from tinygp_tpu.utils.module import Module


def _matvec_shape(matmul):
    @functools.wraps(matmul)
    def wrapped(self: Any, x: Array) -> Array:
        out_shape = (-1,) + x.shape[1:]
        result = matmul(self, jnp.reshape(x, (x.shape[0], -1)))
        return jnp.reshape(result, out_shape)

    return wrapped


class GeneralQSM(Module):
    """An ``(n1, n2)`` rectangular quasiseparable matrix of order ``m``.

    Args:
        pl (n1, m): Row generators for the lower (past) part, already
            propagated from the nearest past column time to the row time.
        ql (n2, m): Column generators for the lower part.
        pu (n2, m): Column generators for the upper (future) part.
        qu (n1, m): Row generators for the upper part, already propagated to
            the nearest future column time.
        a (n2, m, m): Transitions along the column coordinate axis.
        idx (n1,): Per row, the index of the last column at-or-before it
            (-1 when the row precedes every column).
    """

    pl: Array
    ql: Array
    pu: Array
    qu: Array
    a: Array
    idx: Array

    @property
    def shape(self) -> tuple[int, int]:
        return (self.pl.shape[0], self.ql.shape[0])

    @jax.jit
    @_matvec_shape
    def matmul(self, x: Array) -> Array:
        """``self @ x`` via one forward and one backward scan over columns."""
        n2 = self.ql.shape[0]

        # Lower/past: inclusive prefix f_k = a_k f_{k-1} + ql_k x_k; row i
        # reads f at its anchor column idx_i.
        f = affine_scan(
            self.a,
            jnp.einsum("nj,nk->njk", self.ql, x, precision="highest"),
            parallel=False,
            exclusive=False,
        )
        anchor = jnp.clip(self.idx, 0, n2 - 1)
        valid = (self.idx >= 0) & (self.idx < n2)
        lower = jax.vmap(jnp.dot)(
            jnp.where(valid[:, None], self.pl, 0.0), f[anchor]
        )

        # Upper/future: inclusive suffix g_k = a_{k+1}^T g_{k+1} + pu_k x_k;
        # row i reads g at idx_i + 1. The transitions lag by one step, so
        # roll them (the rolled-in last element never reaches an output).
        # tree_map keeps lazy Block transitions lazy.
        a_next = jax.tree_util.tree_map(
            lambda x: jnp.roll(x, -1, axis=0), self.a
        )
        g = affine_scan(
            a_next.mT,
            jnp.einsum("nj,nk->njk", self.pu, x, precision="highest"),
            reverse=True,
            parallel=False,
            exclusive=False,
        )
        anchor = jnp.clip(self.idx + 1, 0, n2 - 1)
        valid = (self.idx >= -1) & (self.idx + 1 < n2)
        upper = jax.vmap(jnp.dot)(
            jnp.where(valid[:, None], self.qu, 0.0), g[anchor]
        )

        return lower + upper

    def __matmul__(self, other: Any) -> Any:
        return self.matmul(other)
