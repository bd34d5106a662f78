"""Observation-noise models.

API parity: ``/root/reference/src/tinygp/noise.py:27-236`` (``Noise``
protocol with ``diagonal``/``+``/``@``/``to_qsm``; ``Diagonal``, ``Dense``
and ``Banded`` concrete models). ``Banded`` is represented as an order-J
quasiseparable matrix whose transition is a shift register, which is what
lets the O(N) solver absorb banded noise for free.
"""

from __future__ import annotations

__all__ = ["Noise", "Diagonal", "Dense", "Banded"]

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.utils.module import Module

if TYPE_CHECKING:
    from tinygp_tpu.solvers.quasisep.core import DiagQSM, SymmQSM


class Noise(Module):
    """The noise-model protocol."""

    __array_priority__ = 2001

    def diagonal(self) -> Array:
        """The diagonal of the noise matrix."""
        raise NotImplementedError("concrete noise models define diagonal()")

    def __add__(self, other: Array) -> Array:
        raise NotImplementedError("concrete noise models define +")

    def __radd__(self, other: Array) -> Array:
        return self.__add__(other)

    def __matmul__(self, other: Array) -> Array:
        raise NotImplementedError("concrete noise models define @")

    def to_qsm(self) -> SymmQSM | DiagQSM:
        """This noise model as a quasiseparable matrix."""
        raise NotImplementedError(
            "this noise model has no quasiseparable form"
        )


class Diagonal(Noise):
    """Per-observation measurement variance.

    Args:
        diag: The ``(N,)`` diagonal entries (broadcast scalars first).
    """

    diag: Array

    def __post_init__(self) -> None:
        if jnp.ndim(self.diag) != 1:
            raise ValueError(
                "Diagonal noise stores one variance per observation: pass "
                "an (N,) array (broadcast scalars with jnp.full / "
                "jnp.broadcast_to before constructing)"
            )

    def diagonal(self) -> Array:
        return self.diag

    def _add(self, other: Array) -> Array:
        # A masked broadcast, NOT a scatter: `.at[diag_indices].add` lowers
        # to a flatten -> scatter -> unflatten chain that costs three full
        # passes over an N x N matrix on TPU (measured 3.3 ms at N=1e4);
        # this form is one elementwise op that XLA fuses into the matrix's
        # producer and consumers, so adding the noise is free.
        other = jnp.asarray(other)
        eq = jax.lax.broadcasted_iota(
            jnp.int32, other.shape[-2:], 0
        ) == jax.lax.broadcasted_iota(jnp.int32, other.shape[-2:], 1)
        return other + jnp.where(
            eq, self.diag[..., :, None], jnp.zeros((), other.dtype)
        )

    def __add__(self, other: Array) -> Array:
        return self._add(other)

    __radd__ = __add__

    def __matmul__(self, other: Array) -> Array:
        d = self.diag
        return d * other if jnp.ndim(other) == 1 else d[:, None] * other

    def to_qsm(self) -> DiagQSM:
        from tinygp_tpu.solvers.quasisep.core import DiagQSM

        return DiagQSM(d=self.diag)


class Dense(Noise):
    """A full-rank observation noise matrix.

    .. warning:: Incompatible with the scalable
        :class:`tinygp_tpu.solvers.QuasisepSolver`.
    """

    value: Array

    def diagonal(self) -> Array:
        return jnp.diagonal(self.value)

    def __add__(self, other: Array) -> Array:
        return self.value + other

    __radd__ = __add__

    def __matmul__(self, other: Array) -> Array:
        return pdot(self.value, other)

    def to_qsm(self) -> SymmQSM | DiagQSM:
        raise NotImplementedError(
            "A dense noise model has no compact quasiseparable form"
        )


class Banded(Noise):
    r"""A symmetric banded observation noise matrix.

    Stored as the diagonal ``diag`` of shape ``(N,)`` plus ``off_diags`` of
    shape ``(N, J)``, where row ``i`` holds the entries ``M[i, i+1+j]`` for
    ``j < J`` (entries beyond the matrix edge are ignored). As a
    quasiseparable matrix this has order ``J`` with a shift-register
    transition ``a = eye(J, k=1)``: generator ``q_i = off_diags[i]`` carries
    the row's band, and each step of the recurrence shifts it one diagonal
    outward, reproducing the band structure (reference behavior:
    ``noise.py:127-236``).
    """

    diag: Array
    off_diags: Array

    def diagonal(self) -> Array:
        return self.diag

    def _band_index_pairs(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        N, J = np.shape(self.off_diags)
        rows, bands, cols = [], [], []
        for j in range(J):
            n = N - j - 1
            rows.append(np.arange(n))
            bands.append(np.full(n, j, dtype=int))
            cols.append(np.arange(j + 1, N))
        return (
            np.concatenate(rows),
            np.concatenate(bands),
            np.concatenate(rows),
            np.concatenate(cols),
        )

    def _add(self, other: Array) -> Array:
        other = jnp.asarray(other)
        out = other.at[jnp.diag_indices(other.shape[0])].add(self.diag)
        src_r, src_b, dst_r, dst_c = self._band_index_pairs()
        vals = self.off_diags[(src_r, src_b)]
        out = out.at[(dst_r, dst_c)].add(vals)
        out = out.at[(dst_c, dst_r)].add(vals)
        return out

    def __add__(self, other: Array) -> Array:
        return self._add(other)

    __radd__ = __add__

    def __matmul__(self, other: Array) -> Array:
        return self.to_qsm().matmul(other)

    def to_qsm(self) -> SymmQSM:
        from tinygp_tpu.solvers.quasisep import core

        N, J = jnp.shape(self.off_diags)
        # p selects the first register slot; a shifts the register.
        p = jnp.repeat(jnp.eye(1, J, dtype=self.diag.dtype), N, axis=0)
        q = self.off_diags
        a = jnp.repeat(jnp.eye(J, k=1, dtype=self.diag.dtype)[None], N, axis=0)
        return core.SymmQSM(
            diag=core.DiagQSM(d=self.diag),
            lower=core.StrictLowerTriQSM(p=p, q=q, a=a),
        )
