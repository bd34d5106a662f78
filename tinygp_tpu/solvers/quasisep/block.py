"""Lazy block-diagonal matrices.

Behavioral parity: ``/root/reference/src/tinygp/solvers/quasisep/block.py``.
Sums of quasiseparable kernels have block-diagonal transition matrices; this
class keeps the blocks separate so the per-step transition cost stays the
sum of the blocks' costs instead of the dense square. The stacked blocked
scans (:mod:`tinygp_tpu.solvers.quasisep.scan`) densify a ``Block`` only at
the level where their monoid combine genuinely needs the full matrix.
"""

from __future__ import annotations

__all__ = ["Block", "ensure_dense"]

import operator
from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.utils.module import Module

# Anything a Block can combine with: scalars, arrays, other Blocks.
Operand = Any


def ensure_dense(x: Operand) -> Operand:
    """Densify a :class:`Block`; pass anything else through."""
    return x.to_dense() if isinstance(x, Block) else x


def _deferring(op: Callable[[Any, Any], Any], *, swap: bool = False):
    """Build a binary dunder: blockwise for matching Blocks, dense otherwise."""

    def method(self: Block, other: Operand) -> Operand:
        if isinstance(other, Block):
            # Honor operand order on the reflected variants too (a
            # subclass on the left of a non-commutative op lands here).
            flipped = (lambda a, b: op(b, a)) if swap else op
            return self._zip(flipped, other)
        dense = self.to_dense()
        return op(other, dense) if swap else op(dense, other)

    return method


class Block(Module):
    """A lazily block-diagonal square matrix built from square blocks.

    Elementwise algebra distributes over the blocks; mixing with a dense
    operand densifies. Matrix products against vectors/matrices split the
    operand at the block boundaries so no dense square is ever formed.
    """

    blocks: tuple[Operand, ...]

    __array_priority__ = 1999

    def __init__(self, *blocks: Operand):
        self._init(blocks=tuple(blocks))

    # -- helpers ------------------------------------------------------------

    def _map(self, f: Callable[[Any], Any]) -> Block:
        """Apply ``f`` block-by-block."""
        return Block(*(f(b) for b in self.blocks))

    def _zip(self, f: Callable[[Any, Any], Any], other: Block) -> Block:
        """Combine with another Block of identical layout, block-by-block."""
        mine, theirs = self.blocks, other.blocks
        if len(mine) != len(theirs) or any(
            np.shape(b1) != np.shape(b2) for b1, b2 in zip(mine, theirs)
        ):
            raise ValueError("Block layouts do not match")
        return Block(*(f(b1, b2) for b1, b2 in zip(mine, theirs)))

    def _edges(self, axis: int) -> list[int]:
        """Cut points partitioning an operand at the block boundaries."""
        return list(np.cumsum([np.shape(b)[axis] for b in self.blocks]))[:-1]

    # -- shape protocol -----------------------------------------------------

    def __getitem__(self, idx: Any) -> Block:
        return self._map(lambda b: b[idx])

    def __len__(self) -> int:
        if self.ndim != 2:
            raise TypeError("len() of a batched Block is ambiguous")
        return int(sum(np.shape(b)[-2] for b in self.blocks))

    @property
    def ndim(self) -> int:
        dims = {np.ndim(b) for b in self.blocks}
        if len(dims) != 1:
            raise ValueError("Blocks have mixed numbers of dimensions")
        return dims.pop()

    @property
    def shape(self) -> tuple[int, int]:
        return (len(self), len(self))

    def transpose(self) -> Block:
        return self._map(lambda b: b.transpose())

    @property
    def T(self) -> Block:
        return self.transpose()

    @property
    def mT(self) -> Block:
        return self._map(lambda b: jnp.swapaxes(b, -1, -2))

    def to_dense(self) -> Array:
        if self.ndim > 2:
            # Batched blocks: map the dense assembly over the leading axis.
            return jax.vmap(lambda *bs: Block(*bs).to_dense())(*self.blocks)
        n = len(self)
        out = jnp.zeros((n, n), jnp.result_type(*self.blocks))
        lo = 0
        for b in self.blocks:
            hi = lo + np.shape(b)[-2]
            out = out.at[lo:hi, lo:hi].set(b)
            lo = hi
        return out

    # -- algebra ------------------------------------------------------------

    def __mul__(self, other: Operand) -> Block:
        # Scalar scaling stays lazy (used by Scale/Product kernels).
        return self._map(lambda b: b * other)

    def __rmul__(self, other: Operand) -> Block:
        return self._map(lambda b: other * b)

    __add__ = _deferring(operator.add)
    __radd__ = _deferring(operator.add, swap=True)
    __sub__ = _deferring(operator.sub)
    __rsub__ = _deferring(operator.sub, swap=True)

    def __matmul__(self, other: Operand) -> Operand:
        if isinstance(other, Block):
            return self._zip(pdot, other)
        if np.ndim(other) < 1:
            raise ValueError("matmul against a scalar")
        axis = 0 if np.ndim(other) == 1 else -2
        pieces = jnp.split(other, self._edges(-1), axis)
        return jnp.concatenate(
            [pdot(b, p) for b, p in zip(self.blocks, pieces)], axis
        )

    def __rmatmul__(self, other: Operand) -> Operand:
        pieces = jnp.split(other, self._edges(-2), -1)
        return jnp.concatenate(
            [pdot(p, b) for p, b in zip(pieces, self.blocks)], -1
        )
