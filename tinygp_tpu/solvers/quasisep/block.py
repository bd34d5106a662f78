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

from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import block_diag

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.utils.module import Module


def ensure_dense(x: Any) -> Any:
    """Densify a :class:`Block`; pass anything else through."""
    return x.to_dense() if isinstance(x, Block) else x


class Block(Module):
    """A lazily block-diagonal square matrix built from square blocks.

    Elementwise algebra distributes over the blocks; mixing with a dense
    operand densifies. Matrix products against vectors/matrices split the
    operand at the block boundaries so no dense square is ever formed.
    """

    blocks: tuple[Any, ...]

    __array_priority__ = 1999

    def __init__(self, *blocks: Any):
        self._init(blocks=tuple(blocks))

    # -- helpers ------------------------------------------------------------

    def _map(self, f: Callable[[Any], Any]) -> Block:
        """Apply ``f`` block-by-block."""
        return Block(*(f(b) for b in self.blocks))

    def _map2(self, f: Callable[[Any, Any], Any], other: Block) -> Block:
        """Combine with another Block of identical layout, block-by-block."""
        if len(self.blocks) != len(other.blocks):
            raise ValueError("Block layouts do not match")
        for b1, b2 in zip(self.blocks, other.blocks):
            if np.shape(b1) != np.shape(b2):
                raise ValueError("Block layouts do not match")
        return Block(*(f(b1, b2) for b1, b2 in zip(self.blocks, other.blocks)))

    def _splits(self, axis_size_of: Callable[[Any], int]) -> list[int]:
        """Cut points partitioning an operand at the block boundaries."""
        return list(np.cumsum([axis_size_of(b) for b in self.blocks]))[:-1]

    # -- shape protocol -----------------------------------------------------

    def __getitem__(self, idx: Any) -> Block:
        return self._map(lambda b: b[idx])

    def __len__(self) -> int:
        assert all(np.ndim(b) == 2 for b in self.blocks)
        return sum(np.shape(b)[0] for b in self.blocks)

    @property
    def ndim(self) -> int:
        (ndim,) = {np.ndim(b) for b in self.blocks}
        return ndim

    @property
    def shape(self) -> tuple[int, int]:
        size = len(self)
        return (size, size)

    def transpose(self) -> Block:
        return self._map(lambda b: b.transpose())

    @property
    def T(self) -> Block:
        return self.transpose()

    @property
    def mT(self) -> Block:
        return self._map(lambda b: jnp.swapaxes(b, -1, -2))

    def to_dense(self) -> Array:
        ndim = self.ndim
        assert ndim >= 2
        if ndim == 2:
            return block_diag(*self.blocks)
        # Batched blocks: map the dense assembly over the leading axis.
        return jax.vmap(lambda *bs: Block(*bs).to_dense())(*self.blocks)

    # -- algebra ------------------------------------------------------------

    def __mul__(self, other: Any) -> Block:
        return self._map(lambda b: b * other)

    def __rmul__(self, other: Any) -> Block:
        return self.__mul__(other)

    def __add__(self, other: Any) -> Any:
        if isinstance(other, Block):
            return self._map2(lambda a, b: a + b, other)
        return self.to_dense() + other

    def __radd__(self, other: Any) -> Any:
        return other + self.to_dense()

    def __sub__(self, other: Any) -> Any:
        if isinstance(other, Block):
            return self._map2(lambda a, b: a - b, other)
        return self.to_dense() - other

    def __rsub__(self, other: Any) -> Any:
        return other - self.to_dense()

    def __matmul__(self, other: Any) -> Any:
        if isinstance(other, Block):
            return self._map2(pdot, other)
        ndim = np.ndim(other)
        assert ndim >= 1
        axis = 0 if ndim == 1 else -2
        pieces = jnp.split(other, self._splits(lambda b: np.shape(b)[-1]), axis)
        return jnp.concatenate(
            [pdot(b, p) for b, p in zip(self.blocks, pieces)], axis
        )

    def __rmatmul__(self, other: Any) -> Any:
        pieces = jnp.split(other, self._splits(lambda b: np.shape(b)[-2]), -1)
        return jnp.concatenate(
            [pdot(p, b) for p, b in zip(pieces, self.blocks)], -1
        )
