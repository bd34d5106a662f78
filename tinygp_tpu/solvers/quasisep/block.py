"""Lazy block-diagonal matrices.

Behavioral parity: ``/root/reference/src/tinygp/solvers/quasisep/block.py``.
Sums of quasiseparable kernels have block-diagonal transition matrices; this
class keeps the blocks separate so the per-step transition cost stays the
sum of the blocks' costs instead of the dense square.
"""

from __future__ import annotations

__all__ = ["Block", "ensure_dense"]

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import block_diag

from tinygp_tpu.helpers import JAXArray, pdot
from tinygp_tpu.utils.module import Module


def ensure_dense(x: Any) -> Any:
    """Densify a :class:`Block`; pass anything else through."""
    if isinstance(x, Block):
        return x.to_dense()
    return x


class Block(Module):
    """A lazily block-diagonal square matrix built from square blocks."""

    blocks: tuple[Any, ...]

    __array_priority__ = 1999

    def __init__(self, *blocks: Any):
        self._init(blocks=tuple(blocks))

    def __getitem__(self, idx: Any) -> Block:
        return Block(*(b[idx] for b in self.blocks))

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
        return Block(*(b.transpose() for b in self.blocks))

    @property
    def T(self) -> Block:
        return self.transpose()

    @property
    def mT(self) -> Block:
        return Block(*(jnp.swapaxes(b, -1, -2) for b in self.blocks))

    def to_dense(self) -> JAXArray:
        ndim = self.ndim
        assert ndim >= 2
        if ndim == 2:
            return block_diag(*self.blocks)
        # Batched blocks: map the dense assembly over the leading axis.
        return jax.vmap(lambda *bs: Block(*bs).to_dense())(*self.blocks)

    def __mul__(self, other: Any) -> Block:
        return Block(*(b * other for b in self.blocks))

    def __rmul__(self, other: Any) -> Block:
        return self.__mul__(other)

    def _zip_blocks(self, other: Block) -> Any:
        assert len(self.blocks) == len(other.blocks)
        for b1, b2 in zip(self.blocks, other.blocks):
            assert np.shape(b1) == np.shape(b2)
        return zip(self.blocks, other.blocks)

    def __add__(self, other: Any) -> Any:
        if isinstance(other, Block):
            return Block(*(b1 + b2 for b1, b2 in self._zip_blocks(other)))
        return self.to_dense() + other

    def __radd__(self, other: Any) -> Any:
        return other + self.to_dense()

    def __sub__(self, other: Any) -> Any:
        if isinstance(other, Block):
            return Block(*(b1 - b2 for b1, b2 in self._zip_blocks(other)))
        return self.to_dense() - other

    def __rsub__(self, other: Any) -> Any:
        return other - self.to_dense()

    def __matmul__(self, other: Any) -> Any:
        if isinstance(other, Block):
            return Block(*(pdot(b1, b2) for b1, b2 in self._zip_blocks(other)))
        ndim = np.ndim(other)
        assert ndim >= 1
        idx = 0
        outs = []
        for b in self.blocks:
            size = np.shape(b)[-1]
            piece = (
                other[idx : idx + size]
                if ndim == 1
                else other[..., idx : idx + size, :]
            )
            outs.append(pdot(b, piece))
            idx += size
        return jnp.concatenate(outs, axis=0 if ndim == 1 else -2)

    def __rmatmul__(self, other: Any) -> Any:
        idx = 0
        outs = []
        for b in self.blocks:
            size = np.shape(b)[-2]
            outs.append(pdot(other[..., idx : idx + size], b))
            idx += size
        return jnp.concatenate(outs, axis=-1)
