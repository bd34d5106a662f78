"""Device-mesh helpers.

No reference counterpart (the reference is strictly single-device); this is
the substrate for the multi-chip scaling promised by the build's north star.
All cross-device communication in this framework goes through XLA
collectives emitted by ``shard_map``/``pjit`` over a
:class:`jax.sharding.Mesh` — ICI within a slice, DCN across slices — never
through hand-rolled host-side communication.
"""

from __future__ import annotations

__all__ = ["make_mesh", "chain_axis", "local_chunk"]

from collections.abc import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

chain_axis = "chains"
"""The canonical mesh-axis name for chain/particle data parallelism."""


def make_mesh(
    num_devices: int | None = None,
    *,
    axis_names: Sequence[str] = (chain_axis,),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a 1-D (or reshaped) mesh over the available devices.

    Args:
        num_devices: Use only this many devices (default: all).
        axis_names: Mesh axis names; the product of axis sizes must equal the
            device count, with the first axis absorbing the remainder.
        devices: Explicit device list (default ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape: tuple[int, ...] = (n,)
    else:
        raise NotImplementedError(
            "multi-axis meshes: pass an explicit device array to jax.sharding.Mesh"
        )
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def local_chunk(total: int, mesh: Mesh, axis: str = chain_axis) -> int:
    """The per-device extent of ``total`` items sharded over ``axis``."""
    size = mesh.shape[axis]
    if total % size != 0:
        raise ValueError(
            f"{total} items do not shard evenly over mesh axis "
            f"'{axis}' of size {size}"
        )
    return total // size
