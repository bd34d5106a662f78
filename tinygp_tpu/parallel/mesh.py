"""Device-mesh helpers.

No reference counterpart (the reference is strictly single-device); this is
the substrate for the multi-chip scaling promised by the build's north star.
All cross-device communication in this framework goes through XLA
collectives emitted by ``shard_map``/``pjit`` over a
:class:`jax.sharding.Mesh` — ICI within a slice, DCN across slices — never
through hand-rolled host-side communication.
"""

from __future__ import annotations

__all__ = [
    "make_mesh",
    "chain_axis",
    "data_axis",
    "local_chunk",
    "initialize_distributed",
]

import os
from collections.abc import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

chain_axis = "chains"
"""The canonical mesh-axis name for chain/particle data parallelism."""

data_axis = "data"
"""The canonical mesh-axis name for sequence (time-axis) parallelism."""


def make_mesh(
    num_devices: int | None = None,
    *,
    axis_names: Sequence[str] = (chain_axis,),
    axis_sizes: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh with named axes.

    Args:
        num_devices: Use only this many devices (default: all — across every
            process in a multi-host run, in ``jax.devices()`` order, which
            keeps ICI neighbors adjacent on TPU slices).
        axis_names: Mesh axis names, e.g. ``("chains",)`` for pure chain
            parallelism or ``("chains", "data")`` for chain x sequence.
        axis_sizes: Size per axis. At most one entry may be ``-1`` (it
            absorbs whatever is left). Defaults to everything on the first
            axis and 1 elsewhere.
        devices: Explicit device list (default ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)

    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    sizes = list(axis_sizes)
    if len(sizes) != len(axis_names):
        raise ValueError(
            f"{len(axis_names)} axis names but {len(sizes)} sizes"
        )
    holes = [i for i, s in enumerate(sizes) if s == -1]
    if len(holes) > 1:
        raise ValueError("at most one axis size may be -1")
    if holes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if known == 0 or n % known != 0:
            raise ValueError(
                f"cannot infer axis '{axis_names[holes[0]]}': {n} devices "
                f"do not divide by the fixed sizes {sizes}"
            )
        sizes[holes[0]] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(
            f"mesh {dict(zip(axis_names, sizes))} needs "
            f"{int(np.prod(sizes))} devices, have {n}"
        )
    return Mesh(np.asarray(devices).reshape(sizes), tuple(axis_names))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Join (or start) a multi-process JAX cluster.

    Call once at the top of a multi-host program, before any computation.
    With no arguments the standard environment variables / cloud metadata
    are used (``JAX_COORDINATOR_ADDRESS``, TPU pod metadata, SLURM, ...),
    which is how pod-slice launches normally work; the explicit arguments
    support manual (e.g. CPU-cluster test) setups.

    Returns:
        ``(process_index, process_count)``. Safe to call when already
        initialized (returns the current values).
    """
    already = getattr(
        jax._src.distributed.global_state, "client", None
    ) is not None
    if not already:
        kwargs = {}
        if coordinator_address is None:
            coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def local_chunk(total: int, mesh: Mesh, axis: str = chain_axis) -> int:
    """The per-device extent of ``total`` items sharded over ``axis``."""
    size = mesh.shape[axis]
    if total % size != 0:
        raise ValueError(
            f"{total} items do not shard evenly over mesh axis "
            f"'{axis}' of size {size}"
        )
    return total // size
