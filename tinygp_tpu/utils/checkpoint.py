"""Pytree checkpointing for long sampler runs.

The reference has no checkpoint subsystem (its models are pure pytrees and
it ships no samplers — SURVEY.md §5); this is the pod-scale answer to
preemption for the samplers added here: sampler state (chain positions,
adaptation state, RNG keys, step counters) is a pytree, saved atomically as
an ``.npz`` plus the tree structure, and restored against a template with
shape/dtype validation. The engine itself stays stateless like the
reference — checkpoints are explicit snapshots of loop carries, not hidden
solver state.

No orbax dependency: a single-host ``.npz`` keeps the format inspectable
and dependency-light. Multi-host runs use
:func:`save_pytree_sharded` / :func:`load_pytree_sharded`: each process
writes only the shards it can address, to its own ``.proc{i}.npz`` file,
and restores them onto its own local devices — no cross-host gathering, no
coordinator involvement, constant memory per host.
"""

from __future__ import annotations

__all__ = [
    "save_pytree",
    "load_pytree",
    "save_pytree_sharded",
    "load_pytree_sharded",
]

import os
import tempfile
from typing import Any

import jax
import numpy as np


def _atomic_savez(path: str, arrays: dict[str, np.ndarray]) -> None:
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def save_pytree(path: str, tree: Any) -> None:
    """Atomically save a pytree of arrays/scalars to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    _atomic_savez(path, arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_pytree`.

    Args:
        path: The ``.npz`` path.
        like: A template pytree with the same structure, shapes, and
            dtypes (e.g. the initial loop carry). Leaf data is ignored.

    Returns:
        A pytree shaped like ``like`` with the stored values.
    """
    leaves, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as data:
        stored = [data[f"leaf_{i}"] for i in range(len(data.files))]
    if len(stored) != len(leaves):
        raise ValueError(
            f"checkpoint at {path!r} has {len(stored)} leaves; the template "
            f"has {len(leaves)}"
        )
    out = []
    for i, (new, old) in enumerate(zip(stored, leaves)):
        old = np.asarray(old)
        if new.shape != old.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {new.shape} != template "
                f"{old.shape}"
            )
        out.append(new.astype(old.dtype, copy=False))
    return jax.tree_util.tree_unflatten(treedef, out)


def _proc_path(path: str, process_index: int) -> str:
    return f"{path}.proc{process_index}.npz"


def save_pytree_sharded(path: str, tree: Any) -> None:
    """Save a pytree whose leaves may be multi-process ``jax.Array``s.

    Each process writes one ``{path}.proc{i}.npz`` holding, per leaf, the
    blocks of the global array that live on its local devices plus their
    global offsets. Fully-addressable leaves (replicated or single-host)
    are stored whole by every process — redundant but self-contained, so
    any subset of the files restores the replicated state.
    """
    pidx = jax.process_index()
    leaves = jax.tree_util.tree_leaves(tree)
    arrays: dict[str, np.ndarray] = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            for s_n, shard in enumerate(leaf.addressable_shards):
                start = [s.start or 0 for s in shard.index]
                arrays[f"leaf_{i}_shard_{s_n}"] = np.asarray(shard.data)
                arrays[f"leaf_{i}_shard_{s_n}_at"] = np.asarray(
                    start, np.int64
                )
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    _atomic_savez(_proc_path(path, pidx), arrays)


def load_pytree_sharded(path: str, like: Any) -> Any:
    """Restore a :func:`save_pytree_sharded` checkpoint.

    ``like`` supplies the tree structure, global shapes/dtypes, and —
    crucially — the shardings: distributed leaves are reassembled with
    ``jax.make_array_from_single_device_arrays`` from this process's own
    file only, so restore traffic is purely host-local.
    """
    pidx = jax.process_index()
    leaves, treedef = jax.tree_util.tree_flatten(like)
    out = []
    with np.load(_proc_path(path, pidx)) as data:
        for i, tmpl in enumerate(leaves):
            if (
                isinstance(tmpl, jax.Array)
                and not tmpl.is_fully_addressable
            ):
                sharding = tmpl.sharding
                buffers = []
                for s_n, shard in enumerate(tmpl.addressable_shards):
                    block = data[f"leaf_{i}_shard_{s_n}"]
                    at = data[f"leaf_{i}_shard_{s_n}_at"]
                    want = [s.start or 0 for s in shard.index]
                    if list(at) != want:
                        raise ValueError(
                            f"checkpoint shard layout changed for leaf {i}: "
                            f"stored offset {list(at)}, expected {want} — "
                            "restore with the same mesh and shardings"
                        )
                    buffers.append(
                        jax.device_put(
                            # tmpl.dtype, NOT np.asarray(shard.data).dtype:
                            # the latter copies the live shard to host just
                            # to read a dtype.
                            block.astype(tmpl.dtype),
                            shard.device,
                        )
                    )
                out.append(
                    jax.make_array_from_single_device_arrays(
                        tmpl.shape, sharding, buffers
                    )
                )
            else:
                new = data[f"leaf_{i}"]
                old = np.asarray(tmpl)
                if new.shape != old.shape:
                    raise ValueError(
                        f"checkpoint leaf {i} shape {new.shape} != template "
                        f"{old.shape}"
                    )
                out.append(new.astype(old.dtype, copy=False))
    return jax.tree_util.tree_unflatten(treedef, out)
