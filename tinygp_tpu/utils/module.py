"""A minimal pytree-dataclass module system.

Every model object in this framework (kernels, means, noise models, solvers,
samplers, the :class:`tinygp_tpu.GaussianProcess` itself) is a frozen
dataclass registered as a JAX pytree, so whole models can be passed through
``jit`` / ``grad`` / ``vmap`` / ``shard_map`` transparently.

This plays the role equinox's ``eqx.Module`` plays in the reference
(``/root/reference/src/tinygp/kernels/base.py:30`` et al.), but is built
directly on ``jax.tree_util`` with two TPU-motivated design differences:

1. **Unflatten bypasses ``__init__``.** Pytree reconstruction uses
   ``object.__new__`` + ``setattr`` so that validation and any eager compute
   in constructors never re-runs on traced values inside ``jit``/``vmap``.
   (``jax.tree_util.register_dataclass`` re-invokes the constructor, which is
   unsafe for classes like solvers that factorize eagerly in ``__init__``.)
2. **Key-path registration** so error messages and shardings refer to fields
   by name.
"""

from __future__ import annotations

__all__ = ["Module", "field", "static_field"]

import dataclasses
from typing import Any

import jax

_STATIC_KEY = "pytree_static"


def field(*, static: bool = False, **kwargs: Any) -> Any:
    """Declare a dataclass field, optionally marking it pytree-static.

    Static fields become part of the pytree *structure* (hashable, compared
    for jit-cache identity) rather than leaves.
    """
    metadata = dict(kwargs.pop("metadata", None) or {})
    metadata[_STATIC_KEY] = static
    return dataclasses.field(metadata=metadata, **kwargs)


def static_field(**kwargs: Any) -> Any:
    """Shorthand for ``field(static=True)``."""
    return field(static=True, **kwargs)


def _register(cls: type) -> None:
    fields = dataclasses.fields(cls)
    data_names = tuple(
        f.name for f in fields if not f.metadata.get(_STATIC_KEY, False)
    )
    meta_names = tuple(f.name for f in fields if f.metadata.get(_STATIC_KEY, False))

    def flatten_with_keys(obj: Any):
        data = tuple(
            (jax.tree_util.GetAttrKey(name), getattr(obj, name))
            for name in data_names
        )
        meta = tuple(getattr(obj, name) for name in meta_names)
        return data, meta

    def flatten(obj: Any):
        data = tuple(getattr(obj, name) for name in data_names)
        meta = tuple(getattr(obj, name) for name in meta_names)
        return data, meta

    def unflatten(meta: Any, data: Any) -> Any:
        obj = object.__new__(cls)
        for name, value in zip(data_names, data):
            object.__setattr__(obj, name, value)
        for name, value in zip(meta_names, meta):
            object.__setattr__(obj, name, value)
        return obj

    jax.tree_util.register_pytree_with_keys(
        cls, flatten_with_keys, unflatten, flatten_func=flatten
    )


class Module:
    """Base class: subclasses become frozen pytree dataclasses automatically.

    Declare parameters as annotated fields. Mark structural/configuration
    fields with ``static_field()``. Custom ``__init__`` methods are allowed;
    use :meth:`_init` to assign fields (instances are frozen).
    """

    # Ensure our __add__/__mul__/... win against raw jax arrays.
    __array_priority__ = 2000

    def __init_subclass__(cls, **kwargs: Any):
        super().__init_subclass__(**kwargs)
        dataclasses.dataclass(frozen=True, eq=False, repr=False)(cls)
        _register(cls)

    def _init(self, **kwargs: Any) -> None:
        """Assign fields from inside a custom ``__init__`` (frozen-safe)."""
        for name, value in kwargs.items():
            object.__setattr__(self, name, value)

    def __repr__(self) -> str:
        parts = []
        for f in dataclasses.fields(self):
            try:
                value = getattr(self, f.name)
            except AttributeError:
                continue
            parts.append(f"{f.name}={value!r}")
        return f"{type(self).__name__}({', '.join(parts)})"
