"""Shared type aliases and small helpers.

Mirrors the public surface of the reference's ``src/tinygp/helpers.py:10-18``
(``JAXArray`` alias plus legacy ``dataclass``/``field`` shims) so downstream
code written against tinygp keeps working.
"""

from __future__ import annotations

__all__ = ["JAXArray", "dataclass", "field"]

from typing import Any

import jax

from tinygp_tpu.utils.module import field as field

JAXArray = jax.Array


def dataclass(cls: type[Any]) -> type[Any]:
    # Backwards-compatibility shim: Module subclasses are already dataclasses.
    return cls
