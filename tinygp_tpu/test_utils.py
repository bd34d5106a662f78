"""dtype-aware testing assertions.

Tolerance policy follows the reference (``src/tinygp/test_utils.py:12-25``):
5e-4 for float32 and 5e-7 for float64, so the same suite stays meaningful
whether or not x64 is enabled. On TPU, f64 is emulated, so tests default to
f32 with these managed tolerances.
"""

from __future__ import annotations

__all__ = ["assert_allclose", "assert_pytrees_allclose"]

from typing import Any

import jax
import numpy as np

_TOL = {
    "bfloat16": 1e-2,
    "float16": 1e-2,
    "float32": 5e-4,
    "float64": 5e-7,
}


def assert_allclose(calculated: Any, expected: Any, **kwargs: Any) -> None:
    calculated = np.asarray(calculated)
    expected = np.asarray(expected)
    # Tolerance keyed on the LEAST precise operand: oracles computed in
    # numpy are f64, and result_type would otherwise demand f64 accuracy
    # of an f32 computation (every mixed comparison fails in f32 mode).
    names = []
    for arr in (calculated, expected):
        name = np.dtype(arr.dtype).name
        if name in _TOL:
            names.append(name)
    tol = max((_TOL[n] for n in names), default=5e-4)
    atol = kwargs.pop("atol", tol)
    rtol = kwargs.pop("rtol", tol)
    np.testing.assert_allclose(
        np.asarray(calculated, dtype=np.float64),
        np.asarray(expected, dtype=np.float64),
        atol=atol,
        rtol=rtol,
        **kwargs,
    )


def assert_pytrees_allclose(calculated: Any, expected: Any, **kwargs: Any) -> None:
    jax.tree_util.tree_map(
        lambda a, b: assert_allclose(a, b, **kwargs), calculated, expected
    )
