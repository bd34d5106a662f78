"""Run the package's docstring examples.

Mirrors the reference CI's doctest job
(``/root/reference/.github/workflows/tests.yml:52-66`` runs pytest with
``--doctest-modules`` over ``src/tinygp``). Here the modules carrying
runnable examples are enumerated explicitly so the rest of the package does
not pay import-side doctest scanning on every run.
"""

import doctest

import pytest

import tinygp_tpu.gp
import tinygp_tpu.kernels.base
import tinygp_tpu.kernels.quasisep
import tinygp_tpu.transforms

MODULES = [
    tinygp_tpu.gp,
    tinygp_tpu.kernels.base,
    tinygp_tpu.kernels.quasisep,
    tinygp_tpu.transforms,
]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_doctests(mod):
    result = doctest.testmod(mod, verbose=False)
    assert result.attempted > 0, f"{mod.__name__} lost its doctest examples"
    assert result.failed == 0
