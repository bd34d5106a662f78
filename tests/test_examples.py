"""Smoke-run the fast examples (the full set is exercised on TPU manually;
the sampler-heavy ones take minutes on CPU and are excluded here)."""

import runpy
import pathlib

import pytest

EXAMPLES = pathlib.Path(__file__).parent.parent / "examples"

FAST = [
    "quickstart.py",
    "derivative_observations.py",
    "lowrank_large_n.py",
    "kernels_algebra.py",
    "geometry_and_distances.py",
    "transforms_and_multivariate.py",
    "mixtures_and_noise.py",
]


@pytest.mark.parametrize("name", FAST)
def test_example_runs(name):
    runpy.run_path(str(EXAMPLES / name), run_name="__main__")
