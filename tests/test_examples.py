"""Execute every example as part of the suite.

Parity with the reference's executed-tutorials CI policy
(``/root/reference/.github/workflows/tests.yml:52-66``). The sampler-heavy
examples read ``TINYGP_TPU_EXAMPLE_SCALE`` (set small here) so the full set
stays affordable on the single-core CPU test host; at scale 1 the same
scripts produce the documented full-size numbers on TPU.
"""

import pathlib
import runpy

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
    "quasisep_custom.py",
    "carma_process.py",
    "quasisep_lightcurve.py",
]

# Sampler-heavy: minutes at full scale, seconds at the CI scale.
HEAVY = [
    "modeling.py",
    "means_and_likelihoods.py",
    "smc_and_vi.py",
    "multichip_sharding.py",
]


@pytest.mark.parametrize("name", FAST)
def test_example_runs(name, monkeypatch):
    monkeypatch.setenv("TINYGP_TPU_EXAMPLE_SCALE", "0.05")
    runpy.run_path(str(EXAMPLES / name), run_name="__main__")


@pytest.mark.slow
@pytest.mark.parametrize("name", HEAVY)
def test_heavy_example_runs(name, monkeypatch):
    monkeypatch.setenv("TINYGP_TPU_EXAMPLE_SCALE", "0.05")
    runpy.run_path(str(EXAMPLES / name), run_name="__main__")


def test_every_example_is_covered():
    on_disk = {p.name for p in EXAMPLES.glob("*.py")}
    assert on_disk == set(FAST) | set(HEAVY)
