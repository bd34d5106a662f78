"""Real-TPU smoke suite configuration.

Unlike ``tests/`` (which forces the CPU backend + 8 virtual devices for the
sharding suite), this directory runs against the REAL TPU and is excluded
from the default ``testpaths``. Run it explicitly:

    python -m pytest tests_tpu/ -q -p no:xdist

Purpose (round-4 lesson): interpret-mode parity tests execute kernels in
Python and never touch Mosaic lowering, so an unlowerable kernel can pass
the whole suite and still crash the official bench. Every shipped Pallas
kernel gets a compile (+ one tiny execute) here at a minimal above-cutoff
shape; the r04 "Cannot store scalars to VMEM" crash reproduces as a test
failure on the broken revision.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    on_tpu = jax.default_backend() == "tpu"
    skip = pytest.mark.skip(reason="requires a real TPU backend")
    for item in items:
        item.add_marker(pytest.mark.tpu)
        if not on_tpu:
            item.add_marker(skip)
