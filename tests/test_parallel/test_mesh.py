"""make_mesh / local_chunk unit tests (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest

from tinygp_tpu.parallel.mesh import chain_axis, local_chunk, make_mesh


def test_default_one_axis():
    mesh = make_mesh()
    assert mesh.axis_names == (chain_axis,)
    assert mesh.shape[chain_axis] == len(jax.devices())


def test_num_devices_subset():
    mesh = make_mesh(4)
    assert mesh.shape[chain_axis] == 4


def test_multi_axis_explicit():
    mesh = make_mesh(axis_names=("chains", "data"), axis_sizes=(2, 4))
    assert mesh.shape == {"chains": 2, "data": 4}
    assert mesh.devices.shape == (2, 4)


def test_multi_axis_inferred():
    mesh = make_mesh(axis_names=("chains", "data"), axis_sizes=(-1, 2))
    assert mesh.shape == {"chains": 4, "data": 2}


def test_multi_axis_default_sizes():
    mesh = make_mesh(axis_names=("chains", "data"))
    assert mesh.shape == {"chains": 8, "data": 1}


def test_bad_sizes_raise():
    with pytest.raises(ValueError, match="axis names"):
        make_mesh(axis_names=("a", "b"), axis_sizes=(8,))
    with pytest.raises(ValueError, match="-1"):
        make_mesh(axis_names=("a", "b"), axis_sizes=(-1, -1))
    with pytest.raises(ValueError, match="devices"):
        make_mesh(axis_names=("a", "b"), axis_sizes=(3, 3))
    with pytest.raises(ValueError, match="divide"):
        make_mesh(axis_names=("a", "b"), axis_sizes=(-1, 3))


def test_local_chunk():
    mesh = make_mesh(4)
    assert local_chunk(32, mesh) == 8
    with pytest.raises(ValueError, match="evenly"):
        local_chunk(30, mesh)


def test_devices_reshape_order_matches_jax():
    devs = jax.devices()
    mesh = make_mesh(axis_names=("a", "b"), axis_sizes=(2, 4))
    np.testing.assert_array_equal(
        np.asarray(mesh.devices).reshape(-1), np.asarray(devs)
    )
