"""Dedicated Block (lazy block-diagonal) tests.

Parity targets: ``/root/reference/tests/test_solvers/test_quasisep/
test_block.py`` plus the nested-``Sum`` regression (reference issue #265,
``/root/reference/src/tinygp/kernels/quasisep.py:267-270``): lazily-blocked
kernel sums must flatten instead of nesting Blocks inside Blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.kernels import quasisep
from tinygp_tpu.solvers.quasisep.block import Block, ensure_dense
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture
def blocks():
    rng = np.random.default_rng(42)
    return [
        jnp.asarray(rng.normal(size=(2, 2))),
        jnp.asarray(rng.normal(size=(3, 3))),
        jnp.asarray(rng.normal(size=(1, 1))),
    ]


def _dense(blocks):
    out = np.zeros((6, 6))
    out[:2, :2] = np.asarray(blocks[0])
    out[2:5, 2:5] = np.asarray(blocks[1])
    out[5:, 5:] = np.asarray(blocks[2])
    return out


def test_to_dense_and_shape(blocks):
    b = Block(*blocks)
    assert b.shape == (6, 6)
    assert len(b) == 6
    assert b.ndim == 2
    assert_allclose(b.to_dense(), _dense(blocks))
    assert_allclose(ensure_dense(b), _dense(blocks))
    x = jnp.ones(3)
    assert ensure_dense(x) is x


def test_transpose_variants(blocks):
    b = Block(*blocks)
    assert_allclose(b.T.to_dense(), _dense(blocks).T)
    assert_allclose(b.transpose().to_dense(), _dense(blocks).T)
    assert_allclose(b.mT.to_dense(), _dense(blocks).T)


def test_elementwise_algebra(blocks):
    b = Block(*blocks)
    d = _dense(blocks)
    assert_allclose((2.0 * b).to_dense(), 2.0 * d)
    assert_allclose((b * 2.0).to_dense(), 2.0 * d)
    assert_allclose((b + b).to_dense(), d + d)
    assert_allclose((b - (2.0 * b)).to_dense(), -d)
    # Mixing with a dense operand densifies.
    eye = jnp.eye(6)
    assert_allclose(b + eye, d + np.eye(6))
    assert_allclose(eye + b, d + np.eye(6))
    assert_allclose(b - eye, d - np.eye(6))
    assert_allclose(eye - b, np.eye(6) - d)


def test_mismatched_layout_raises(blocks):
    b = Block(*blocks)
    other = Block(blocks[1], blocks[0], blocks[2])
    with pytest.raises(ValueError, match="layout"):
        b + other
    with pytest.raises(ValueError, match="layout"):
        Block(blocks[0]) + b


def test_matmul_vector_matrix_and_block(blocks):
    rng = np.random.default_rng(7)
    b = Block(*blocks)
    d = _dense(blocks)
    v = jnp.asarray(rng.normal(size=6))
    m = jnp.asarray(rng.normal(size=(6, 4)))
    assert_allclose(b @ v, d @ np.asarray(v))
    assert_allclose(b @ m, d @ np.asarray(m))
    assert_allclose(v @ b, np.asarray(v) @ d)
    assert_allclose(m.T @ b, np.asarray(m).T @ d)
    assert_allclose((b @ b).to_dense(), d @ d)


def test_getitem_on_batched_blocks():
    rng = np.random.default_rng(3)
    b = Block(
        jnp.asarray(rng.normal(size=(5, 2, 2))),
        jnp.asarray(rng.normal(size=(5, 3, 3))),
    )
    assert b.ndim == 3
    sliced = b[1]
    assert sliced.ndim == 2
    assert sliced.shape == (5, 5)
    # Batched to_dense maps over the leading axis.
    dense = b.to_dense()
    assert dense.shape == (5, 5, 5)
    assert_allclose(dense[1], sliced.to_dense())


def test_nested_kernel_sum_flattens_blocks():
    # Issue-#265 analog: ((k1 + k2) + k3) must not nest Block(Block(...)).
    k = (
        quasisep.Matern32(scale=1.0)
        + quasisep.SHO(omega=1.5, quality=3.0)
    ) + quasisep.Exp(scale=2.0)
    X = jnp.asarray(np.sort(np.random.default_rng(0).uniform(0, 5, 20)))
    a = k.to_symm_qsm(X).lower.a
    if isinstance(a, Block):
        assert all(not isinstance(blk, Block) for blk in a.blocks)

    # And the lazily-blocked matrix agrees with the dense evaluation.
    K_qsm = k.to_symm_qsm(X).to_dense()
    K_dense = jax.vmap(
        jax.vmap(k.evaluate, in_axes=(None, 0)), in_axes=(0, None)
    )(X, X)
    assert_allclose(K_qsm, K_dense)
