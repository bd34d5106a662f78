"""MXU-tiled dense ops: split matmul and blocked Cholesky."""

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.ops.dense import blocked_cholesky, split_matmul


def test_split_matmul_accuracy():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(128, 192)), jnp.float32)
    exact = jnp.matmul(X, Y, precision="highest")
    approx = split_matmul(X, Y)
    rel = float(jnp.max(jnp.abs(approx - exact)) / jnp.max(jnp.abs(exact)))
    assert rel < 5e-5  # x2 splitting: ~2^-16 operand error


def test_split_matmul_transpose():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(96, 128)), jnp.float32)
    exact = jnp.matmul(X, Y.T, precision="highest")
    approx = split_matmul(X, Y, transpose_y=True)
    assert float(jnp.max(jnp.abs(approx - exact))) < 5e-3


def test_blocked_cholesky_well_conditioned():
    # Includes the pad-to-block-multiple path (4608 + pad at block=1024).
    rng = np.random.default_rng(2)
    N = 4608
    A = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32) / np.sqrt(N))
    K = jnp.matmul(A, A.T, precision="highest") + jnp.eye(N)
    L = blocked_cholesky(K)
    Lx = jnp.linalg.cholesky(K)
    rel = float(jnp.max(jnp.abs(L - Lx)) / jnp.max(jnp.abs(Lx)))
    assert rel < 1e-4
    # strictly lower triangular output
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0


def test_blocked_cholesky_small_fallback():
    rng = np.random.default_rng(3)
    N = 64
    A = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32))
    K = jnp.matmul(A, A.T, precision="highest") + N * jnp.eye(N)
    np.testing.assert_array_equal(
        np.asarray(blocked_cholesky(K)), np.asarray(jnp.linalg.cholesky(K))
    )
