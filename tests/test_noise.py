import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.noise import Banded, Dense, Diagonal
from tinygp_tpu.test_utils import assert_allclose


def _dense_banded(diag, off):
    N, J = off.shape
    M = np.diag(diag)
    for j in range(J):
        for i in range(N - j - 1):
            M[i, i + j + 1] = off[i, j]
            M[i + j + 1, i] = off[i, j]
    return M


def test_diagonal():
    d = jnp.array([1.0, 2.0, 3.0])
    n = Diagonal(diag=d)
    assert_allclose(n.diagonal(), d)
    base = jnp.zeros((3, 3))
    assert_allclose(n + base, np.diag(np.asarray(d)))
    assert_allclose(base + n, np.diag(np.asarray(d)))
    assert_allclose(n @ jnp.ones(3), d)
    assert_allclose(n.to_qsm().to_dense(), np.diag(np.asarray(d)))

    with pytest.raises(ValueError):
        Diagonal(diag=jnp.ones(()))


def test_dense():
    rng = np.random.default_rng(0)
    V = rng.normal(size=(4, 4))
    n = Dense(value=jnp.asarray(V))
    assert_allclose(n.diagonal(), np.diag(V))
    assert_allclose(n + jnp.zeros((4, 4)), V)
    assert_allclose(n @ jnp.ones(4), V @ np.ones(4))
    with pytest.raises(NotImplementedError):
        n.to_qsm()


def test_banded():
    rng = np.random.default_rng(1)
    N, J = 8, 3
    diag = 2.0 + rng.uniform(size=N)
    off = 0.3 * rng.normal(size=(N, J))
    n = Banded(diag=jnp.asarray(diag), off_diags=jnp.asarray(off))
    expect = _dense_banded(diag, off)

    assert_allclose(n.diagonal(), diag)
    assert_allclose(n + jnp.zeros((N, N)), expect)
    assert_allclose(n.to_qsm().to_dense(), expect)
    x = rng.normal(size=N)
    assert_allclose(n @ jnp.asarray(x), expect @ x)
