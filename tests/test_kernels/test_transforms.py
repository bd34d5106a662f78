import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import kernels, transforms
from tinygp_tpu.test_utils import assert_allclose


def test_linear_scalar_equivalence():
    k0 = kernels.Matern32(4.5)
    k1 = transforms.Linear(jnp.asarray(1.0 / 4.5), kernels.Matern32())
    assert_allclose(k0.evaluate(0.5, 0.1), k1.evaluate(0.5, 0.1))


def test_cholesky_scalar_equivalence():
    k0 = kernels.Matern32(4.5)
    k1 = transforms.Cholesky(jnp.asarray(4.5), kernels.Matern32())
    assert_allclose(k0.evaluate(0.5, 0.1), k1.evaluate(0.5, 0.1))


def test_linear_matrix():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(3, 3)))
    x1 = jnp.asarray(rng.normal(size=3))
    x2 = jnp.asarray(rng.normal(size=3))
    k = transforms.Linear(A, kernels.ExpSquared())
    assert_allclose(
        k.evaluate(x1, x2), kernels.ExpSquared().evaluate(A @ x1, A @ x2)
    )


def test_cholesky_from_parameters():
    diag = jnp.array([1.0, 2.0])
    off = jnp.array([0.5])
    k = transforms.Cholesky.from_parameters(diag, off, kernels.ExpSquared())
    expect = jnp.array([[1.0, 0.0], [0.5, 2.0]])
    assert_allclose(k.factor, expect)

    with pytest.raises(ValueError):
        transforms.Cholesky.from_parameters(
            diag, jnp.array([0.5, 0.1]), kernels.ExpSquared()
        )


def test_subspace():
    k = transforms.Subspace(1, kernels.Matern32())
    a = np.array([0.5, 0.1])
    b = np.array([-0.4, 0.7])
    assert_allclose(
        k.evaluate(a, b),
        k.evaluate(np.array([100.5, 0.1]), np.array([-70.4, 0.7])),
    )


def test_transform_callable():
    k = transforms.Transform(jnp.log, kernels.ExpSquared())
    assert_allclose(
        k.evaluate(1.5, 2.5),
        kernels.ExpSquared().evaluate(jnp.log(1.5), jnp.log(2.5)),
    )
