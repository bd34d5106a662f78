import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.kernels import quasisep
from tinygp_tpu.test_utils import assert_allclose


@pytest.mark.parametrize(
    "bounds",
    [(-2, 12), (3, 6), (-5, -1), (11, 15)],
    ids=["spanning", "interior", "before", "after"],
)
def test_rectangular_matmul_matches_dense(bounds):
    rng = np.random.default_rng(50)
    X2 = jnp.asarray(np.sort(rng.uniform(0, 10, 40)))
    X1 = jnp.asarray(np.sort(rng.uniform(*bounds, 17)))
    y = jnp.asarray(rng.normal(size=(40, 2)))

    kernel = quasisep.Matern32(scale=1.5) + quasisep.Cosine(scale=3.0)
    M = kernel.to_general_qsm(X1, X2)
    dense = np.asarray(kernel(X1, X2))

    assert M.shape == (17, 40)
    assert_allclose(M @ y, dense @ np.asarray(y), atol=1e-6)
    assert_allclose(M @ y[:, 0], dense @ np.asarray(y)[:, 0], atol=1e-6)


def test_coincident_points():
    X = jnp.asarray(np.linspace(0, 10, 25))
    y = jnp.asarray(np.random.default_rng(0).normal(size=25))
    kernel = quasisep.SHO(omega=1.3, quality=2.0)
    assert_allclose(
        kernel.to_general_qsm(X, X) @ y,
        np.asarray(kernel(X, X)) @ np.asarray(y),
        atol=1e-6,
    )
