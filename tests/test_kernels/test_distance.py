import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from tinygp_tpu.kernels.distance import L1Distance, L2Distance
from tinygp_tpu.test_utils import assert_allclose


def test_values():
    x1 = jnp.array([0.5, -1.0, 2.0])
    x2 = jnp.array([1.5, 0.0, 2.0])
    assert_allclose(L1Distance().distance(x1, x2), 2.0)
    assert_allclose(L2Distance().distance(x1, x2), np.sqrt(2.0))
    assert_allclose(L2Distance().squared_distance(x1, x2), 2.0)


def test_gradients_away_from_zero():
    x1 = jnp.array([0.5, -1.0])
    x2 = jnp.array([1.5, 0.3])
    check_grads(lambda a: L2Distance().distance(a, x2), (x1,), order=2)
    check_grads(lambda a: L1Distance().distance(a, x2), (x1,), order=2)


def test_l2_gradient_at_coincident_points():
    # The naive sqrt would give NaN gradients here.
    x = jnp.array([0.7, -0.2])
    g = jax.grad(lambda a: L2Distance().distance(a, x))(x)
    assert np.all(np.isfinite(np.asarray(g)))

    # Through a kernel too
    from tinygp_tpu import kernels

    k = kernels.Matern32(scale=1.0, distance=L2Distance())
    g = jax.grad(lambda a: k.evaluate(a, x))(x)
    assert np.all(np.isfinite(np.asarray(g)))
