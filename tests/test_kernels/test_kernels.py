import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import kernels
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture
def inputs():
    rng = np.random.default_rng(42)
    X1 = jnp.asarray(rng.normal(size=(12, 3)))
    X2 = jnp.asarray(rng.normal(size=(7, 3)))
    return X1, X2


ALL_STATIONARY = [
    kernels.Exp(scale=1.3),
    kernels.ExpSquared(scale=0.8),
    kernels.Matern32(scale=2.1),
    kernels.Matern52(scale=1.1),
    kernels.Cosine(scale=2.7),
    kernels.ExpSineSquared(scale=1.9, gamma=0.7),
    kernels.RationalQuadratic(scale=1.4, alpha=1.2),
]


@pytest.mark.parametrize("kernel", ALL_STATIONARY, ids=lambda k: type(k).__name__)
def test_matrix_matches_pointwise_loop(kernel, inputs):
    X1, X2 = inputs
    K = kernel(X1, X2)
    expect = np.array(
        [[float(kernel.evaluate(x1, x2)) for x2 in X2] for x1 in X1]
    )
    assert K.shape == (12, 7)
    assert_allclose(K, expect)
    assert_allclose(kernel(X1), np.array([float(kernel.evaluate(x, x)) for x in X1]))


def test_stationary_values_1d():
    x1, x2 = 0.4, 1.9
    r = abs(x1 - x2) / 1.5
    checks = [
        (kernels.Exp(1.5), np.exp(-r)),
        (kernels.ExpSquared(1.5), np.exp(-0.5 * r**2)),
        (kernels.Matern32(1.5), (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)),
        (
            kernels.Matern52(1.5),
            (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r),
        ),
        (kernels.Cosine(1.5), np.cos(2 * np.pi * r)),
        (
            kernels.ExpSineSquared(1.5, gamma=2.0),
            np.exp(-2.0 * np.sin(np.pi * r) ** 2),
        ),
        (
            kernels.RationalQuadratic(scale=1.5, alpha=0.9),
            (1 + 0.5 * r**2 / 0.9) ** -0.9,
        ),
    ]
    for kernel, expect in checks:
        assert_allclose(kernel.evaluate(x1, x2), expect)


def test_algebra(inputs):
    X1, X2 = inputs
    k1 = kernels.ExpSquared(scale=1.0)
    k2 = kernels.Matern32(scale=2.0)

    assert_allclose((k1 + k2)(X1, X2), k1(X1, X2) + k2(X1, X2))
    assert_allclose((k1 * k2)(X1, X2), k1(X1, X2) * k2(X1, X2))
    assert_allclose((2.5 * k1)(X1, X2), 2.5 * k1(X1, X2))
    assert_allclose((k1 + 0.3)(X1, X2), k1(X1, X2) + 0.3)
    assert_allclose(sum([k1, k2])(X1, X2), k1(X1, X2) + k2(X1, X2))


def test_dot_product_and_polynomial(inputs):
    X1, X2 = inputs
    dp = kernels.DotProduct()
    assert_allclose(dp(X1, X2), np.asarray(X1) @ np.asarray(X2).T)

    poly = kernels.Polynomial(order=2.0, scale=1.5, sigma=0.3)
    expect = (
        (np.asarray(X1) / 1.5) @ (np.asarray(X2) / 1.5).T + 0.09
    ) ** 2.0
    assert_allclose(poly(X1, X2), expect)


def test_custom_kernel(inputs):
    X1, X2 = inputs
    k = kernels.Custom(lambda a, b: jnp.exp(-jnp.sum(jnp.abs(a - b))))
    expect = np.exp(
        -np.sum(np.abs(np.asarray(X1)[:, None] - np.asarray(X2)[None]), axis=-1)
    )
    assert_allclose(k(X1, X2), expect)


def test_constant_requires_scalar(inputs):
    X1, _ = inputs
    with pytest.raises(ValueError):
        kernels.Constant(jnp.ones(3))(X1, X1)


def test_required_parameters():
    with pytest.raises(ValueError):
        kernels.ExpSineSquared(scale=1.0)
    with pytest.raises(ValueError):
        kernels.RationalQuadratic(scale=1.0)


def test_nonscalar_scale_rejected(inputs):
    X1, _ = inputs
    with pytest.raises(ValueError):
        kernels.Matern32(scale=jnp.ones(3))(X1, X1)


@pytest.mark.parametrize("kernel", ALL_STATIONARY, ids=lambda k: type(k).__name__)
def test_pytree_jit_roundtrip(kernel, inputs):
    X1, X2 = inputs
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert_allclose(rebuilt(X1, X2), kernel(X1, X2))

    @jax.jit
    def apply(k, a, b):
        return k(a, b)

    assert_allclose(apply(kernel, X1, X2), kernel(X1, X2))
