"""The Pallas-tiled kernel-matrix builder vs the nested-vmap reference.

Runs through the Pallas interpreter on CPU; on TPU the same code path is
what ``Stationary.gram`` dispatches to.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import kernels
from tinygp_tpu.ops.pallas_gram import gram_tiled, supports_tiled_gram


def _reference(kernel, X1, X2):
    return jax.vmap(
        jax.vmap(kernel.evaluate, in_axes=(None, 0)), in_axes=(0, None)
    )(X1, X2)


@pytest.mark.parametrize(
    "kernel",
    [
        1.3 * kernels.Matern32(scale=1.7),
        kernels.ExpSquared(scale=0.8),
        kernels.ExpSineSquared(scale=2.0, gamma=0.9)
        + kernels.RationalQuadratic(alpha=1.1),
    ],
    ids=["matern32", "expsq", "composite"],
)
def test_matches_reference_1d(kernel):
    rng = np.random.default_rng(0)
    X1 = jnp.asarray(rng.uniform(0, 10, 21), jnp.float32)
    X2 = jnp.asarray(rng.uniform(0, 10, 13), jnp.float32)
    got = gram_tiled(kernel, X1, X2, tile=8, interpret=True)
    want = _reference(kernel, X1, X2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
    assert got.shape == (21, 13)


def test_matches_reference_2d_inputs():
    rng = np.random.default_rng(1)
    kernel = kernels.ExpSquared(scale=1.2)
    X1 = jnp.asarray(rng.normal(size=(17, 3)), jnp.float32)
    X2 = jnp.asarray(rng.normal(size=(9, 3)), jnp.float32)
    got = gram_tiled(kernel, X1, X2, tile=8, interpret=True)
    want = _reference(kernel, X1, X2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_gradients_match_reference():
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.uniform(0, 5, 12), jnp.float32)

    def loss(scale, builder):
        k = kernels.Matern32(scale=scale)
        if builder == "pallas":
            K = gram_tiled(k, X, X, tile=8, interpret=True)
        else:
            K = _reference(k, X, X)
        return jnp.sum(jnp.sin(K) * jnp.arange(12.0, dtype=jnp.float32))

    g1 = jax.grad(loss)(jnp.float32(1.4), "pallas")
    g2 = jax.grad(loss)(jnp.float32(1.4), "ref")
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-5)


def test_supports_gate():
    k = kernels.Matern32(scale=1.0)
    X32 = jnp.zeros(4, jnp.float32)
    assert supports_tiled_gram(k, X32, X32)
    # f64 inputs, pytree inputs, and 3-d inputs all fall back.
    if jax.config.jax_enable_x64:
        # Without x64, float64 silently becomes float32 and IS supported.
        assert not supports_tiled_gram(k, jnp.zeros(4, jnp.float64), X32)
    assert not supports_tiled_gram(k, (X32, X32), X32)
    assert not supports_tiled_gram(k, jnp.zeros((4, 2, 2), jnp.float32), X32)
    if jax.config.jax_enable_x64:
        # f64 parameters fall back too (unconstructible without x64).
        k64 = kernels.Matern32(scale=jnp.float64(1.0))
        assert not supports_tiled_gram(k64, X32, X32)
