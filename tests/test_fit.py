"""The compiled MAP fitter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import GaussianProcess, fit_map, kernels
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture
def gp_data():
    rng = np.random.default_rng(11)
    X = jnp.asarray(np.sort(rng.uniform(0, 8, 60)))
    y = jnp.sin(1.3 * X) + 0.1 * jnp.asarray(rng.normal(size=60))
    return X, y


def test_quadratic_exact():
    target = {"a": jnp.asarray([1.0, -2.0]), "b": jnp.asarray(3.0)}
    loss = lambda p: (
        jnp.sum((p["a"] - target["a"]) ** 2) + (p["b"] - target["b"]) ** 2
    )
    init = {"a": jnp.zeros(2), "b": jnp.asarray(0.0)}
    res = fit_map(loss, init, num_steps=800, learning_rate=0.1)
    assert float(res.loss) < 1e-6
    np.testing.assert_allclose(np.asarray(res.params["a"]), [1.0, -2.0], atol=1e-3)
    assert bool(res.converged)
    assert res.losses.shape == (800,)


def test_gp_hyperparameters_improve(gp_data):
    X, y = gp_data

    def loss(p):
        kernel = jnp.exp(p["log_amp"]) * kernels.ExpSquared(
            scale=jnp.exp(p["log_scale"])
        )
        return -GaussianProcess(kernel, X, diag=0.01).log_probability(y)

    init = {"log_amp": jnp.asarray(2.0), "log_scale": jnp.asarray(-2.0)}
    res = fit_map(loss, init, num_steps=300, learning_rate=0.1)
    assert float(res.loss) < float(loss(init)) - 1.0
    # Best-so-far loss must match re-evaluating the returned params
    # (dtype-aware: f32 recomputation jitters at ~1e-5 relative).
    assert_allclose(loss(res.params), res.loss)


def test_nonfinite_excursions_do_not_win():
    # loss = -log(x) for x>0; negative x yields nan. Start near zero with a
    # hot learning rate so the iterates overshoot into the invalid region.
    loss = lambda p: -jnp.log(p["x"]) + p["x"]
    res = fit_map(loss, {"x": jnp.asarray(0.05)}, num_steps=200,
                  learning_rate=0.5)
    assert np.isfinite(float(res.loss))
    assert float(res.loss) >= 1.0 - 1e-5  # min of x - log x is 1 at x=1


def test_custom_optimizer():
    import optax

    loss = lambda p: jnp.sum(p**2)
    res = fit_map(
        loss,
        jnp.ones(3),
        optimizer=optax.sgd(0.2),
        num_steps=100,
    )
    assert float(res.loss) < 1e-4


def test_flat_but_diverged_tail_not_converged():
    # ADVICE r2: a trajectory that leaves its optimum and then sits flat at
    # a much worse loss must not report converged (the final window is
    # "flat" but nowhere near best_loss).
    import optax

    def leave_then_freeze():
        def init(params):
            return jnp.zeros((), jnp.int32)

        def update(grads, state, params=None):
            step = state
            upd = jax.tree_util.tree_map(
                lambda g: jnp.where(
                    step < 50,
                    -0.2 * g,
                    jnp.where(step == 50, 10.0, 0.0),
                ),
                grads,
            )
            return upd, state + 1

        return optax.GradientTransformation(init, update)

    loss = lambda x: jnp.sum(x**2)
    res = fit_map(
        loss,
        jnp.asarray([1.0]),
        optimizer=leave_then_freeze(),
        num_steps=200,
    )
    assert float(res.loss) < 1e-3  # best tracked from the descent phase
    assert float(res.losses[-1]) > 50.0  # tail is far from best
    assert not bool(res.converged)


def test_rising_tail_not_converged():
    # Divergent SGD: losses increase, so per-step "drops" are negative;
    # |mean drop| must flag this as not converged.
    import optax

    loss = lambda x: jnp.sum(x**2)
    res = fit_map(
        loss, jnp.asarray([1.0]), optimizer=optax.sgd(1.5), num_steps=100
    )
    assert not bool(res.converged)
