"""Hand-written VJPs of the parallel scans vs AD of the sequential oracle.

The parallel strategies of ``affine_scan``/``congruence_scan``/
``riccati_scan`` carry custom VJPs (one opposite-direction scan each,
instead of AD through the blocked multi-level structure). The sequential
``lax.scan`` strategy has no custom rules, so its JAX-derived gradient is
the oracle. Mirrors the reference's sequential-vs-parallel equivalence
pattern (``/root/reference/tests/test_solvers/test_quasisep/test_ops.py:
39-76``) extended to cotangents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.solvers.quasisep.scan import (
    affine_scan,
    congruence_scan,
    riccati_scan,
)
from tinygp_tpu.test_utils import assert_allclose

N, M, R = 213, 2, 3


@pytest.fixture
def rng():
    return np.random.default_rng(5091986)


def _rand_inputs(rng):
    # Transitions scaled below 1 so long products stay well-conditioned.
    A = jnp.asarray(
        0.1 * rng.normal(size=(N, M, M)) + 0.85 * np.eye(M)
    )
    B = jnp.asarray(rng.normal(size=(N, M, R)))
    return A, B


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("exclusive", [False, True])
def test_affine_vjp(rng, reverse, exclusive):
    A, B = _rand_inputs(rng)
    ct = jnp.asarray(rng.normal(size=(N, M, R)))

    def run(parallel):
        def f(A, B):
            e = affine_scan(
                A, B, reverse=reverse, exclusive=exclusive, parallel=parallel
            )
            return jnp.sum(e * ct)

        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(A, B)

    (v_par, g_par), (v_seq, g_seq) = run(True), run(False)
    assert_allclose(v_par, v_seq)
    for gp, gs in zip(g_par, g_seq):
        assert_allclose(gp, gs)


@pytest.mark.parametrize("reverse", [False, True])
def test_congruence_vjp(rng, reverse):
    A, _ = _rand_inputs(rng)
    Braw = rng.normal(size=(N, M, M))
    B = jnp.asarray(Braw + np.swapaxes(Braw, -1, -2))  # symmetric loads
    ct = jnp.asarray(rng.normal(size=(N, M, M)))

    def run(parallel):
        def f(A, B):
            e = congruence_scan(A, B, reverse=reverse, parallel=parallel)
            return jnp.sum(e * ct)

        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(A, B)

    (v_par, g_par), (v_seq, g_seq) = run(True), run(False)
    assert_allclose(v_par, v_seq)
    assert_allclose(g_par[1], g_seq[1])
    assert_allclose(g_par[0], g_seq[0])


def _riccati_inputs(rng):
    # An SPD quasiseparable system (exact 2-term celerite structure) keeps
    # c2 > 0 all along the flow.
    a_, b_, c_, d_ = 1.8, 0.9, 0.8, 0.3
    t = np.sort(rng.uniform(0, 10, N))
    dt = np.diff(t, prepend=t[0])
    cos = np.cos(d_ * t)
    sin = np.sin(d_ * t)
    p = np.stack([a_ * cos + b_ * sin, a_ * sin - b_ * cos], axis=-1)
    q = np.stack([cos, sin], axis=-1)
    rot = np.zeros((N, M, M))
    rot[:, 0, 0] = rot[:, 1, 1] = np.cos(d_ * dt)
    rot[:, 0, 1] = np.sin(d_ * dt)
    rot[:, 1, 0] = -np.sin(d_ * dt)
    a = np.exp(-c_ * dt)[:, None, None] * rot
    diag = np.full(N, a_ + 1.0)
    return (
        jnp.asarray(diag),
        jnp.asarray(p),
        jnp.asarray(q),
        jnp.asarray(a),
    )


def test_riccati_vjp(rng):
    d, p, q, a = _riccati_inputs(rng)
    ct = jnp.asarray(rng.normal(size=(N, M, M)))

    def run(parallel):
        def f(d, p, q, a):
            F = riccati_scan(d, p, q, a, parallel=parallel)
            return jnp.sum(F * ct)

        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2, 3)))(d, p, q, a)

    (v_par, g_par), (v_seq, g_seq) = run(True), run(False)
    assert_allclose(v_par, v_seq)
    for gp, gs in zip(g_par, g_seq):
        assert_allclose(gp, gs)


def test_affine_vjp_second_order(rng):
    """The custom bwd is built from plain impls, so grad-of-grad works."""
    A, B = _rand_inputs(rng)
    ct = jnp.asarray(rng.normal(size=(N, M, R)))

    def f(parallel):
        def loss(A, B):
            e = affine_scan(A, B, parallel=parallel)
            return jnp.sum(jnp.tanh(e) * ct)

        def gnorm(A, B):
            gA, gB = jax.grad(loss, argnums=(0, 1))(A, B)
            return jnp.sum(gA**2) + jnp.sum(gB**2)

        return jax.jit(jax.grad(gnorm))(A, B)

    assert_allclose(f(True), f(False))  # grad w.r.t. A only (same shapes)


def test_riccati_vjp_under_vmap(rng):
    """Custom VJPs must compose with vmap (samplers vmap over chains)."""
    d, p, q, a = _riccati_inputs(rng)
    scales = jnp.asarray([0.5, 1.0, 2.0])

    def run(parallel):
        def f(s):
            F = riccati_scan(s * d, p, s * q, a, parallel=parallel)
            return jnp.sum(F**2)

        return jax.jit(jax.vmap(jax.grad(f)))(scales)

    assert_allclose(run(True), run(False))
