"""Interpret-mode parity of the fused single-pass log-likelihood kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.solvers.quasisep import ops, pallas_loglik, pallas_scan

M = 2
# Interpret mode executes the kernel in Python per grid step, so the
# test forces tiny tiles (chunk = 8*8*128 = 8192) and a short sequence
# spanning 2 chunks with a ragged tail.
N = 2 * 8192 + 777


@pytest.fixture
def operands():
    rng = np.random.default_rng(321)
    d = jnp.asarray(rng.uniform(1.0, 2.0, N), jnp.float32)
    p = jnp.asarray(0.3 * rng.normal(size=(M, N)), jnp.float32)
    q = jnp.asarray(0.3 * rng.normal(size=(M, N)), jnp.float32)
    a = jnp.asarray(
        0.1 * rng.normal(size=(M * M, N))
        + 0.9 * np.eye(M).reshape(M * M, 1),
        jnp.float32,
    )
    y = jnp.asarray(rng.normal(size=N), jnp.float32)
    return d, p, q, a, y


@pytest.mark.slow
def test_value_parity(operands, monkeypatch):
    monkeypatch.setattr(pallas_scan, "INTERPRET", True)
    monkeypatch.setenv("TINYGP_TPU_PALLAS_LLK_BLOCK", "8")
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "0")  # XLA reference
    want = ops.stacked_loglik_terms(*operands)
    got = pallas_loglik.fused_loglik_terms(*operands)
    # Different reduction association orders in f32; the totals are O(N).
    np.testing.assert_allclose(
        float(got[0]), float(want[0]), rtol=3e-4
    )
    np.testing.assert_allclose(
        float(got[1]), float(want[1]), rtol=3e-4
    )


@pytest.mark.slow
def test_gradient_parity(operands, monkeypatch):
    monkeypatch.setattr(pallas_scan, "INTERPRET", True)
    monkeypatch.setenv("TINYGP_TPU_PALLAS_LLK_BLOCK", "8")
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "0")
    d, p, q, a, y = operands

    def ref(d, p, q, a, y):
        quad, logdet = ops.stacked_loglik_terms(d, p, q, a, y)
        return -0.5 * quad - logdet

    def fused(d, p, q, a, y):
        quad, logdet = pallas_loglik.fused_loglik_terms(d, p, q, a, y)
        return -0.5 * quad - logdet

    g_want = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(d, p, q, a, y)
    g_got = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(d, p, q, a, y)
    for gw, gg in zip(g_want, g_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=3e-3, atol=3e-3
        )


def test_supported_gating(operands, monkeypatch):
    d, p, q, a, y = operands
    # Enablement is fail-closed: force ON so the structural checks below
    # are what is under test (the verdict plumbing has its own test).
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "1")
    # CPU without interpret mode: refuse.
    assert not pallas_loglik.supported(d, p, q, a, y)
    pallas_scan.INTERPRET = True
    try:
        assert pallas_loglik.supported(d, p, q, a, y)
        # Small N: the XLA strategy is already one cheap program.
        assert not pallas_loglik.supported(
            d[:100], p[:, :100], q[:, :100], a[:, :100], y[:100]
        )
        # Batched operands (vmapped chains): refuse.
        seen = []

        def probe(args):
            seen.append(pallas_loglik.supported(*args))
            return args[0].sum()

        jax.vmap(probe)(
            tuple(
                jnp.broadcast_to(x, (2,) + x.shape)
                for x in (d, p, q, a, y)
            )
        )
        assert seen == [False]
    finally:
        pallas_scan.INTERPRET = False
