"""Mosaic-lowering smoke tests for every shipped Pallas kernel.

Each test compiles (``jax.jit(...).lower(...).compile()`` — this runs both
the Pallas->Mosaic lowering that crashed BENCH_r04 and the Mosaic->TPU
compile) and then executes once at a minimal above-cutoff shape, checking
the result against the XLA strategy. This is the cheap rung between
"interpret-mode parity" and "the round's one official bench run".

Kernels covered:
- the generic single-pass monoid scan (``pallas_scan.py``), via the
  stacked log-likelihood with the fused kernel disabled;
- the fused log-likelihood kernel (``pallas_loglik.py``), forward AND
  gradient (the gradient exercises the forward-with-residuals Mosaic
  program plus the hand-written Riccati adjoint), at m = 1, 2, 3;
- the dense split-bf16 SYRK / in-place SYRK / panel-matmul kernels
  (``ops/pallas_dense.py``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinygp_tpu.ops import pallas_dense
from tinygp_tpu.solvers.quasisep import ops, scan

# Above the associative cutoff so supported()/supports() select the
# Pallas strategies, AND above one full production chunk (block 32 x 8
# sublanes x 128 lanes = 32768) so the kernels compile with their real
# tiling — a smaller N shrinks the block and masks VMEM overflows (the
# m=3 forward OOMed at N=1e5 while passing a 12k-point smoke, 2026-08-20).
N = 5 * 8192


def _operands(m, n=N, seed=0):
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    p = jnp.asarray(0.3 * rng.normal(size=(m, n)), jnp.float32)
    q = jnp.asarray(0.3 * rng.normal(size=(m, n)), jnp.float32)
    a = jnp.asarray(
        0.1 * rng.normal(size=(m * m, n))
        + 0.9 * np.eye(m).reshape(m * m, 1),
        jnp.float32,
    )
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    return d, p, q, a, y


def _loglik(d, p, q, a, y):
    quad, logdet = ops.stacked_loglik_terms(d, p, q, a, y)
    return -0.5 * quad - logdet


def _compile_and_run(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    return compiled(*args)


def _xla_reference(monkeypatch, fn, *args):
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "0")
    jax.clear_caches()
    try:
        return jax.jit(fn)(*args)
    finally:
        monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "1")
        jax.clear_caches()


@pytest.mark.parametrize("m", [1, 2, 3])
def test_fused_loglik_forward_lowers(m, monkeypatch):
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "1")
    jax.clear_caches()
    args = _operands(m)
    got = _compile_and_run(_loglik, *args)
    want = _xla_reference(monkeypatch, _loglik, *args)
    np.testing.assert_allclose(float(got), float(want), rtol=3e-4)


@pytest.mark.parametrize("m", [1, 2, 3])
def test_fused_loglik_gradient_lowers(m, monkeypatch):
    # m=3 with residuals is the VMEM high-water case (ADVICE r4): the
    # forward-with-residuals program writes m*m prefix outputs back.
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "1")
    jax.clear_caches()
    args = _operands(m)
    grad = jax.grad(_loglik, argnums=(0, 1, 2, 3, 4))
    got = _compile_and_run(grad, *args)
    want = _xla_reference(monkeypatch, grad, *args)
    for gg, gw in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=3e-3, atol=3e-3
        )


@pytest.mark.parametrize("m", [2, 3])
def test_generic_scan_kernel_lowers(m, monkeypatch):
    # Fused log-lik off -> stacked_loglik_terms runs the Riccati and
    # affine scans through pallas_monoid_scan (the generic kernel). m=3
    # (ctot=27 Riccati) is the fattest combine the kernel admits — the
    # m=4 Schur combine OOMs scoped VMEM at any block size and is capped
    # to the XLA strategy (scan.py:_riccati_scan_s).
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "1")
    monkeypatch.setenv("TINYGP_TPU_PALLAS_LOGLIK", "0")
    jax.clear_caches()
    args = _operands(m, seed=1)
    got = _compile_and_run(_loglik, *args)
    monkeypatch.delenv("TINYGP_TPU_PALLAS_LOGLIK")
    want = _xla_reference(monkeypatch, _loglik, *args)
    np.testing.assert_allclose(float(got), float(want), rtol=3e-4)


def test_dense_syrk_lowers():
    rng = np.random.default_rng(2)
    m, b = 512, 256
    T = jnp.asarray(rng.normal(size=(m, m)), jnp.float32)
    L = jnp.asarray(rng.normal(size=(m, b)), jnp.float32)
    got = _compile_and_run(
        lambda T, L: pallas_dense.syrk_sub(T, L, interpret=False), T, L
    )
    # Reference on the host: a jnp matmul on TPU would itself be bf16.
    want = np.asarray(T) - np.asarray(L) @ np.asarray(L).T
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=1e-4, atol=2e-3
    )


def test_dense_syrk_inplace_lowers():
    rng = np.random.default_rng(3)
    m, b = 768, 256
    off = 256
    T = jnp.asarray(rng.normal(size=(m, m)), jnp.float32)
    L = jnp.asarray(rng.normal(size=(m - off, b)), jnp.float32)
    got = _compile_and_run(
        lambda T, L: pallas_dense.syrk_sub_inplace(
            T, L, offset=off, interpret=False
        ),
        T,
        L,
    )
    want = np.asarray(T).copy()
    sub = want[off:, off:] - np.asarray(L) @ np.asarray(L).T
    want[off:, off:] = np.tril(sub) + np.triu(want[off:, off:], 1)
    got_lower = np.tril(np.asarray(got)[off:, off:])
    np.testing.assert_allclose(
        got_lower, np.tril(sub), rtol=1e-5, atol=1e-4
    )


def test_dense_blocked_loglik_lowers():
    """End-to-end blocked dense log-lik at minimal engaging N.

    Covers the syrk_sub_inplace extras variant (fused row sums-of-squares
    + whitening GEMV side outputs) that the interpret-mode suite runs in
    Python only.
    """
    from tinygp_tpu import GaussianProcess, kernels

    rng = np.random.default_rng(5)
    n = 4608  # just above ops.dense._MIN_BLOCKED
    X = jnp.asarray(np.sort(rng.uniform(0, 10, n)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)

    def loglik(X, y, blocked):
        kernel = 1.5 * kernels.Matern32(scale=2.5)
        gp = GaussianProcess(kernel, X, diag=0.1, blocked=blocked)
        return gp.log_probability(y)

    got = _compile_and_run(lambda X, y: loglik(X, y, True), X, y)
    want = jax.jit(lambda X, y: loglik(X, y, False))(X, y)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_dense_panel_matmul_lowers():
    rng = np.random.default_rng(4)
    rows, b = 512, 256
    A = jnp.asarray(rng.normal(size=(rows, b)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(b, b)), jnp.float32)
    got = _compile_and_run(
        lambda A, W: pallas_dense.split_panel_matmul(A, W, interpret=False),
        A,
        W,
    )
    want = np.asarray(A) @ np.asarray(W)
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=1e-4, atol=5e-3
    )
