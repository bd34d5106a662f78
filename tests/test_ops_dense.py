"""MXU-tiled dense ops: three-term split GEMMs and blocked Cholesky.

The split path claims f32-grade (~2^-24 operand) accuracy; these tests pin
that against float64 oracles, including an ill-conditioned GP covariance
of the kind that broke the round-1 two-term split.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.ops.dense import (
    blocked_cholesky,
    cholesky_with_fallback,
    split_matmul,
    split_syrk,
)


def _f64_chol(K32):
    return np.linalg.cholesky(np.asarray(K32, np.float64))


def test_split_matmul_accuracy():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(128, 192)), jnp.float32)
    exact = np.asarray(X, np.float64) @ np.asarray(Y, np.float64)
    approx = split_matmul(X, Y)
    rel = float(np.max(np.abs(approx - exact)) / np.max(np.abs(exact)))
    assert rel < 1e-6  # three-term splitting: ~2^-24 operand error


def test_split_matmul_transpose():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(96, 128)), jnp.float32)
    exact = np.asarray(X, np.float64) @ np.asarray(Y, np.float64).T
    approx = split_matmul(X, Y, transpose_y=True)
    rel = float(np.max(np.abs(approx - exact)) / np.max(np.abs(exact)))
    assert rel < 1e-6


def test_split_syrk_accuracy():
    rng = np.random.default_rng(2)
    L = jnp.asarray(rng.normal(size=(384, 256)), jnp.float32)
    exact = np.asarray(L, np.float64) @ np.asarray(L, np.float64).T
    approx = split_syrk(L)
    rel = float(np.max(np.abs(approx - exact)) / np.max(np.abs(exact)))
    assert rel < 1e-6
    np.testing.assert_array_equal(np.asarray(approx), np.asarray(approx).T)


def test_blocked_cholesky_well_conditioned():
    # Includes the pad-to-block-multiple path (1100 is not a 256 multiple).
    rng = np.random.default_rng(3)
    N = 1100
    A = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32) / np.sqrt(N))
    K = jnp.matmul(A, A.T, precision="highest") + jnp.eye(N)
    L = blocked_cholesky(K, block=256, min_size=0)
    Lx = _f64_chol(K)
    rel = float(np.max(np.abs(L - Lx)) / np.max(np.abs(Lx)))
    assert rel < 1e-5
    # strictly lower triangular output
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0


def test_blocked_cholesky_ill_conditioned_gp_covariance():
    # A squared-exponential Gram matrix with tiny jitter: cond(K) ~ 1e6.
    # The round-1 two-term split went indefinite (NaN) here; the three-term
    # split must stay finite and track the f64 factor.
    x = np.linspace(0.0, 10.0, 1024)
    K64 = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2)
    K64 += 3e-4 * np.eye(x.size)
    cond = np.linalg.cond(K64)
    assert cond > 3e5
    K = jnp.asarray(K64, jnp.float32)

    L = blocked_cholesky(K, block=256, min_size=0)
    assert bool(jnp.all(jnp.isfinite(L)))
    logdet = 2.0 * float(jnp.sum(jnp.log(jnp.diag(L))))
    logdet64 = 2.0 * float(np.sum(np.log(np.diag(np.linalg.cholesky(K64)))))
    assert abs(logdet - logdet64) < 1e-2 * abs(logdet64) + 1e-2

    # The factor reproduces K to ~f32 rounding * cond-driven growth.
    resid = np.asarray(L, np.float64) @ np.asarray(L, np.float64).T - K64
    assert np.max(np.abs(resid)) < 1e-4


def test_adaptive_split_order_both_branches():
    # High noise floor -> 2-term branch; low floor -> 3-term branch. Both
    # must factor the (well-conditioned) matrix correctly.
    rng = np.random.default_rng(11)
    Nn = 768
    A = jnp.asarray(rng.normal(size=(Nn, Nn)).astype(np.float32) / np.sqrt(Nn))
    K = jnp.matmul(A, A.T, precision="highest") + jnp.eye(Nn)
    Lx = _f64_chol(K)
    for floor in (jnp.float32(0.5), jnp.float32(1e-4)):
        L = cholesky_with_fallback(
            K, block=256, min_size=0, rel_floor=floor
        )
        rel = float(np.max(np.abs(L - Lx)) / np.max(np.abs(Lx)))
        assert rel < 1e-4, (float(floor), rel)

    # The adaptive path also survives the sqrt(eps)-jitter conditioning
    # (routed to 3 terms by the low floor).
    x = np.linspace(0.0, 10.0, 768)
    K64 = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2) + 3e-4 * np.eye(768)
    K = jnp.asarray(K64, jnp.float32)
    L = cholesky_with_fallback(
        K, block=256, min_size=0, rel_floor=jnp.float32(3e-4)
    )
    assert bool(jnp.all(jnp.isfinite(jnp.diagonal(L))))


def test_cholesky_with_fallback_matches_blocked_when_pd():
    rng = np.random.default_rng(4)
    N = 512
    A = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32) / np.sqrt(N))
    K = jnp.matmul(A, A.T, precision="highest") + jnp.eye(N)
    L = cholesky_with_fallback(K, block=256, min_size=0)
    Lb = blocked_cholesky(K, block=256, min_size=0)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lb), rtol=0, atol=0)


def test_cholesky_with_fallback_rescues_borderline_matrix():
    # An indefinite-at-f32 matrix: the blocked path NaNs, and the fallback
    # must hand back exactly what the native kernel produces.
    rng = np.random.default_rng(5)
    N = 512
    v = jnp.asarray(rng.normal(size=(N, 1)).astype(np.float32))
    K = jnp.matmul(v, v.T, precision="highest") - 1e-3 * jnp.eye(N)
    L = cholesky_with_fallback(K, block=256, min_size=0)
    Lx = jnp.linalg.cholesky(K)
    np.testing.assert_array_equal(np.asarray(L), np.asarray(Lx))


def test_blocked_cholesky_custom_vjp_matches_native():
    # The hand-written reverse rule must agree with XLA's own Cholesky
    # gradient; the Pallas forward is not reverse-differentiable, so this
    # is the only grad path for the blocked factorization.
    rng = np.random.default_rng(8)
    N = 512
    A = rng.normal(size=(N, N)).astype(np.float32) / np.sqrt(N)
    base = A @ A.T + np.eye(N, dtype=np.float32)

    def loss(s, chol):
        K = s * jnp.asarray(base)
        L = chol(K)
        return jnp.sum(jnp.log(jnp.diag(L))) + 1e-3 * jnp.sum(L)

    g_blocked = jax.grad(loss)(
        jnp.float32(1.3),
        lambda K: blocked_cholesky(K, block=256, min_size=0),
    )
    g_native = jax.grad(loss)(jnp.float32(1.3), jnp.linalg.cholesky)
    np.testing.assert_allclose(
        float(g_blocked), float(g_native), rtol=5e-5
    )


def test_blocked_cholesky_small_fallback():
    rng = np.random.default_rng(6)
    N = 64
    A = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32))
    K = jnp.matmul(A, A.T, precision="highest") + N * jnp.eye(N)
    np.testing.assert_array_equal(
        np.asarray(blocked_cholesky(K)), np.asarray(jnp.linalg.cholesky(K))
    )


def test_fallback_catches_silently_inaccurate_factor(monkeypatch):
    # ADVICE r2 (medium): a finite-but-wrong factor must trigger the native
    # re-factorization via the diagonal-reconstruction guard, not sail
    # through the NaN-only check. Simulate silent accuracy loss by
    # corrupting the blocked factor's scale by 1% (diag residual ~2%).
    import tinygp_tpu.ops.dense as dense_mod

    rng = np.random.default_rng(17)
    N = 512
    A = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32) / np.sqrt(N))
    K = jnp.matmul(A, A.T, precision="highest") + jnp.eye(N)

    real_blocked = dense_mod.blocked_cholesky
    monkeypatch.setattr(
        dense_mod,
        "blocked_cholesky",
        lambda K, **kw: real_blocked(K, **kw) * np.float32(1.01),
    )
    L = dense_mod.cholesky_with_fallback(K, block=256, min_size=0)
    Lx = jnp.linalg.cholesky(K)
    # Rescued: exactly the native factor, not the corrupted one.
    np.testing.assert_array_equal(np.asarray(L), np.asarray(Lx))


def test_fallback_passes_healthy_factor_through():
    # The residual guard must NOT fire on a healthy well-conditioned
    # factorization (else every call pays the native refactorization).
    rng = np.random.default_rng(18)
    N = 512
    A = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32) / np.sqrt(N))
    K = jnp.matmul(A, A.T, precision="highest") + jnp.eye(N)
    L = cholesky_with_fallback(K, block=256, min_size=0)
    Lb = blocked_cholesky(K, block=256, min_size=0)
    np.testing.assert_array_equal(np.asarray(L), np.asarray(Lb))


# ---------------------------------------------------------------------------
# Fused log-likelihood path (factor + whiten in one panel loop)
# ---------------------------------------------------------------------------


def _loglik_fixture(seed, N, diag=0.5):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(N, N)).astype(np.float32) / np.sqrt(N)
    K = jnp.asarray(A @ A.T + diag * np.eye(N), jnp.float32)
    r = jnp.asarray(rng.normal(size=N), jnp.float32)
    return K, r


def _native_terms_f64(K, r):
    K64 = np.asarray(K, np.float64)
    r64 = np.asarray(r, np.float64)
    L = np.linalg.cholesky(K64)
    a = np.linalg.solve(L, r64)
    return float(a @ a), float(np.sum(np.log(np.diag(L))))


def test_fused_loglik_matches_f64_oracle():
    from tinygp_tpu.ops.dense import blocked_loglik_terms

    for N in (768, 1100):  # exact block multiple and ragged/padded
        K, r = _loglik_fixture(11, N)
        for terms in (2, 3):
            quad, hld = jax.jit(
                lambda K, r, t=terms: blocked_loglik_terms(
                    K, r, block=256, min_size=0, terms=t
                )
            )(K, r)
            q0, h0 = _native_terms_f64(K, r)
            assert abs(float(quad) - q0) / abs(q0) < 5e-4, (N, terms)
            assert abs(float(hld) - h0) < 5e-3 * abs(h0) + 1e-2, (N, terms)


def test_fused_loglik_rel_floor_dispatch():
    from tinygp_tpu.ops.dense import blocked_loglik_terms

    K, r = _loglik_fixture(12, 512)
    q0, h0 = _native_terms_f64(K, r)
    for floor in (0.5, 1e-6):  # 2-term and 3-term runtime branches
        quad, hld = jax.jit(
            lambda K, r, f=floor: blocked_loglik_terms(
                K, r, block=256, min_size=0, rel_floor=jnp.float32(f)
            )
        )(K, r)
        assert abs(float(quad) - q0) / abs(q0) < 5e-4
        assert abs(float(hld) - h0) < 5e-3 * abs(h0) + 1e-2


def test_fused_loglik_breakdown_falls_back():
    # An indefinite matrix must route to the native branch and produce the
    # same NaNs the native kernel does (GP layer turns those into -inf).
    from tinygp_tpu.ops.dense import blocked_loglik_terms

    rng = np.random.default_rng(13)
    N = 512
    K = jnp.asarray(rng.normal(size=(N, N)), jnp.float32)
    K = 0.5 * (K + K.T)  # symmetric, indefinite
    r = jnp.asarray(rng.normal(size=N), jnp.float32)
    quad, hld = jax.jit(
        lambda K, r: blocked_loglik_terms(
            K, r, block=256, min_size=0, terms=2
        )
    )(K, r)
    assert not np.isfinite(float(quad)) or not np.isfinite(float(hld))


def test_fused_loglik_gradients_match_native():
    from tinygp_tpu.ops.dense import blocked_loglik_terms

    K, r = _loglik_fixture(14, 512)

    def fused(K, r):
        q, h = blocked_loglik_terms(K, r, block=256, min_size=0, terms=3)
        return -0.5 * q - h

    def native(K, r):
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return -0.5 * jnp.sum(a**2) - jnp.sum(jnp.log(jnp.diagonal(L)))

    gK, gr = jax.jit(jax.grad(fused, argnums=(0, 1)))(K, r)
    gK0, gr0 = jax.jit(jax.grad(native, argnums=(0, 1)))(K, r)
    scale = float(np.max(np.abs(gK0)))
    assert float(np.max(np.abs(gK - gK0))) < 5e-4 * scale
    rscale = float(np.max(np.abs(gr0)))
    assert float(np.max(np.abs(gr - gr0))) < 5e-4 * rscale


def test_direct_solver_fused_loglik_dispatch(monkeypatch):
    # The GP log-probability through DirectSolver must agree between the
    # fused path (forced by shrinking the size gate) and the generic route.
    import tinygp_tpu.ops.dense as dense_mod
    from tinygp_tpu import GaussianProcess, kernels

    rng = np.random.default_rng(15)
    N = 600
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)
    kernel = 1.5 * kernels.Matern32(scale=2.5)

    gp = GaussianProcess(kernel, X, diag=0.1)
    lp_generic = float(gp.log_probability(y))

    monkeypatch.setattr(dense_mod, "_MIN_BLOCKED", 256)
    gp2 = GaussianProcess(kernel, X, diag=0.1)
    lp_fused = float(gp2.log_probability(y))
    assert abs(lp_fused - lp_generic) < 5e-4 * abs(lp_generic) + 1e-3


def test_kernel_strip_loglik_matches_f64_oracle():
    # The strip-built path (gram never materialized) must agree with the
    # f64 oracle including the ragged/padded tail and both split orders.
    from tinygp_tpu import kernels
    from tinygp_tpu.ops.dense import kernel_loglik_terms

    rng = np.random.default_rng(21)
    N = 1100
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
    r = jnp.asarray(rng.normal(size=N), jnp.float32)
    kernel = kernels.Constant(jnp.float32(1.5)) * kernels.Matern32(
        scale=jnp.float32(2.5)
    )
    noise_diag = jnp.full(N, 0.1, jnp.float32)

    K = (kernel(X, X) + jnp.diag(noise_diag)).astype(jnp.float32)
    q0, h0 = _native_terms_f64(K, r)
    for floor in (0.5, 1e-6):
        quad, hld = jax.jit(
            lambda X, r, f=floor: kernel_loglik_terms(
                kernel, X, noise_diag, r, block=256,
                rel_floor=jnp.float32(f),
            )
        )(X, r)
        assert abs(float(quad) - q0) / abs(q0) < 5e-4, floor
        assert abs(float(hld) - h0) < 5e-3 * abs(h0) + 1e-2, floor


def test_kernel_strip_loglik_grad_matches_native():
    from tinygp_tpu import kernels
    from tinygp_tpu.ops.dense import kernel_loglik_terms

    rng = np.random.default_rng(22)
    N = 512
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
    r = jnp.asarray(rng.normal(size=N), jnp.float32)
    noise_diag = jnp.full(N, 0.1, jnp.float32)

    def fused(p):
        kernel = kernels.Constant(p["amp"]) * kernels.Matern32(
            scale=p["scale"]
        )
        q, h = kernel_loglik_terms(
            kernel, X, noise_diag, r, block=256, terms=3
        )
        return -0.5 * q - h

    def native(p):
        kernel = kernels.Constant(p["amp"]) * kernels.Matern32(
            scale=p["scale"]
        )
        K = kernel(X, X) + jnp.diag(noise_diag)
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return -0.5 * jnp.sum(a**2) - jnp.sum(jnp.log(jnp.diagonal(L)))

    p = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    v1, g1 = jax.jit(jax.value_and_grad(fused))(p)
    v0, g0 = jax.jit(jax.value_and_grad(native))(p)
    assert abs(float(v1) - float(v0)) < 5e-4 * abs(float(v0)) + 1e-3
    for k in p:
        assert abs(float(g1[k]) - float(g0[k])) < 2e-3 * abs(float(g0[k])) + 1e-3, k


