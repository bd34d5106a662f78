import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.noise import Banded, Diagonal
from tinygp_tpu.solvers import DirectSolver, QuasisepSolver
from tinygp_tpu.test_utils import assert_allclose

# Cross-strategy agreement floor: tiny posterior variances are
# cancellation-prone, so the absolute floor scales with the mode's eps.
ATOL = 1e-6 if jax.config.jax_enable_x64 else 5e-5

# Matched (quasisep, dense) kernel pairs
PAIRS = [
    (quasisep.Matern32(scale=1.8, sigma=1.2), 1.44 * kernels.Matern32(scale=1.8)),
    (quasisep.Matern52(scale=1.1), kernels.Matern52(scale=1.1)),
    (quasisep.Exp(scale=0.9), kernels.Exp(scale=0.9)),
    (
        quasisep.Exp(scale=1.5) + quasisep.Cosine(scale=2.0, sigma=0.8),
        kernels.Exp(scale=1.5) + 0.64 * kernels.Cosine(scale=2.0),
    ),
]


@pytest.fixture
def data():
    rng = np.random.default_rng(9)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, 75)))
    y = jnp.asarray(np.sin(np.asarray(X)) + 0.1 * rng.normal(size=75))
    return X, y


@pytest.fixture(params=[False, True], ids=["sequential", "parallel"])
def parallel(request):
    return request.param


@pytest.mark.parametrize("pair", PAIRS, ids=["m32", "m52", "exp", "sum"])
def test_cross_solver_consistency(pair, data, request):
    # Runs in parallel-scan mode (the TPU default) only: the sequential
    # twin of every scan is pinned against the parallel one in test_core /
    # test_scan_vjp, and compiling the full conditioning graph on the
    # sequential path is by far the slowest thing the suite does. One
    # compact end-to-end sequential check lives below. The conditioning
    # legs — whose compiles dominate the whole suite's wall time — run for
    # one low-order and one composite kernel; the other kernels' general
    # conditioning is covered structurally by the same code path.
    qk, dk = pair
    X, y = data
    gp_q = GaussianProcess(qk, X, diag=0.1, parallel=True)
    gp_d = GaussianProcess(dk, X, diag=0.1, solver=DirectSolver)

    assert isinstance(gp_q.solver, QuasisepSolver)

    # covariance / variance / normalization / log_prob
    assert_allclose(gp_q.covariance, gp_d.covariance, atol=ATOL)
    assert_allclose(gp_q.variance, gp_d.variance)
    assert_allclose(
        gp_q.solver.normalization(), gp_d.solver.normalization()
    )
    assert_allclose(gp_q.log_probability(y), gp_d.log_probability(y))

    # bit-compatible sampling (same whitening convention)
    key = jax.random.PRNGKey(11)
    assert_allclose(gp_q.sample(key, (5,)), gp_d.sample(key, (5,)))

    if "m32" not in request.node.name:
        # The conditioning-graph compile is the single most expensive
        # compile the CPU CI does (~400 s for whichever kernel goes
        # first); it is kernel-independent machinery, so one kernel
        # carries it here. Sum/Block-specific conditioning is covered by
        # test_block.py and the non-reversible suite.
        return

    # conditioning at train points and at new points
    lq, cq = gp_q.condition(y)
    ld, cd = gp_d.condition(y)
    assert_allclose(lq, ld)
    assert_allclose(cq.loc, cd.loc, atol=ATOL)
    assert_allclose(cq.variance, cd.variance, atol=ATOL)

    X_test = jnp.linspace(-0.5, 10.5, 33)
    _, cq = gp_q.condition(y, X_test)
    _, cd = gp_d.condition(y, X_test)
    assert_allclose(cq.loc, cd.loc, atol=ATOL)
    assert_allclose(cq.variance, cd.variance, atol=ATOL)


def test_sequential_mode_end_to_end(data):
    """The sequential-scan solver agrees with the parallel one through the
    full user API (log-prob, sampling, conditioning) on one kernel."""
    X, y = data
    kq = quasisep.Matern32(scale=1.8, sigma=1.2)
    gp_s = GaussianProcess(kq, X, diag=0.1, parallel=False)
    gp_p = GaussianProcess(kq, X, diag=0.1, parallel=True)
    assert_allclose(gp_s.log_probability(y), gp_p.log_probability(y))
    key = jax.random.PRNGKey(11)
    assert_allclose(gp_s.sample(key, (3,)), gp_p.sample(key, (3,)))
    ls, cs = gp_s.condition(y)
    lp, cp = gp_p.condition(y)
    assert_allclose(ls, lp)
    assert_allclose(cs.loc, cp.loc, atol=ATOL)
    assert_allclose(cs.variance, cp.variance, atol=ATOL)


def test_unsorted_raises_eagerly(data):
    X, y = data
    X_bad = jnp.concatenate([X[10:], X[:10]])
    with pytest.raises(ValueError):
        GaussianProcess(quasisep.Matern32(scale=1.0), X_bad, diag=0.1)


def test_unsorted_poisons_log_prob_in_jit(data):
    X, y = data

    @jax.jit
    def lp(X):
        gp = GaussianProcess(quasisep.Matern32(scale=1.0), X, diag=0.1)
        return gp.log_probability(y)

    assert np.isfinite(float(lp(X)))
    X_bad = jnp.concatenate([X[10:], X[:10]])
    assert float(lp(X_bad)) == -np.inf


def test_assume_sorted_skips_check(data):
    X, y = data

    @jax.jit
    def lp(X):
        gp = GaussianProcess(
            quasisep.Matern32(scale=1.0), X, diag=0.1, assume_sorted=True
        )
        return gp.log_probability(y)

    assert np.isfinite(float(lp(X)))


def test_banded_noise(data):
    X, y = data
    N = X.shape[0]
    rng = np.random.default_rng(21)
    diag = 1.0 + rng.uniform(size=N)
    off = 0.1 * rng.normal(size=(N, 2))
    noise = Banded(diag=jnp.asarray(diag), off_diags=jnp.asarray(off))

    kq = quasisep.Matern32(scale=1.5)
    gp_q = GaussianProcess(kq, X, noise=noise)
    gp_d = GaussianProcess(
        kernels.Matern32(scale=1.5), X, noise=noise, solver=DirectSolver
    )
    assert_allclose(gp_q.log_probability(y), gp_d.log_probability(y))


def test_condition_stays_qsm(data):
    X, y = data
    gp = GaussianProcess(quasisep.SHO(omega=1.0, quality=4.0), X, diag=0.1)
    _, cond = gp.condition(y)
    # The same-points quasisep path keeps the posterior covariance as a QSM,
    # so the conditioned GP's solver is again an O(N) QuasisepSolver.
    from tinygp_tpu.solvers.quasisep.core import SymmQSM

    assert isinstance(cond.solver, QuasisepSolver)
    assert isinstance(cond.solver.matrix, SymmQSM)


def test_grad_matches_dense(data, parallel):
    X, y = data

    def loss_q(scale):
        gp = GaussianProcess(
            quasisep.Matern32(scale=scale), X, diag=0.1, parallel=parallel
        )
        return gp.log_probability(y)

    def loss_d(scale):
        gp = GaussianProcess(
            kernels.Matern32(scale=scale), X, diag=0.1, solver=DirectSolver
        )
        return gp.log_probability(y)

    g_q = jax.grad(loss_q)(1.7)
    g_d = jax.grad(loss_d)(1.7)
    assert_allclose(g_q, g_d, atol=1e-5)
