import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import expm

from tinygp_tpu.kernels import quasisep
from tinygp_tpu.solvers.quasisep.block import ensure_dense
from tinygp_tpu.test_utils import assert_allclose


def _kernel_cases():
    return [
        quasisep.Exp(scale=1.5, sigma=1.3),
        quasisep.Matern32(scale=2.0, sigma=0.8),
        quasisep.Matern52(scale=1.1, sigma=1.1),
        quasisep.Cosine(scale=2.3, sigma=0.7),
        quasisep.Celerite(a=1.2, b=0.3, c=0.4, d=1.1),
        quasisep.SHO(omega=1.5, quality=3.0, sigma=1.1),
        quasisep.SHO(omega=1.5, quality=0.2, sigma=1.1),
        quasisep.SHO(omega=1.5, quality=0.5, sigma=1.1),
        quasisep.Exp(scale=1.5) + quasisep.Matern32(scale=2.0),
        quasisep.Exp(scale=1.5) * quasisep.Matern32(scale=2.0),
        quasisep.Sum(
            quasisep.Exp(scale=1.5), quasisep.Cosine(scale=2.0), use_block=False
        ),
        2.5 * quasisep.Matern52(scale=1.3),
        quasisep.CARMA(alpha=np.array([1.4, 2.3]), beta=np.array([1.0, 0.1])),
    ]


CASE_IDS = [
    "Exp", "Matern32", "Matern52", "Cosine", "Celerite", "SHO-under",
    "SHO-over", "SHO-critical", "Sum", "Product", "SumDense", "Scale",
    "CARMA",
]


@pytest.fixture
def data():
    rng = np.random.default_rng(84)
    X = jnp.asarray(np.sort(rng.uniform(0, 8, 40)))
    y = jnp.asarray(rng.normal(size=40))
    return X, y


@pytest.mark.parametrize("kernel", _kernel_cases(), ids=CASE_IDS)
def test_transition_matches_expm(kernel):
    """transition_matrix must equal expm(F^T dt) for the SSM to be valid."""
    dt = 0.37
    F = ensure_dense(kernel.design_matrix())
    A = ensure_dense(kernel.transition_matrix(0.1, 0.1 + dt))
    assert_allclose(A, expm(F.T * dt), atol=1e-6)


@pytest.mark.parametrize("kernel", _kernel_cases(), ids=CASE_IDS)
def test_qsm_matches_pointwise(kernel, data):
    X, _ = data
    K_dense = kernel(X, X)
    K_qsm = kernel.to_symm_qsm(X).to_dense()
    assert_allclose(K_qsm, K_dense, atol=1e-6)


@pytest.mark.parametrize("kernel", _kernel_cases(), ids=CASE_IDS)
def test_matmul_matches_dense(kernel, data):
    X, y = data
    assert_allclose(
        kernel.matmul(X, y=y), np.asarray(kernel(X, X)) @ np.asarray(y),
        atol=1e-6,
    )


@pytest.mark.parametrize("kernel", _kernel_cases(), ids=CASE_IDS)
def test_rectangular_matmul(kernel, data):
    X, y = data
    rng = np.random.default_rng(3)
    # Interleaved, extrapolating test points
    X1 = jnp.asarray(np.sort(rng.uniform(-1, 9, 23)))
    expect = np.asarray(kernel(X1, X)) @ np.asarray(y)
    assert_allclose(kernel.matmul(X1, X, y), expect, atol=1e-6)


@pytest.mark.parametrize("kernel", _kernel_cases(), ids=CASE_IDS)
def test_variance_closed_form(kernel, data):
    X, _ = data
    assert_allclose(
        kernel(X), np.diag(np.asarray(kernel(X, X))), atol=1e-6
    )


def test_sho_evaluate_forms():
    tau = np.abs(np.linspace(-3, 3, 13))
    w, s = 1.7, 1.2

    # Overdamped
    q = 0.3
    f = np.sqrt(1 - 4 * q**2)
    arg = 0.5 * w * tau / q
    expect = s**2 * np.exp(-arg) * (np.cosh(f * arg) + np.sinh(f * arg) / f)
    k = quasisep.SHO(omega=w, quality=q, sigma=s)
    got = [float(k.evaluate(0.0, t)) for t in tau]
    assert_allclose(got, expect, atol=1e-6)

    # Underdamped
    q = 3.0
    g = np.sqrt(4 * q**2 - 1)
    arg = 0.5 * w * tau / q
    expect = s**2 * np.exp(-arg) * (np.cos(g * arg) + np.sin(g * arg) / g)
    k = quasisep.SHO(omega=w, quality=q, sigma=s)
    got = [float(k.evaluate(0.0, t)) for t in tau]
    assert_allclose(got, expect, atol=1e-6)

    # Critical
    k = quasisep.SHO(omega=w, quality=0.5, sigma=s)
    expect = s**2 * np.exp(-w * tau) * (1 + w * tau)
    got = [float(k.evaluate(0.0, t)) for t in tau]
    assert_allclose(got, expect, atol=1e-6)


def test_sho_gradients_all_regimes():
    for q in (0.2, 0.5, 3.0):
        g = jax.grad(
            lambda p: quasisep.SHO(omega=p[0], quality=p[1]).evaluate(0.0, 1.3)
        )(jnp.array([1.5, q]))
        assert np.all(np.isfinite(np.asarray(g))), q


def test_celerite_evaluate_form():
    a, b, c, d = 1.2, 0.3, 0.4, 1.1
    k = quasisep.Celerite(a=a, b=b, c=c, d=d)
    tau = np.abs(np.linspace(-2, 2, 9))
    expect = np.exp(-c * tau) * (a * np.cos(d * tau) + b * np.sin(d * tau))
    got = [float(k.evaluate(0.0, t)) for t in tau]
    assert_allclose(got, expect, atol=1e-6)


def test_algebra_type_errors():
    k = quasisep.Exp(scale=1.0)
    from tinygp_tpu import kernels as dense_kernels

    with pytest.raises(ValueError):
        k + dense_kernels.Matern32()
    with pytest.raises(ValueError):
        k * dense_kernels.Matern32()
    with pytest.raises(ValueError):
        k * jnp.ones(3)


@pytest.mark.parametrize("kernel", _kernel_cases(), ids=CASE_IDS)
def test_pytree_jit_roundtrip(kernel, data):
    X, y = data
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert_allclose(rebuilt(X), kernel(X))

    @jax.jit
    def matvec(k, X, y):
        return k.matmul(X, y=y)

    assert_allclose(matvec(kernel, X, y), kernel.matmul(X, y=y))


def test_carma_matches_celerite_limit():
    # CARMA(2, 1) with complex roots reduces to a celerite-style kernel;
    # check its ACVF against direct evaluation on a grid.
    alpha = np.array([1.4, 2.3])
    beta = np.array([1.0, 0.1])
    k = quasisep.CARMA(alpha=alpha, beta=beta)
    X = jnp.asarray(np.sort(np.random.default_rng(1).uniform(0, 10, 30)))
    K = np.asarray(k(X, X))
    # Symmetric PSD-ish sanity
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    w = np.linalg.eigvalsh(K + 1e-8 * np.eye(30))
    assert w.min() > -1e-6


def test_carma_from_quads():
    k1 = quasisep.CARMA.from_quads(
        jnp.array([1.1, 1.2]), jnp.array([0.9]), jnp.array([0.3])
    )
    X = jnp.asarray(np.linspace(0, 5, 11))
    K = np.asarray(k1(X, X))
    np.testing.assert_allclose(K, K.T, atol=1e-10)
