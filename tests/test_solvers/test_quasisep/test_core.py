import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.solvers.quasisep.core import (
    DiagQSM,
    LowerTriQSM,
    SquareQSM,
    StrictLowerTriQSM,
    StrictUpperTriQSM,
    SymmQSM,
    UpperTriQSM,
)
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture(params=[False, True], ids=["sequential", "parallel"])
def parallel(request):
    return request.param


@pytest.fixture(params=["random", "celerite"])
def matrices(request):
    return _build_matrices(request.param)


def _build_matrices(kind):
    N = 100
    rng = np.random.default_rng(1234)

    if kind == "random":
        m = 3
        # Stable random generators: contraction transitions keep the
        # products bounded over N steps.
        p = rng.normal(size=(N, m)) * 0.3
        q = rng.normal(size=(N, m)) * 0.3
        a = 0.6 * np.stack(
            [np.eye(m) + 0.1 * rng.normal(size=(m, m)) for _ in range(N)]
        )
        d = 3.0 + rng.uniform(size=N)
        l_gen = (p, q, a)
        # Independent upper generators for the square case.
        h = rng.normal(size=(N, m)) * 0.3
        g = rng.normal(size=(N, m)) * 0.3
        b = 0.6 * np.stack(
            [np.eye(m) + 0.1 * rng.normal(size=(m, m)) for _ in range(N)]
        )
        u_gen = (h, g, b)
    else:
        # An exact two-term celerite covariance as generators.
        t = np.sort(rng.uniform(0, 10, N))
        amps = np.array([1.2, 0.7])
        decay = np.array([0.4, 1.1])
        freq = np.array([1.0, 2.3])
        dt = np.diff(t, prepend=t[0])
        # Per term j: 2 states with rotation+decay transitions.
        blocks = []
        for c, w in zip(decay, freq):
            cos = np.cos(w * dt)
            sin = np.sin(w * dt)
            rot = np.stack(
                [
                    np.stack([cos, sin], axis=-1),
                    np.stack([-sin, cos], axis=-1),
                ],
                axis=-2,
            )
            blocks.append(np.exp(-c * dt)[:, None, None] * rot)
        a = np.zeros((N, 4, 4))
        a[:, :2, :2] = blocks[0]
        a[:, 2:, 2:] = blocks[1]
        h_obs = np.zeros((N, 4))
        h_obs[:, 0] = np.sqrt(amps[0])
        h_obs[:, 2] = np.sqrt(amps[1])
        q = h_obs
        p = np.einsum("nj,njk->nk", h_obs, a)
        d = amps.sum() + 1.0 + rng.uniform(size=N)
        l_gen = (p, q, a)
        u_gen = (p, q, a)

    d = jnp.asarray(d)
    lower = StrictLowerTriQSM(
        p=jnp.asarray(l_gen[0]), q=jnp.asarray(l_gen[1]), a=jnp.asarray(l_gen[2])
    )
    upper = StrictUpperTriQSM(
        p=jnp.asarray(u_gen[0]), q=jnp.asarray(u_gen[1]), a=jnp.asarray(u_gen[2])
    )
    return d, lower, upper


def _dense_lower(p, q, a):
    """Brute-force the E&G definition element by element."""
    p, q, a = map(np.asarray, (p, q, a))
    N, m = p.shape
    out = np.zeros((N, N))
    for i in range(N):
        for j in range(i):
            prod = np.eye(m)
            for k in range(j + 1, i):
                prod = a[k] @ prod
            out[i, j] = p[i] @ prod @ q[j]
    return out


def test_strict_lower_definition(matrices):
    _, lower, _ = matrices
    expect = _dense_lower(lower.p, lower.q, lower.a)
    assert_allclose(lower.to_dense(), expect)


def test_strict_upper_is_transpose(matrices):
    _, lower, _ = matrices
    assert_allclose(
        lower.transpose().to_dense(), np.asarray(lower.to_dense()).T
    )


def test_matmul_matches_dense(matrices, parallel):
    d, lower, upper = matrices
    N = d.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, 3)))

    for M in (
        DiagQSM(d=d),
        lower,
        upper,
        LowerTriQSM(diag=DiagQSM(d=d), lower=lower),
        UpperTriQSM(diag=DiagQSM(d=d), upper=upper),
        SquareQSM(diag=DiagQSM(d=d), lower=lower, upper=upper),
        SymmQSM(diag=DiagQSM(d=d), lower=lower),
    ):
        dense = M.to_dense()
        assert_allclose(M.matmul(x, parallel=parallel), dense @ x)
        # Vector rhs shape-handling
        assert_allclose(M.matmul(x[:, 0], parallel=parallel), dense @ x[:, 0])


def test_solve_matches_dense(matrices, parallel):
    d, lower, _ = matrices
    N = d.shape[0]
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.normal(size=(N, 2)))

    L = LowerTriQSM(diag=DiagQSM(d=d), lower=lower)
    dense = np.asarray(L.to_dense())
    assert_allclose(L.solve(y, parallel=parallel), np.linalg.solve(dense, y))

    U = L.transpose()
    assert_allclose(
        U.solve(y, parallel=parallel), np.linalg.solve(dense.T, y)
    )


def test_lower_inv_closed_form(matrices):
    d, lower, _ = matrices
    L = LowerTriQSM(diag=DiagQSM(d=d), lower=lower)
    dense = np.asarray(L.to_dense())
    assert_allclose(L.inv().to_dense(), np.linalg.inv(dense), atol=1e-5)
    U = L.transpose()
    assert_allclose(U.inv().to_dense(), np.linalg.inv(dense.T), atol=1e-5)


def test_cholesky_matches_dense(matrices, parallel):
    d, lower, _ = matrices
    M = SymmQSM(diag=DiagQSM(d=d), lower=lower)
    dense = np.asarray(M.to_dense())
    # Ensure positive definite for the test fixture
    w = np.linalg.eigvalsh(dense)
    assert w.min() > 0, "fixture must be positive definite"
    chol = M.cholesky(parallel=parallel)
    assert_allclose(chol.to_dense(), np.linalg.cholesky(dense))


def test_symm_inv_matches_dense(matrices, parallel):
    d, lower, _ = matrices
    M = SymmQSM(diag=DiagQSM(d=d), lower=lower)
    dense = np.asarray(M.to_dense())
    assert_allclose(
        M.inv(parallel=parallel).to_dense(), np.linalg.inv(dense), atol=1e-5
    )


def test_square_inv_matches_dense(matrices):
    d, lower, upper = matrices
    M = SquareQSM(diag=DiagQSM(d=d), lower=lower, upper=upper)
    dense = np.asarray(M.to_dense())
    assert_allclose(M.inv().to_dense(), np.linalg.inv(dense), atol=1e-4)
    # Round trip
    assert_allclose(
        M.inv().inv().to_dense(), dense, atol=1e-4
    )


def test_sequential_parallel_equivalence(matrices):
    d, lower, _ = matrices
    N = d.shape[0]
    rng = np.random.default_rng(9)
    y = jnp.asarray(rng.normal(size=(N,)))

    M = SymmQSM(diag=DiagQSM(d=d), lower=lower)
    chol_seq = M.cholesky(parallel=False)
    chol_par = M.cholesky(parallel=True)
    assert_allclose(chol_par.diag.d, chol_seq.diag.d)
    assert_allclose(chol_par.lower.q, chol_seq.lower.q)
    assert_allclose(
        chol_par.solve(y, parallel=True), chol_seq.solve(y, parallel=False)
    )
    assert_allclose(
        M.matmul(y, parallel=True), M.matmul(y, parallel=False)
    )


def test_elementwise_algebra(matrices):
    d, lower, upper = matrices
    M1 = SymmQSM(diag=DiagQSM(d=d), lower=lower)
    M2 = SquareQSM(diag=DiagQSM(d=2.0 * d), lower=lower, upper=upper)
    dense1 = np.asarray(M1.to_dense())
    dense2 = np.asarray(M2.to_dense())

    assert_allclose((M1 + M2).to_dense(), dense1 + dense2)
    assert_allclose((M1 - M2).to_dense(), dense1 - dense2)
    assert_allclose((M1 * M2).to_dense(), dense1 * dense2)
    assert_allclose((M1 * 2.5).to_dense(), 2.5 * dense1)
    assert_allclose((-M1).to_dense(), -dense1)


def test_qsm_matmul_combinations(matrices):
    d, lower, upper = matrices
    M1 = SymmQSM(diag=DiagQSM(d=d), lower=lower)
    M2 = SquareQSM(diag=DiagQSM(d=2.0 * d), lower=lower, upper=upper)
    L = LowerTriQSM(diag=DiagQSM(d=d), lower=lower)
    U = UpperTriQSM(diag=DiagQSM(d=d), upper=upper)
    D = DiagQSM(d=d)

    for A in (D, L, U, M1, M2):
        for B in (D, L, U, M1, M2):
            result = A @ B
            if result is None:
                continue
            assert_allclose(
                result.to_dense(),
                np.asarray(A.to_dense()) @ np.asarray(B.to_dense()),
                atol=1e-5,
            )


def test_gram(matrices):
    d, lower, upper = matrices
    M = SquareQSM(diag=DiagQSM(d=d), lower=lower, upper=upper)
    dense = np.asarray(M.to_dense())
    assert_allclose(M.gram().to_dense(), dense.T @ dense, atol=1e-5)


def test_jit_roundtrip(matrices, parallel):
    d, lower, _ = matrices
    M = SymmQSM(diag=DiagQSM(d=d), lower=lower)

    @jax.jit
    def solve(M, y):
        return M.cholesky(parallel=parallel).solve(y, parallel=parallel)

    N = d.shape[0]
    y = jnp.ones(N)
    dense = np.asarray(M.to_dense())
    expect = np.linalg.solve(np.linalg.cholesky(dense), np.ones(N))
    assert_allclose(solve(M, y), expect)
