"""Per-primitive parallel-vs-sequential pins for the named scan ops.

Parity target: ``/root/reference/tests/test_solvers/test_quasisep/
test_ops.py:39-76`` — each ``*_parallel`` kernel must agree with its
``lax.scan`` twin bit-for-tolerance, independent of the class layer, plus
dense-reconstruction ground truth for each primitive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.solvers.quasisep import ops
from tinygp_tpu.test_utils import assert_allclose


@pytest.fixture
def system():
    # A well-conditioned random order-2 quasiseparable system.
    rng = np.random.default_rng(101)
    n, m = 65, 2  # odd n: exercises the blocked scan's padding
    p = jnp.asarray(0.3 * rng.normal(size=(n, m)))
    q = jnp.asarray(0.3 * rng.normal(size=(n, m)))
    # Contractive transitions keep products bounded.
    a = jnp.asarray(
        0.8 * np.stack([np.eye(m) + 0.1 * rng.normal(size=(m, m))
                        for _ in range(n)])
    )
    d = jnp.asarray(2.0 + rng.uniform(size=n))
    x = jnp.asarray(rng.normal(size=(n, 3)))
    return d, p, q, a, x


def _dense_strict_lower(p, q, a):
    # M[i, j] = p_i (a_{i-1} ... a_{j+1}) q_j for i > j (E&G convention,
    # core.py docstring).
    n, m = p.shape
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(i):
            prod = np.eye(m)
            for k in range(i - 1, j, -1):
                prod = prod @ np.asarray(a[k])
            out[i, j] = np.asarray(p[i]) @ prod @ np.asarray(q[j])
    return out


def test_matmul_pairs_and_ground_truth(system):
    d, p, q, a, x = system
    Ld = _dense_strict_lower(p, q, a)

    seq = ops.lower_matmul(p, q, a, x)
    par = ops.lower_matmul_parallel(p, q, a, x)
    assert_allclose(par, seq)
    assert_allclose(seq, Ld @ np.asarray(x))

    sequ = ops.upper_matmul(p, q, a, x)
    paru = ops.upper_matmul_parallel(p, q, a, x)
    assert_allclose(paru, sequ)
    assert_allclose(sequ, Ld.T @ np.asarray(x))


def test_solve_pairs_and_ground_truth(system):
    d, p, q, a, x = system
    Ld = _dense_strict_lower(p, q, a) + np.diag(np.asarray(d))

    seq = ops.lower_solve(d, p, q, a, x)
    par = ops.lower_solve_parallel(d, p, q, a, x)
    assert_allclose(par, seq)
    assert_allclose(seq, np.linalg.solve(Ld, np.asarray(x)))

    sequ = ops.upper_solve(d, p, q, a, x)
    paru = ops.upper_solve_parallel(d, p, q, a, x)
    assert_allclose(paru, sequ)
    assert_allclose(sequ, np.linalg.solve(Ld.T, np.asarray(x)))


def test_cholesky_pair_and_ground_truth(system):
    d, p, q, a, _ = system
    # Build an SPD symmetric QSM: S = strict_lower + diag + strict_upper.
    Ld = _dense_strict_lower(p, q, a)
    diag = np.asarray(d) + np.abs(Ld).sum(1) + np.abs(Ld).sum(0) + 1.0
    S = Ld + Ld.T + np.diag(diag)

    cs, ws = ops.cholesky(jnp.asarray(diag), p, q, a)
    cp, wp = ops.cholesky_parallel(jnp.asarray(diag), p, q, a)
    assert_allclose(cp, cs)
    assert_allclose(wp, ws)

    # The emitted factor reconstructs the dense Cholesky of S.
    Lfac = _dense_strict_lower(p, ws, a) + np.diag(np.asarray(cs))
    assert_allclose(Lfac, np.linalg.cholesky(S))


def test_symm_inv_pair(system):
    d, p, q, a, _ = system
    Ld = _dense_strict_lower(p, q, a)
    diag = np.asarray(d) + np.abs(Ld).sum(1) + np.abs(Ld).sum(0) + 1.0
    S = Ld + Ld.T + np.diag(diag)

    seq = ops.symm_inv(jnp.asarray(diag), p, q, a)
    par = ops.symm_inv_parallel(jnp.asarray(diag), p, q, a)
    for s_part, p_part in zip(seq, par):
        assert_allclose(p_part, s_part, atol=1e-6)

    lam, t, s_gen, ell = seq
    inv_dense = (
        _dense_strict_lower(t, s_gen, ell)
        + _dense_strict_lower(t, s_gen, ell).T
        + np.diag(np.asarray(lam))
    )
    assert_allclose(inv_dense, np.linalg.inv(S), atol=1e-6)


def test_ops_jit_and_grad(system):
    d, p, q, a, x = system

    def loss(p_, parallel):
        f = ops.lower_matmul_parallel if parallel else ops.lower_matmul
        return jnp.sum(jnp.square(f(p_, q, a, x)))

    g_seq = jax.jit(jax.grad(lambda p_: loss(p_, False)))(p)
    g_par = jax.jit(jax.grad(lambda p_: loss(p_, True)))(p)
    assert_allclose(g_par, g_seq)


def test_ssolve_lsolve_m4_schur_matches_lu():
    """The m=4 closed-form block-Schur solve vs the batched-LU oracle.

    m=4 is the 2-term celerite case (the reference's flagship model,
    /root/reference/src/tinygp/kernels/quasisep.py:241-295): through the
    batched-LU fallback the N=1e5 log-lik measured 353 ms on the TPU; the
    Schur branch keeps the combine elementwise.
    """
    import numpy as np

    from tinygp_tpu.solvers.quasisep import scan as _scan

    rng = np.random.default_rng(11)
    n = 37
    # Near-identity operands, like the scan merges' M = I + F G.
    Mb = np.eye(4) + 0.2 * rng.normal(size=(n, 4, 4))
    Bb = rng.normal(size=(n, 4, 2))
    want = np.linalg.solve(Mb, Bb)

    # Stacked form: (m*m, N) / (m*r, N).
    Ms = jnp.asarray(np.moveaxis(Mb.reshape(n, 16), 0, -1))
    Bs = jnp.asarray(np.moveaxis(Bb.reshape(n, 8), 0, -1))
    got = _scan._ssolve(Ms, Bs, 4, 2)
    assert_allclose(
        np.moveaxis(np.asarray(got), -1, 0).reshape(n, 4, 2), want,
        atol=1e-6,
    )

    # Component-list form (the Pallas combine's representation).
    Ml = [Ms[k] for k in range(16)]
    Bl = [Bs[k] for k in range(8)]
    got_l = _scan._lsolve(Ml, Bl, 4, 2)
    got_l = np.moveaxis(np.stack(got_l), -1, 0).reshape(n, 4, 2)
    assert_allclose(got_l, want, atol=1e-6)
