"""Interpret-mode parity of the single-pass Pallas monoid scan.

``pallas_monoid_scan`` replaces the blocked XLA strategy of
``monoid_scan`` on TPU above the associative cutoff. These tests run the
kernel through the Pallas interpreter on CPU (slow but exact semantics)
against the XLA strategy, with tile shapes forced small enough that the
sequence spans several grid chunks — exercising the cross-chunk carry,
padding, output pruning, and both scan directions. Cheap logic (tile
selection, ``supports`` gating) is covered without the interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinygp_tpu.solvers.quasisep import pallas_scan, scan

M = 2
# Small forced tiles: chunk = block * 8 * lanes = 8 * 8 * 128 = 8192; the
# sequence length is chosen to span 3 chunks with a ragged tail.
BLOCK, LANES = 8, 128
N = 2 * 8192 + 777


@pytest.fixture
def elems():
    rng = np.random.default_rng(1234)
    A = jnp.asarray(
        rng.normal(size=(M * M, N)) * 0.2
        + np.eye(M).reshape(M * M, 1) * 0.8,
        jnp.float32,
    )
    b = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
    return A, b


def _affine_combine(earlier, later):
    A_e, b_e = earlier
    A_l, b_l = later
    return (
        scan._smm(A_l, A_e, M, M, M),
        scan._smv(A_l, b_e, M, M) + b_l,
    )


_IDENTITY = (
    np.eye(M).reshape(M * M, 1).astype(np.float32),
    np.zeros((M, 1), np.float32),
)


@pytest.mark.slow
@pytest.mark.parametrize("reverse", [False, True])
def test_interpret_parity(elems, reverse, monkeypatch):
    monkeypatch.setattr(pallas_scan, "INTERPRET", True)
    ref = scan.monoid_scan(
        _affine_combine, _IDENTITY, elems, reverse=reverse, pallas_ok=False
    )
    # NB ``_affine_combine`` is the forward-recurrence convention in both
    # scan directions (the combine convention and the scan direction are
    # independent), so the list twin is built with reverse=False.
    got = pallas_scan.pallas_monoid_scan(
        scan.affine_combine_lists(M, 1, False),
        _IDENTITY,
        elems,
        reverse=reverse,
        block=BLOCK,
        lanes=LANES,
    )
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4
        )


@pytest.mark.slow
def test_interpret_parity_riccati_pruned(monkeypatch):
    """The Riccati monoid through the kernel, with A and G pruned."""
    monkeypatch.setattr(pallas_scan, "INTERPRET", True)
    rng = np.random.default_rng(99)
    n = 8192 + 513
    d = jnp.asarray(rng.uniform(1.0, 2.0, n), jnp.float32)
    p = jnp.asarray(0.3 * rng.normal(size=(M, n)), jnp.float32)
    q = jnp.asarray(0.3 * rng.normal(size=(M, n)), jnp.float32)
    a = jnp.asarray(
        0.1 * rng.normal(size=(M * M, n))
        + 0.9 * np.eye(M).reshape(M * M, 1),
        jnp.float32,
    )
    inv_d = 1.0 / d
    A0 = a - scan._souter(q, p) * inv_d
    F0 = scan._souter(q, q) * inv_d
    G0 = -scan._souter(p, p) * inv_d
    identity = (
        np.eye(M).reshape(M * M, 1).astype(np.float32),
        np.zeros((M * M, 1), np.float32),
        np.zeros((M * M, 1), np.float32),
    )
    ref = scan._riccati_scan_s(d, p, q, a, M)
    got = pallas_scan.pallas_monoid_scan(
        scan.riccati_combine_lists(M),
        identity,
        (A0, F0, G0),
        needed=(1,),
        block=BLOCK,
        lanes=LANES,
    )
    # f32, and the two strategies associate the merges differently:
    # tolerance is accumulation-order noise, not a logic bound.
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref), rtol=2e-3, atol=2e-3
    )
    # Pruned leaves come back as zero placeholders of the right shape.
    assert got[0].shape == A0.shape
    assert not np.any(np.asarray(got[2]))


def test_supports_gating(elems, monkeypatch):
    monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "1")
    # CPU backend without interpret mode: refuse.
    assert not pallas_scan.supports(elems)
    pallas_scan.INTERPRET = True
    try:
        assert pallas_scan.supports(elems)
        # Non-f32 leaves: refuse.
        cast = tuple(x.astype(jnp.float64) for x in elems)
        if cast[0].dtype == jnp.float64:  # x64 enabled in the suite
            assert not pallas_scan.supports(cast)
        # Traced identities cannot inline as scalar literals: refuse.
        ident_verdicts = []

        def ident_probe(i):
            ident_verdicts.append(pallas_scan.supports(elems, (i, i)))
            return i

        jax.jit(ident_probe)(jnp.ones((1, 1), jnp.float32))
        assert ident_verdicts == [False]
        # Batched tracers (vmap): refuse, kernel carry logic is per-core.
        seen = []

        def probe(e):
            seen.append(pallas_scan.supports(e))
            return e[0].sum() + e[1].sum()

        jax.vmap(probe)(
            tuple(jnp.broadcast_to(x, (2,) + x.shape) for x in elems)
        )
        assert seen == [False]
        # Caller veto.
        assert not pallas_scan.supports(elems, combine_ok=False)
        # Kill switch: the strategy is opt-in per environment.
        monkeypatch.setenv("TINYGP_TPU_PALLAS_SCAN", "0")
        assert not pallas_scan.supports(elems)
    finally:
        pallas_scan.INTERPRET = False


def test_tile_selection_shrinks_for_small_n():
    b, ln = pallas_scan._pick_tiles(6, 10_000)
    assert b * 8 * ln <= 1 << 16
    # The m=2 Riccati (ctot=12) lands on the measured 64x128 optimum
    # (benchmarks/scan_iso.py sweep, 2026-08-20).
    assert pallas_scan._pick_tiles(12, 10**6) == (64, 128)
