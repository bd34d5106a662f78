"""Interpret-mode parity of the single-pass Pallas monoid scan.

``pallas_monoid_scan`` replaces the blocked XLA strategy of
``monoid_scan`` on TPU above the associative cutoff. These tests run the
kernel through the Pallas interpreter on CPU (slow but exact semantics)
against the XLA strategy, with tile shapes forced small enough that the
sequence spans several grid chunks — exercising the cross-chunk carry,
padding, and both scan directions. Cheap logic (tile selection,
``supports`` gating) is covered without the interpreter.
"""

import functools

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
    jnp.asarray(np.eye(M).reshape(M * M, 1), jnp.float32),
    jnp.zeros((M, 1), jnp.float32),
)


@pytest.mark.slow
@pytest.mark.parametrize("reverse", [False, True])
def test_interpret_parity(elems, reverse, monkeypatch):
    monkeypatch.setattr(pallas_scan, "INTERPRET", True)
    ref = scan.monoid_scan(
        _affine_combine, _IDENTITY, elems, reverse=reverse, pallas_ok=False
    )
    got = pallas_scan.pallas_monoid_scan(
        _affine_combine,
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
    b2, ln2 = pallas_scan._pick_tiles(6, 10**6)
    assert b2 * 8 * ln2 * 6 * 4 <= pallas_scan._CHUNK_BYTES
