"""Single-pass Pallas TPU kernel for the blocked exclusive monoid scan.

The XLA strategy in :mod:`tinygp_tpu.solvers.quasisep.scan` runs the blocked
scan as three separate phases (block-local ``lax.scan``, recursion on block
totals, one recombine pass). On the TPU that structure is dispatch-latency
bound: each of the ~128 unrolled while-loop steps pays a fixed per-step cost
(~7 us measured at N = 1e6) against a 2-3 us floor, totalling ~0.9 ms — the
dominant share of the quasiseparable log-likelihood's gap to its HBM roofline
(``docs/rooflines.md`` §2).

This module collapses the whole scan into ONE pass over HBM with a
decoupled-lookback kernel, exploiting the fact that a Pallas TPU grid is
executed *sequentially* on a core:

- The sequence is tiled as ``(chunk, step, sub, lane)`` with
  ``n = ((g·8 + i)·L + l)·B + s``: grid axis ``g`` walks chunks in order,
  each chunk holding ``8·L`` blocks of ``B`` consecutive elements laid out
  so every per-component vector op runs on full ``(8, L)`` vregs.
- Per chunk, the kernel runs the ``B``-step block-local scan (batched over
  all ``8·L`` blocks), an in-register Kogge–Stone prefix over the lane axis,
  a tiny 8-step sublane prefix, and folds in a running cross-chunk carry
  held in VMEM scratch — so block prefixes never round-trip through HBM and
  there is no second pass over the data.
- DMA of chunk ``g+1`` overlaps compute of chunk ``g`` (the grid axis is
  declared ``ARBITRARY``, preserving order).

The combine monoids are the stacked-layout closures from ``scan.py``
(components on axis -2, lanes last), which broadcast over the leading
``(step, sub)`` axes unchanged, so this kernel serves the affine, congruence,
and Riccati recurrences alike. Reference math being accelerated:
``/root/reference/src/tinygp/solvers/quasisep/ops.py:296-512``.
"""

from __future__ import annotations

__all__ = ["pallas_monoid_scan", "supports"]

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 8  # sublane rows per chunk; one vreg worth of blocks per lane column

# Interpret mode for CPU-side unit tests of the kernel logic.
INTERPRET = False

# Per-buffer VMEM budget (bytes). Four live copies of a chunk exist at peak
# (double-buffered input + output) plus the prefix-phase temporaries; the
# 3 MB budget measured 25.7 MB of scoped VMEM against the 16 MB limit on a
# real v5e (m=2 Riccati, block=32, lanes=256), so it sits at 1 MB now —
# block=10 steps per chunk, ~8 MB scoped.
_CHUNK_BYTES = 2**20


def _is_tracer_batched(x) -> bool:
    try:
        from jax._src.interpreters import batching
    except Exception:  # pragma: no cover - internal API moved
        # Fail CLOSED: if batching can no longer be detected, treat every
        # tracer as potentially vmapped so supports() rejects it — the
        # sequential grid-carry kernel computes wrong prefixes for all but
        # the first batch element if a batched operand slips through.
        return isinstance(x, jax.core.Tracer)
    return isinstance(x, batching.BatchTracer)


def supports(elems, *, combine_ok: bool = True) -> bool:
    """Whether the Pallas strategy can run for this operand tree.

    Requires: TPU backend (or interpret mode), unbatched 2-D stacked leaves
    (the kernel's grid-carry logic does not survive ``vmap``'s prepended
    batch grid axis), float32 data, and a combine the Mosaic compiler can
    lower (``combine_ok`` is the caller's word — e.g. the Riccati merge
    needs the closed-form m <= 3 solve; its LU fallback cannot lower).
    """
    if not combine_ok:
        return False
    if os.environ.get("TINYGP_TPU_PALLAS_SCAN", "0") != "1":
        # Off by default until per-backend validation; flip with
        # TINYGP_TPU_PALLAS_SCAN=1 (bench.py does, after the TPU parity
        # check in benchmarks/pallas_scan_check.py).
        return False
    if not (INTERPRET or jax.default_backend() == "tpu"):
        return False
    leaves = jax.tree_util.tree_leaves(elems)
    for leaf in leaves:
        if _is_tracer_batched(leaf):
            return False
        if getattr(leaf, "ndim", None) != 2:
            return False
        if leaf.dtype != jnp.float32:
            return False
    return True


def _pick_tiles(ctot: int, n: int) -> tuple[int, int]:
    """Choose (block B, lanes L) so a chunk of all leaves fits the budget.

    Bigger B amortizes the per-chunk prefix logic over more sequential
    steps; bigger L widens each step. Both multiply the chunk footprint
    ``B * 8 * ctot * L * 4`` bytes.
    """
    lanes = 256
    budget = _CHUNK_BYTES // (_SUB * ctot * 4)
    block = max(8, min(64, budget // lanes))
    # Small problems: shrink the chunk so there are at least a few blocks.
    while block * _SUB * lanes > max(n, 1) and lanes > 128:
        lanes //= 2
    while block * _SUB * lanes > max(n, 1) and block > 8:
        block //= 2
    return block, lanes


def _tree_where(mask, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(mask, x, y), a, b
    )


def _tree_roll(tree, shift):
    return jax.tree_util.tree_map(
        lambda x: pltpu.roll(x, shift, axis=x.ndim - 1), tree
    )


def _replicate_full(x, shape):
    """Replicate ``(1, C, 1) -> (sub, C, lanes)`` without vector.broadcast.

    ``jnp.broadcast_to`` here is a trap twice over: Mosaic cannot lower a
    both-sublanes-and-lanes ``vector.broadcast`` of a traced value, and even
    a legal-looking broadcast gets slices pushed through it by the MLIR
    canonicalizer inside the combine (producing the illegal
    ``(1,1) -> (8,L)`` form). ``tpu.repeat`` along lanes plus a sublane
    concatenate lowers unconditionally.
    """
    sub, _, lanes = shape
    x = pltpu.repeat(x, lanes, axis=2)  # (1, C, lanes)
    if sub > 1:
        x = jnp.concatenate([x] * sub, axis=0)
    return x


def _scan_kernel(
    *refs,
    combine,
    nleaf: int,
    block: int,
    lanes: int,
    reverse: bool,
):
    """One grid step: scan one chunk, folding in the cross-chunk carry."""
    in_refs = refs[:nleaf]
    ident_refs = refs[nleaf : 2 * nleaf]
    out_refs = refs[2 * nleaf : 3 * nleaf]
    carry_refs = refs[3 * nleaf :]

    # Identity elements arrive PRE-REPLICATED at the full (sub, C, lanes)
    # working shape (Pallas kernels may not close over non-scalar
    # constants, and any in-kernel broadcast of an identity gets slices
    # pushed through it by the Mosaic canonicalizer inside the combine,
    # producing the unlowerable both-sublanes-and-lanes vector.broadcast).
    idents = tuple(r[:] for r in ident_refs)
    full = tuple(i.shape for i in idents)

    # comp(earlier, later) in sequence-index order.
    comp = combine

    # --- 1. Block-local exclusive scan, batched over the 8*lanes blocks.
    # The exclusive states are parked in the output ref and combined with
    # the global prefix in place at the end (saves a scratch buffer).
    carry = idents
    steps = range(block - 1, -1, -1) if reverse else range(block)
    for s in steps:
        elem = tuple(r[0, s] for r in in_refs)
        for o, c in zip(out_refs, carry):
            o[0, s] = c
        carry = comp(elem, carry) if reverse else comp(carry, elem)
    totals = carry

    # --- 2a. Kogge-Stone inclusive prefix over the lane axis.
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1, lanes), 2)
    incl = totals
    k = 1
    while k < lanes:
        # Positive circular shifts only; wrapped values are masked off.
        shifted = _tree_roll(incl, k if not reverse else lanes - k)
        if reverse:
            merged = comp(incl, shifted)
            mask = lane_idx < lanes - k
        else:
            merged = comp(shifted, incl)
            mask = lane_idx >= k
        incl = _tree_where(mask, merged, incl)
        k *= 2

    # Row-inclusive totals: the full composition of each sublane row.
    edge = slice(0, 1) if reverse else slice(lanes - 1, lanes)
    row_incl = tuple(x[..., edge] for x in incl)

    # Exclusive within-row prefix: shift the inclusive scan by one lane.
    ident_full = idents
    shifted = _tree_roll(incl, lanes - 1 if reverse else 1)
    if reverse:
        excl_mask = lane_idx < lanes - 1
    else:
        excl_mask = lane_idx >= 1
    lane_excl = _tree_where(excl_mask, shifted, ident_full)

    # --- 2b. Sublane prefix over the 8 rows (tiny sequential scan).
    rows = []  # per-row (1, C, 1) prefixes in sublane order
    rp = tuple(i[0:1, :, 0:1] for i in idents)
    order = range(_SUB - 1, -1, -1) if reverse else range(_SUB)
    acc = [None] * _SUB
    for i in order:
        acc[i] = rp
        r_i = tuple(x[i : i + 1] for x in row_incl)
        rp = comp(r_i, rp) if reverse else comp(rp, r_i)
    chunk_total = rp  # composition of the whole chunk, (1, C, 1) leaves
    row_pref = tuple(
        jnp.concatenate([acc[i][j] for i in range(_SUB)], axis=0)
        for j in range(nleaf)
    )

    # --- 2c/3. Global prefix for every block: carry ∘ rows ∘ lanes.
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        for cref, ident in zip(carry_refs, idents):
            cref[:] = ident

    chunk_carry = tuple(r[:] for r in carry_refs)
    if reverse:
        block_pref = comp(lane_excl, row_pref)
        global_pref = comp(block_pref, chunk_carry)
    else:
        block_pref = comp(row_pref, lane_excl)
        global_pref = comp(chunk_carry, block_pref)

    # --- 4. Fold into the parked local states (broadcast over steps).
    local = tuple(o[0] for o in out_refs)
    final = (
        comp(local, global_pref) if reverse else comp(global_pref, local)
    )
    for o, f in zip(out_refs, final):
        o[0] = f

    # --- 5. Advance the cross-chunk carry.
    tot_b = tuple(
        _replicate_full(t, shp) for t, shp in zip(chunk_total, full)
    )
    new_carry = (
        comp(tot_b, chunk_carry) if reverse else comp(chunk_carry, tot_b)
    )
    for cref, c in zip(carry_refs, new_carry):
        cref[:] = c


def pallas_monoid_scan(
    combine,
    identity,
    elems,
    *,
    reverse: bool = False,
    block: int | None = None,
    lanes: int | None = None,
):
    """Exclusive monoid scan along the last axis, one pass over HBM.

    Drop-in for the blocked strategy of
    :func:`tinygp_tpu.solvers.quasisep.scan.monoid_scan` when
    :func:`supports` holds. Leaves of ``elems`` are stacked ``(C, N)``
    float32 arrays; ``identity`` leaves are ``(C, 1)``.
    """
    leaves, treedef = jax.tree_util.tree_flatten(elems)
    idents = treedef.flatten_up_to(identity)
    # Identity elements are structural constants (eyes/zeros); as numpy
    # arrays they inline into the kernel as literals instead of captures.
    # A traced identity (a caller that built it with jnp under jit —
    # omnistaging stages those) can't be concretized; pass it through as a
    # regular jnp input instead of crashing.
    def _materialize(i, l):
        if isinstance(i, jax.core.Tracer):
            return jnp.broadcast_to(i, (l.shape[0], 1)).astype(l.dtype)
        return np.broadcast_to(np.asarray(i), (l.shape[0], 1)).astype(l.dtype)

    idents = [_materialize(i, l) for i, l in zip(idents, leaves)]
    n = leaves[0].shape[-1]
    ctot = sum(l.shape[0] for l in leaves)
    b, ln = _pick_tiles(ctot, n)
    if block is not None:
        b = block
    if lanes is not None:
        ln = lanes

    # The kernel consumes identities PRE-REPLICATED to the (sub, C, lanes)
    # working shape: replicating host-side (numpy for the common concrete
    # case, XLA for traced ones) keeps every in-kernel identity use a plain
    # ref read — Mosaic cannot lower the both-sublanes-and-lanes
    # vector.broadcast its canonicalizer would otherwise create by pushing
    # the combine's slices through an in-kernel broadcast.
    def _to_full(i):
        if isinstance(i, np.ndarray):
            return np.ascontiguousarray(
                np.broadcast_to(i[None, :, :], (_SUB, i.shape[0], ln))
            )
        return jnp.broadcast_to(i[None, :, :], (_SUB, i.shape[0], ln))

    idents_full = [_to_full(i) for i in idents]

    chunk = b * _SUB * ln
    nc = -(-n // chunk)
    pad = nc * chunk - n

    def pad_and_tile(x, ident):
        if pad:
            width = [(0, 0)] * (x.ndim - 1) + [
                (pad, 0) if reverse else (0, pad)
            ]
            x = jnp.pad(x, width)
            idx = jnp.arange(nc * chunk)
            valid = (idx >= pad) if reverse else (idx < n)
            x = jnp.where(valid, x, jnp.broadcast_to(ident, x.shape))
        c = x.shape[0]
        x = x.reshape(c, nc, _SUB, ln, b)
        return jnp.transpose(x, (1, 4, 2, 0, 3))  # (nc, b, sub, c, ln)

    tiled = [pad_and_tile(x, i) for x, i in zip(leaves, idents)]

    if reverse:
        index_map = lambda g: (nc - 1 - g, 0, 0, 0, 0)
    else:
        index_map = lambda g: (g, 0, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, b, _SUB, x.shape[3], ln), index_map)
        for x in tiled
    ] + [
        pl.BlockSpec(i.shape, lambda g: (0, 0, 0)) for i in idents_full
    ]
    out_specs = [
        pl.BlockSpec((1, b, _SUB, x.shape[3], ln), index_map)
        for x in tiled
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(x.shape, x.dtype) for x in tiled
    ]
    scratch = [
        pltpu.VMEM((_SUB, x.shape[3], ln), x.dtype) for x in tiled
    ]

    def tuple_combine(earlier, later):
        e = treedef.unflatten(list(earlier))
        l = treedef.unflatten(list(later))
        return tuple(treedef.flatten_up_to(combine(e, l)))

    kernel = functools.partial(
        _scan_kernel,
        combine=tuple_combine,
        nleaf=len(tiled),
        block=b,
        lanes=ln,
        reverse=reverse,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.GridDimensionSemantics.ARBITRARY,),
        ),
        interpret=INTERPRET,
    )(*tiled, *[jnp.asarray(i) for i in idents_full])

    def untile(x):
        c = x.shape[3]
        x = jnp.transpose(x, (3, 0, 2, 4, 1))  # (c, nc, sub, ln, b)
        x = x.reshape(c, nc * chunk)
        return x[:, pad:] if (reverse and pad) else x[:, :n]

    return treedef.unflatten([untile(x) for x in outs])
