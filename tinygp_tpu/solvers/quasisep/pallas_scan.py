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
  each chunk holding ``8·L`` blocks of ``B`` consecutive elements.
- Per chunk, the kernel runs the ``B``-step block-local scan (batched over
  all ``8·L`` blocks), an in-register Kogge–Stone prefix over the lane axis,
  a tiny 8-step sublane prefix, and folds in a running cross-chunk carry
  held in VMEM scratch — so block prefixes never round-trip through HBM and
  there is no second pass over the data.
- DMA of chunk ``g+1`` overlaps compute of chunk ``g`` (the grid axis is
  declared ``ARBITRARY``, preserving order).

Layout is the heart of the design. The round-3 version of this kernel kept
the stacked ``(sub, C, lanes)`` leaves of the XLA strategy and sliced the
component axis (at -2) inside every combine — each such op ran on an
``(8, 1, lanes)`` slice at 1/8 sublane utilization, and the kernel measured
1.8x SLOWER than the XLA strategy. This version splits every monoid
component into its OWN ``(sub, lanes)`` buffer: every op in the combine is
then a full-vreg elementwise op (the component-list combines from
``scan.py``), identities become scalar literals, and the prefix phases run
at full VPU width. Outputs the caller does not consume (``needed``) skip
HBM writeback entirely — the Riccati flow returns only F, a third of the
state. Reference math being accelerated:
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

# Scoped-VMEM model: per component, the live copies at peak are the
# double-buffered input (2), the parked local states (1), and the output
# block or its scratch stand-in (~1); prefix-phase temporaries live in
# registers. The 2026-08-20 TPU sweep (benchmarks/scan_iso.py, m=2
# Riccati, N=1e5): fused log-lik 457 us (XLA blocked) -> 279/133/114/100 us
# at 16x256/32x256/48x256/64x128, with a cliff back to 227 us at 96x128
# (scoped VMEM past the limit -> spills). The model below reproduces the
# 64x128 winner for the Riccati's ctot=12 and caps there.
_VMEM_TARGET = 12 * 2**20
_COPIES = 4


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


def supports(elems, identity=None, *, combine_ok: bool = True) -> bool:
    """Whether the Pallas strategy can run for this operand tree.

    Requires: TPU backend (or interpret mode), a FLAT TUPLE of unbatched
    2-D stacked float32 leaves (the kernel's grid-carry logic does not
    survive ``vmap``'s prepended batch grid axis), concrete (numpy)
    identity leaves (they inline as scalar literals per component), and a
    combine the Mosaic compiler can lower (``combine_ok`` is the caller's
    word — e.g. the Riccati merge needs the closed-form m <= 3 solve; its
    LU fallback cannot lower).
    """
    if not combine_ok:
        return False
    # Fail-closed enablement: TINYGP_TPU_PALLAS_SCAN=1 forces ON (tests,
    # the gate's own ON leg), =0 forces OFF, and *unset* defers to the
    # committed on-device verdict for this exact implementation hash
    # (pallas_gate.py) — an edited kernel falls back to the XLA strategy
    # until the A/B gate (benchmarks/pallas_scan_flip.py) re-passes on
    # real hardware.
    from tinygp_tpu.solvers.quasisep import pallas_gate

    if not pallas_gate.enabled():
        return False
    if not (INTERPRET or jax.default_backend() == "tpu"):
        return False
    if not (isinstance(elems, tuple) and all(
        not isinstance(e, (tuple, list, dict)) for e in elems
    )):
        return False
    for leaf in elems:
        if _is_tracer_batched(leaf):
            return False
        if getattr(leaf, "ndim", None) != 2:
            return False
        if leaf.dtype != jnp.float32:
            return False
    if identity is not None:
        for ident in jax.tree_util.tree_leaves(identity):
            if isinstance(ident, jax.core.Tracer):
                return False
    return True


def _pick_tiles(ctot: int, n: int) -> tuple[int, int]:
    """Choose (block B, lanes L) so the scoped-VMEM model fits the target.

    Bigger B amortizes the per-chunk prefix logic over more sequential
    steps; bigger L widens each step. Peak VMEM ~ ``_COPIES`` chunk-sized
    copies of all components: ``_COPIES * B * 8 * L * 4 * ctot``.
    """
    lanes = 128
    # Fat combines (m=4 Riccati: ctot=48) hold more chunk-sized live values
    # than the 4-copy model admits — the block-Schur merge's intermediates
    # don't all fuse, and Mosaic's measured footprint at ctot=48/block=16
    # was 24.2 MB against the model's 12 MB (compile-time VMEM OOM,
    # 2026-08-20). Halve the target for anything beyond the validated
    # ctot<=12 regime instead of trusting the model's copy count there.
    target = _VMEM_TARGET if ctot <= 12 else _VMEM_TARGET // 2
    budget = target // (_COPIES * _SUB * ctot * 4)
    block = max(8, min(64, budget // lanes))
    # Small problems: shrink the chunk so there are at least a few blocks.
    while block * _SUB * lanes > max(n, 1) and block > 8:
        block //= 2
    return block, lanes


def _tree_map(fn, *trees):
    """Map over the (leaves, components) nested-list state structure."""
    return [
        [fn(*comps) for comps in zip(*leaves)] for leaves in zip(*trees)
    ]


def _run_chunk_scan(
    comp,
    get_elem,
    park_write,
    park_read_all,
    carry_refs,
    counts,
    idents,
    block,
    lanes,
    reverse,
    g,
):
    """Phases 1-5 of the decoupled-lookback scan for ONE monoid, one chunk.

    Shared by the generic monoid-scan kernel and the fused log-likelihood
    kernel (which runs two monoids per chunk with elementwise glue).

    Args:
        comp: Combine on nested ``[leaf][component]`` state lists.
        get_elem: ``get_elem(s) -> state`` for block step ``s``.
        park_write / park_read_all: Block-local state parking interface
            (``park_write(i, s, value)`` for flat component ``i``;
            ``park_read_all(i) -> (block, sub, lanes)``).
        carry_refs: Flat per-component ``(sub, lanes)`` VMEM carry refs.
        counts / idents: Per-leaf component counts and identity scalars.
        g: The grid index (carry initialization happens at ``g == 0``).

    Returns the folded global exclusive prefixes as a nested state of
    ``(block, sub, lanes)`` leaves (also written to the park refs), and
    advances the cross-chunk carry in place.
    """
    flat_idents = [i for leaf in idents for i in leaf]

    def group(flat):
        out, pos = [], 0
        for c in counts:
            out.append(list(flat[pos : pos + c]))
            pos += c
        return out

    def ident_state(shape):
        return group(
            [jnp.full(shape, i, dtype=jnp.float32) for i in flat_idents]
        )

    def flatten(state):
        return [c for leaf in state for c in leaf]

    # --- 1. Block-local exclusive scan, batched over the 8*lanes blocks.
    # The exclusive states are parked (output ref or scratch) and combined
    # with the global prefix in place at the end.
    carry = ident_state((_SUB, lanes))
    steps = range(block - 1, -1, -1) if reverse else range(block)
    for s in steps:
        elem = get_elem(s)
        for i, c in enumerate(flatten(carry)):
            park_write(i, s, c)
        carry = comp(elem, carry) if reverse else comp(carry, elem)
    totals = carry

    # --- 2a. Kogge-Stone inclusive prefix over the lane axis.
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (_SUB, lanes), 1)
    incl = totals
    k = 1
    while k < lanes:
        # Positive circular shifts only; wrapped values are masked off.
        shift = k if not reverse else lanes - k
        shifted = _tree_map(
            lambda x: pltpu.roll(x, shift, axis=1), incl
        )
        if reverse:
            merged = comp(incl, shifted)
            mask = lane_idx < lanes - k
        else:
            merged = comp(shifted, incl)
            mask = lane_idx >= k
        incl = _tree_map(
            lambda mg, ic: jnp.where(mask, mg, ic), merged, incl
        )
        k *= 2

    # Row-inclusive totals (the full composition of each sublane row),
    # rotated so the edge column sits at lane 0 (offset-0 slices are the
    # only ones Mosaic relayouts reliably), then lane-replicated.
    def _edge0(x, axis):
        # Rotate the edge (lane lanes-1 / sublane 7 forward; 0 reverse) to
        # position 0, where the slice has offset 0.
        return pltpu.roll(x, 1, axis=axis) if not reverse else x

    row_tot = _tree_map(
        lambda x: pltpu.repeat(_edge0(x, 1)[:, 0:1], lanes, axis=1),
        incl,
    )

    # Exclusive within-row prefix: shift the inclusive scan by one lane.
    shift1 = lanes - 1 if reverse else 1
    shifted = _tree_map(lambda x: pltpu.roll(x, shift1, axis=1), incl)
    excl_mask = (
        lane_idx < lanes - 1 if reverse else lane_idx >= 1
    )
    lane_excl = _tree_map(
        lambda sh, idf: jnp.where(excl_mask, sh, idf),
        shifted,
        ident_state((_SUB, lanes)),
    )

    # --- 2b. Kogge-Stone prefix over the 8 sublane rows, on full tiles.
    # 3 full-width combines instead of an 8-step scan over (1, 1) slices
    # (whose offset-carrying concatenate Mosaic cannot lower).
    sub_idx = jax.lax.broadcasted_iota(jnp.int32, (_SUB, lanes), 0)
    incl_r = row_tot
    k = 1
    while k < _SUB:
        shift = k if not reverse else _SUB - k
        shifted = _tree_map(
            lambda x: pltpu.roll(x, shift, axis=0), incl_r
        )
        if reverse:
            merged = comp(incl_r, shifted)
            mask = sub_idx < _SUB - k
        else:
            merged = comp(shifted, incl_r)
            mask = sub_idx >= k
        incl_r = _tree_map(
            lambda mg, ic: jnp.where(mask, mg, ic), merged, incl_r
        )
        k *= 2

    # Chunk total: the edge row's full composition, rotated to sublane 0.
    chunk_total = _tree_map(lambda x: _edge0(x, 0)[0:1], incl_r)

    # Exclusive row prefix: shift the row-inclusive scan by one sublane.
    shifted = _tree_map(
        lambda x: pltpu.roll(x, _SUB - 1 if reverse else 1, axis=0), incl_r
    )
    row_mask = sub_idx < _SUB - 1 if reverse else sub_idx >= 1
    row_pref = _tree_map(
        lambda sh, idf: jnp.where(row_mask, sh, idf),
        shifted,
        ident_state((_SUB, lanes)),
    )

    # --- 2c/3. Global prefix for every block: carry ∘ rows ∘ lanes.
    @pl.when(g == 0)
    def _():
        for cref, ident in zip(carry_refs, flat_idents):
            cref[:] = jnp.full((_SUB, lanes), ident, dtype=jnp.float32)

    chunk_carry = group([r[:] for r in carry_refs])
    if reverse:
        block_pref = comp(lane_excl, row_pref)
        global_pref = comp(block_pref, chunk_carry)
    else:
        block_pref = comp(row_pref, lane_excl)
        global_pref = comp(chunk_carry, block_pref)

    # --- 4. Fold into the parked local states (broadcast over steps).
    local = group([park_read_all(i) for i in range(sum(counts))])
    final = (
        comp(local, global_pref) if reverse else comp(global_pref, local)
    )

    # --- 5. Advance the cross-chunk carry.
    tot_b = _tree_map(
        lambda t: jnp.concatenate([t] * _SUB, axis=0), chunk_total
    )
    new_carry = (
        comp(tot_b, chunk_carry) if reverse else comp(chunk_carry, tot_b)
    )
    for cref, c in zip(carry_refs, flatten(new_carry)):
        cref[:] = c

    return final


def _scan_kernel(
    *refs,
    combine,
    counts: tuple[int, ...],
    idents: tuple[tuple[float, ...], ...],
    park_kinds: tuple[str, ...],
    block: int,
    lanes: int,
    reverse: bool,
):
    """One grid step of the generic monoid scan.

    ``refs`` order: all component inputs (flat, leaf-major), then outputs
    (only components of ``needed`` leaves), then parked-state scratch (only
    components of leaves NOT needed), then per-component carry scratch.
    ``park_kinds[i]`` says where flat component ``i`` parks its block-local
    states: ``"out"`` (its output ref, block ``(1, B, sub, lanes)``) or
    ``"scr"`` (VMEM scratch ``(B, sub, lanes)``).
    """
    ctot = sum(counts)
    n_out = sum(1 for k in park_kinds if k == "out")
    in_refs = refs[:ctot]
    out_refs = refs[ctot : ctot + n_out]
    scr_refs = refs[ctot + n_out : 2 * ctot]
    carry_refs = refs[2 * ctot :]

    # Flat component index -> its parking ref + indexing convention.
    park = []
    oi = si = 0
    for kind in park_kinds:
        if kind == "out":
            park.append(("out", out_refs[oi]))
            oi += 1
        else:
            park.append(("scr", scr_refs[si]))
            si += 1

    def park_write(i, s, val):
        kind, ref = park[i]
        if kind == "out":
            ref[0, s] = val
        else:
            ref[s] = val

    def park_read_all(i):
        kind, ref = park[i]
        return ref[0] if kind == "out" else ref[:]

    def group(flat):
        out, pos = [], 0
        for c in counts:
            out.append(list(flat[pos : pos + c]))
            pos += c
        return out

    final = _run_chunk_scan(
        combine,
        lambda s: group([r[0, s] for r in in_refs]),
        park_write,
        park_read_all,
        carry_refs,
        counts,
        idents,
        block,
        lanes,
        reverse,
        pl.program_id(0),
    )
    for i, f in enumerate(c for leaf in final for c in leaf):
        kind, ref = park[i]
        if kind == "out":
            ref[0] = f


def pallas_monoid_scan(
    combine_lists,
    identity,
    elems,
    *,
    reverse: bool = False,
    needed: tuple[int, ...] | None = None,
    block: int | None = None,
    lanes: int | None = None,
):
    """Exclusive monoid scan along the last axis, one pass over HBM.

    Drop-in for the blocked strategy of
    :func:`tinygp_tpu.solvers.quasisep.scan.monoid_scan` when
    :func:`supports` holds. ``elems`` is a flat tuple of stacked ``(C, N)``
    float32 leaves; ``identity`` leaves are concrete ``(C, 1)`` arrays;
    ``combine_lists`` is the component-list combine (tuples of lists in,
    tuple of lists out). Leaves whose index is not in ``needed`` return
    zeros (their prefixes are computed in VMEM but never written to HBM).
    """
    leaves = list(elems)
    nleaf = len(leaves)
    if needed is None:
        needed = tuple(range(nleaf))
    counts = tuple(l.shape[0] for l in leaves)
    n = leaves[0].shape[-1]

    ident_leaves = jax.tree_util.tree_leaves(identity)
    idents = tuple(
        tuple(float(v) for v in np.asarray(i).reshape(-1))
        for i in ident_leaves
    )

    ctot = sum(counts)
    b, ln = _pick_tiles(ctot, n)
    if block is not None:
        b = block
    if lanes is not None:
        ln = lanes
    env_b = os.environ.get("TINYGP_TPU_PALLAS_BLOCK")
    env_l = os.environ.get("TINYGP_TPU_PALLAS_LANES")
    if env_b:
        b = int(env_b)
    if env_l:
        ln = int(env_l)

    chunk = b * _SUB * ln
    nc = -(-n // chunk)
    pad = nc * chunk - n

    def pad_and_tile(row, ident_val):
        """One component row (N,) -> (nc, b, sub, ln) tiles."""
        x = row
        if pad:
            x = jnp.pad(x, (pad, 0) if reverse else (0, pad))
            idx = jnp.arange(nc * chunk)
            valid = (idx >= pad) if reverse else (idx < n)
            x = jnp.where(valid, x, jnp.float32(ident_val))
        x = x.reshape(nc, _SUB, ln, b)
        return jnp.transpose(x, (0, 3, 1, 2))  # (nc, b, sub, ln)

    tiled = []
    for li, leaf in enumerate(leaves):
        for ci in range(counts[li]):
            tiled.append(pad_and_tile(leaf[ci], idents[li][ci]))

    if reverse:
        index_map = lambda g: (nc - 1 - g, 0, 0, 0)
    else:
        index_map = lambda g: (g, 0, 0, 0)

    park_kinds = []
    for li in range(nleaf):
        park_kinds.extend(
            ["out" if li in needed else "scr"] * counts[li]
        )

    in_specs = [pl.BlockSpec((1, b, _SUB, ln), index_map) for _ in tiled]
    out_specs = [
        pl.BlockSpec((1, b, _SUB, ln), index_map)
        for k in park_kinds
        if k == "out"
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((nc, b, _SUB, ln), jnp.float32)
        for k in park_kinds
        if k == "out"
    ]
    scratch = [
        pltpu.VMEM((b, _SUB, ln), jnp.float32)
        for k in park_kinds
        if k == "scr"
    ] + [pltpu.VMEM((_SUB, ln), jnp.float32) for _ in tiled]

    def tuple_combine(earlier, later):
        return list(
            combine_lists(
                tuple(tuple(l) for l in earlier),
                tuple(tuple(l) for l in later),
            )
        )

    kernel = functools.partial(
        _scan_kernel,
        combine=tuple_combine,
        counts=counts,
        idents=idents,
        park_kinds=tuple(park_kinds),
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
    )(*tiled)

    def untile(x):
        x = jnp.transpose(x, (0, 2, 3, 1))  # (nc, sub, ln, b)
        x = x.reshape(nc * chunk)
        return x[pad:] if (reverse and pad) else x[:n]

    result, oi = [], 0
    for li in range(nleaf):
        if li in needed:
            rows = [untile(outs[oi + ci]) for ci in range(counts[li])]
            oi += counts[li]
            result.append(jnp.stack(rows, axis=0))
        else:
            result.append(jnp.zeros_like(leaves[li]))
    return tuple(result)
