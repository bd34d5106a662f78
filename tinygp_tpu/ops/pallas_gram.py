"""Pallas-tiled kernel-matrix construction.

The default ``Kernel.gram`` lifts the pointwise ``evaluate`` with nested
``vmap`` (mirroring ``/root/reference/src/tinygp/kernels/base.py:94-96``),
which XLA fuses into one elementwise pass over the N x M grid. That is
already bandwidth-bound — but it streams through generic fusion heuristics
and cannot be co-scheduled with consumers. This module builds the matrix
in explicit (tile x tile) VMEM blocks on a Pallas grid:

- each grid step loads a ``(tile,)`` (or ``(tile, d)``) slab of each input
  once, evaluates the kernel on the full tile pair with the *same*
  ``evaluate`` code users write (lifted by in-kernel ``vmap``), and writes
  the tile exactly once;
- kernel parameters ride along as scalar-prefetch-style operands, so the
  builder works for any pytree-parameterized kernel whose ``evaluate``
  traces to Pallas-supported ops (all the stationary family).

Gradients: the builder is wrapped in a ``custom_vjp`` whose backward pass
is the XLA pullback of the reference nested-``vmap`` construction — the
two formulations are the same function, so cotangents agree to rounding.

Off TPU the module is still exercised via the Pallas interpreter (tests),
but production CPU paths keep the nested-``vmap`` route.
"""

from __future__ import annotations

__all__ = ["gram_tiled", "supports_tiled_gram"]

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tinygp_tpu.helpers import Array

_TILE = 256


def _nested_vmap_gram(kernel, X1, X2):
    return jax.vmap(
        jax.vmap(kernel.evaluate, in_axes=(None, 0)), in_axes=(0, None)
    )(X1, X2)


def supports_tiled_gram(kernel, X1: Array, X2: Array) -> bool:
    """Whether the Pallas builder can handle this (kernel, inputs) combo.

    Requires plain f32 array inputs (1-D or 2-D) and f32/integer kernel
    parameters — i.e. the TPU production configuration.
    """
    import numpy as np

    for X in (X1, X2):
        if not isinstance(X, (jax.Array, np.ndarray)) or X.ndim not in (1, 2):
            return False
        if X.dtype != jnp.float32:
            return False

    def leaf_ok(leaf):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.integer):
            return True
        # Weakly-typed (python-scalar) floats are cast to f32 by the
        # builder; strong f64 parameters mean the user wants x64 math.
        return arr.dtype == jnp.float32 or bool(getattr(arr, "weak_type", False))

    return all(map(leaf_ok, jax.tree_util.tree_leaves(kernel)))


def _pad_axis0(X: Array, to: int) -> Array:
    pad = (-X.shape[0]) % to
    if not pad:
        return X
    widths = [(0, pad)] + [(0, 0)] * (X.ndim - 1)
    return jnp.pad(X, widths, mode="edge")


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gram_tiled(kernel, X1, X2, tile, interpret):
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    n1, n2 = X1.shape[0], X2.shape[0]
    # 1-D coordinates ride as (n, 1) columns — Mosaic requires 1-D operand
    # blocks to match XLA's (larger) vector-register tiling, while 2-D
    # blocks tile freely — and are squeezed back to scalars inside the
    # kernel: evaluating on length-1 vectors would drag (tile, tile, 1)
    # intermediates through the VPU at 1/128 lane occupancy.
    squeeze = X1.ndim == 1
    if squeeze:
        X1, X2 = X1[:, None], X2[:, None]
    X1p, X2p = _pad_axis0(X1, tile), _pad_axis0(X2, tile)

    # 0-d parameters travel as (1, 1) arrays; inside the kernel they are
    # restored before the pytree is reassembled. Float parameters are
    # pinned to f32 (the gate admits only f32 or weakly-typed scalars).
    shapes = [jnp.shape(leaf) for leaf in leaves]

    def prep(leaf):
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(jnp.float32)
        return jnp.reshape(arr, (1, 1)) if arr.ndim == 0 else arr

    ops = [prep(leaf) for leaf in leaves]

    def body(x1_ref, x2_ref, *rest):
        leaf_refs, out_ref = rest[:-1], rest[-1]
        vals = [
            r[0, 0] if shape == () else r[...]
            for r, shape in zip(leaf_refs, shapes)
        ]
        k = jax.tree_util.tree_unflatten(treedef, vals)
        x1, x2 = x1_ref[...], x2_ref[...]
        if squeeze:
            x1, x2 = x1[:, 0], x2[:, 0]
        # The cast guards against x64-mode promotion from strong numpy
        # constants inside evaluate() (a no-op in f32 production mode).
        out_ref[...] = _nested_vmap_gram(k, x1, x2).astype(out_ref.dtype)

    def slab_spec(arr, which):
        shape = (tile,) + arr.shape[1:]
        if which == 0:
            return pl.BlockSpec(shape, lambda i, j: (i,) + (0,) * (arr.ndim - 1))
        return pl.BlockSpec(shape, lambda i, j: (j,) + (0,) * (arr.ndim - 1))

    out = pl.pallas_call(
        body,
        grid=(X1p.shape[0] // tile, X2p.shape[0] // tile),
        in_specs=[
            slab_spec(X1p, 0),
            slab_spec(X2p, 1),
            *(
                pl.BlockSpec(op.shape, lambda i, j, nd=op.ndim: (0,) * nd)
                for op in ops
            ),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(
            (X1p.shape[0], X2p.shape[0]), jnp.float32
        ),
        interpret=interpret,
    )(X1p, X2p, *ops)
    return out[:n1, :n2]


def _gram_tiled_fwd(kernel, X1, X2, tile, interpret):
    return _gram_tiled(kernel, X1, X2, tile, interpret), (kernel, X1, X2)


def _gram_tiled_bwd(tile, interpret, residuals, dK):
    kernel, X1, X2 = residuals
    # The tiled forward computes exactly the nested-vmap function, so its
    # XLA pullback is the correct (and fusion-friendly) adjoint. Dtype
    # shims on both sides absorb x64-mode promotion inside evaluate().
    ref_out, pullback = jax.vjp(_nested_vmap_gram, kernel, X1, X2)
    cts = pullback(dK.astype(ref_out.dtype))
    return jax.tree_util.tree_map(
        lambda ct, p: jnp.asarray(ct).astype(jnp.asarray(p).dtype),
        cts,
        (kernel, X1, X2),
    )


_gram_tiled.defvjp(_gram_tiled_fwd, _gram_tiled_bwd)


def gram_tiled(
    kernel,
    X1: Array,
    X2: Array,
    *,
    tile: int = _TILE,
    interpret: bool | None = None,
) -> Array:
    """Build ``K[i, j] = kernel.evaluate(X1[i], X2[j])`` in MXU/VPU tiles.

    Drop-in replacement for the nested-``vmap`` construction for kernels
    whose ``evaluate`` traces to Pallas-supported ops. Check
    :func:`supports_tiled_gram` before calling.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gram_tiled(kernel, X1, X2, tile, interpret)
