"""Tensor-parallel dense Cholesky over a device mesh.

The last parallelism in SURVEY.md §2.4: shard the O(N^3) dense
factorization itself, for covariance matrices too large (or too slow) for
one chip. Layout: the matrix is **column-block sharded** over the mesh
axis — device d owns the contiguous column slab ``[d n_loc, (d+1) n_loc)``
of all N rows. Each panel factorization is computed by the slab's owner
and broadcast with one ``psum`` (the mask-and-reduce idiom — on TPU this
is a single ICI all-reduce of an (N, B) panel); every device then applies
the rank-B trailing update to its own slab with a local GEMM. That is the
standard distributed right-looking algorithm (ScaLAPACK's), minus
block-cyclic wrapping: contiguous slabs keep the index arithmetic static
for XLA at the cost of late-panel load imbalance, which is acceptable at
the modest panel counts where this path matters.

Communication per factorization: nb = N/B rounds x one (N, B) panel
all-reduce — O(N^2) words total, independent of the O(N^3) compute, so
efficiency rises with N.
"""

from __future__ import annotations

__all__ = ["cholesky_tp"]

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinygp_tpu.helpers import Array


def cholesky_tp(
    K: Array,
    *,
    mesh: Mesh,
    axis: str = "tp",
    block: int = 256,
) -> Array:
    """Lower Cholesky factor of an SPD matrix, sharded over ``mesh[axis]``.

    ``K`` is ``(n, n)`` with ``n`` divisible by ``num_devices * block``.
    Returns ``L`` column-sharded like the input. Matches
    ``jnp.linalg.cholesky`` to f32 rounding (the per-panel math uses the
    same native kernels under pinned precision).
    """
    n = K.shape[0]
    d = mesh.shape[axis]
    if n % (d * block) != 0:
        raise ValueError(
            f"n={n} must divide evenly into {d} devices x {block} panel"
        )
    n_loc = n // d
    nb = n // block
    panels_per_dev = n_loc // block
    eye = jnp.eye(block, dtype=K.dtype)

    def device_program(K_loc):
        # K_loc: (n, n_loc) — all rows of this device's column slab.
        me = lax.axis_index(axis)
        L_loc = jnp.zeros_like(K_loc)
        T = K_loc  # running (trailing-updated) slab

        for j in range(nb):
            owner = j // panels_per_dev
            lo = j * block  # global row/col offset of this panel
            loc_off = (j % panels_per_dev) * block

            # The owner factors its panel: chol of the B x B diagonal
            # block, then the sub-diagonal rows against inv(L11)^T.
            with jax.default_matmul_precision("highest"):
                A_panel = lax.dynamic_slice(
                    T, (0, loc_off), (n, block)
                )
                A11 = lax.dynamic_slice(A_panel, (lo, 0), (block, block))
                # Non-owners sliced at loc_off see the WRONG block of their
                # slab — generally not PD, so cholesky would NaN. The primal
                # is masked off below either way, but a NaN primal poisons
                # reverse-mode AD (the cholesky VJP evaluates L^-T of the
                # primal even under zero cotangents). Feed non-owners the
                # identity: finite factor, finite VJP, zero cotangent flow.
                A11 = jnp.where(me == owner, A11, eye)
                L11 = lax.linalg.cholesky(A11, symmetrize_input=False)
                L11invT = jax.scipy.linalg.solve_triangular(
                    L11, eye, lower=True
                ).T
                A21 = lax.dynamic_slice(
                    A_panel, (lo + block, 0), (n - lo - block, block)
                )
                mine = jnp.concatenate(
                    [
                        jnp.zeros((lo, block), K_loc.dtype),
                        L11,
                        jnp.matmul(A21, L11invT),
                    ],
                    axis=0,
                )
            # Broadcast: only the owner contributes, psum delivers the
            # panel to everyone (one ICI all-reduce).
            panel = lax.psum(
                jnp.where(me == owner, mine, jnp.zeros_like(mine)), axis
            )

            # Owner records its factor columns.
            L_loc = jnp.where(
                me == owner,
                lax.dynamic_update_slice(L_loc, panel, (0, loc_off)),
                L_loc,
            )

            # Trailing update of every column to the right of the panel:
            # K[r, c] -= panel[r, :] . panel[c, :] for c > lo + block.
            # Columns at or left of the panel are masked out; rows above
            # the trailing block don't matter (never read again).
            cols = me * n_loc + jnp.arange(n_loc)
            col_mask = (cols >= lo + block).astype(K_loc.dtype)
            start = (me * n_loc).astype(jnp.int32)
            panel_rows_for_cols = lax.dynamic_slice(
                panel, (start, jnp.int32(0)), (n_loc, block)
            )
            update = jnp.matmul(
                panel, panel_rows_for_cols.T, precision="highest"
            )
            T = T - update * col_mask[None, :]

        return L_loc

    sharded = shard_map(
        device_program,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=P(None, axis),
        check_vma=False,
    )
    if not isinstance(K, jax.core.Tracer):
        # Pre-shard concrete inputs onto the mesh. Under a trace (jit /
        # grad) the partitioner places K itself; an eager device_put on a
        # tracer trips XLA's sharding-override assertion in reverse mode.
        K = jax.device_put(K, NamedSharding(mesh, P(None, axis)))
    L = sharded(K)
    return jnp.tril(L)
