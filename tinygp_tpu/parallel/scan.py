"""Sequence-parallel quasiseparable scans across a device mesh.

The single-chip scan primitives (:mod:`tinygp_tpu.solvers.quasisep.scan`)
evaluate exclusive prefixes of an associative combine. Sharding the data
axis over a mesh extends the same three-phase structure across chips — the
GP analog of ring-attention/context parallelism (no reference counterpart;
the reference is single-device, SURVEY.md §2.4):

1. every device runs the blocked **on-chip** scan on its contiguous shard
   and forms its shard *total* (the composition of all its elements);
2. the D totals are ``all_gather``-ed over ICI (tiny: one m×m map per
   device) and every device redundantly computes the exclusive prefix of
   that length-D sequence, selecting its own entry;
3. one vectorized combine folds the cross-device prefix into the local
   exclusive states.

Communication is O(D · m²) per scan — independent of N — so scaling
efficiency approaches the local-scan fraction for any realistic N/D.

Gradients flow through ``shard_map`` + ``all_gather`` automatically, and
the on-chip scans keep their hand-written VJPs.
"""

from __future__ import annotations

__all__ = [
    "sharded_monoid_scan",
    "sharded_affine_scan",
    "sharded_riccati_scan",
    "sharded_loglik",
    "sharded_loglik_chains",
]

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tinygp_tpu.helpers import Array
from tinygp_tpu.solvers.quasisep import scan as chip_scan


def _select_prefix(combine, identity, totals, my_idx):
    """Exclusive prefix of the length-D gathered totals at this device.

    ``totals`` leaves have the device axis LAST (stacked layout). D is the mesh
    size — tiny — so a sequential exclusive scan followed by a dynamic
    lane-slice is cheap and identical on every device.
    """
    prefixes = chip_scan.monoid_scan(combine, identity, totals)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, my_idx, 1, axis=-1),
        prefixes,
    )


def sharded_monoid_scan(combine, identity, elems, *, axis_name: str):
    """Exclusive scan along the last axis, sharded over ``axis_name``.

    Call INSIDE ``shard_map``: ``elems`` are the local shard (lane axis
    last), and the result is the local slice of the global exclusive scan.
    """
    local_excl = chip_scan.monoid_scan(combine, identity, elems)
    # Shard total = exclusive-prefix-at-last composed with the last element.
    last = jax.tree_util.tree_map(lambda x: x[..., -1:], elems)
    excl_last = jax.tree_util.tree_map(lambda x: x[..., -1:], local_excl)
    total = combine(excl_last, last)

    totals = jax.lax.all_gather(total, axis_name, axis=-1, tiled=True)
    my_idx = jax.lax.axis_index(axis_name)
    prefix = _select_prefix(combine, identity, totals, my_idx)
    return combine(prefix, local_excl)


def _sharded_affine_stacked(
    As: Array, Bs: Array, m: int, r: int, *, axis_name: str
) -> Array:
    """Sharded forward-exclusive affine scan on stacked local operands."""

    def combine(earlier, later):
        A_e, B_e = earlier
        A_l, B_l = later
        return (
            chip_scan._smm(A_l, A_e, m, m, m),
            chip_scan._smm(A_l, B_e, m, m, r) + B_l,
        )

    identity = (
        chip_scan._seye(m, As.dtype),
        np.zeros((m * r, 1), Bs.dtype),
    )
    _, e = sharded_monoid_scan(
        combine, identity, (As, Bs), axis_name=axis_name
    )
    return e


def sharded_affine_scan(
    A: Array, B: Array, *, axis_name: str
) -> Array:
    """Sharded forward-exclusive affine scan (inside ``shard_map``).

    ``A``: local ``(n, m, m)`` transitions; ``B``: local ``(n, m, r)``
    loads. Returns the local slice of the global exclusive prefix states.
    """
    m, r = B.shape[-2], B.shape[-1]
    e = _sharded_affine_stacked(
        chip_scan._pack3(A), chip_scan._pack3(B), m, r, axis_name=axis_name
    )
    return chip_scan._unpack3(e, m, r)


def _sharded_riccati_stacked(
    d: Array, ps: Array, qs: Array, as_: Array, m: int, *, axis_name: str
) -> Array:
    """Sharded exclusive Riccati flow on stacked local operands."""
    inv_d = 1.0 / d

    A0 = as_ - chip_scan._souter(qs, ps) * inv_d
    F0 = chip_scan._souter(qs, qs) * inv_d
    G0 = -chip_scan._souter(ps, ps) * inv_d
    eye = chip_scan._seye(m, ps.dtype)

    def combine(earlier, later):
        A_e, F_e, G_e = earlier
        A_l, F_l, G_l = later
        M = eye + chip_scan._smm(F_e, G_l, m, m, m)
        A = chip_scan._smm(
            A_l, chip_scan._ssolve(M, A_e, m, m), m, m, m
        )
        F = F_l + chip_scan._smm_t(
            chip_scan._smm(A_l, chip_scan._ssolve(M, F_e, m, m), m, m, m),
            A_l, m, m, m,
        )
        G = G_e + chip_scan._smm(
            chip_scan._smm(
                chip_scan._st(A_e, m, m),
                chip_scan._ssolve(chip_scan._st(M, m, m), G_l, m, m),
                m, m, m,
            ),
            A_e, m, m, m,
        )
        return A, F, G

    identity = (
        chip_scan._seye(m, ps.dtype),
        np.zeros((m * m, 1), ps.dtype),
        np.zeros((m * m, 1), ps.dtype),
    )
    _, F, _ = sharded_monoid_scan(
        combine, identity, (A0, F0, G0), axis_name=axis_name
    )
    return F


def sharded_riccati_scan(
    d: Array,
    p: Array,
    q: Array,
    a: Array,
    *,
    axis_name: str,
) -> Array:
    """Sharded exclusive Riccati flow (inside ``shard_map``).

    Same matrix-fraction monoid as the on-chip strategy
    (:func:`tinygp_tpu.solvers.quasisep.scan.riccati_scan`); the cross-
    device combine merges per-shard linear-fractional maps.
    """
    m = p.shape[1]
    F = _sharded_riccati_stacked(
        d,
        p.T,
        q.T,
        chip_scan._pack3(chip_scan._dense_transitions(a)),
        m,
        axis_name=axis_name,
    )
    return chip_scan._unpack3(F, m, m)


def _stacked_loglik_pieces(d, ps, qs, as_, y, *, axis_name: str):
    """Shard-local log-likelihood contributions, all stacked.

    The sharded twin of ``ops.stacked_loglik_terms``: the sharded Riccati
    flow feeds the Cholesky emissions, those feed the sharded affine solve,
    and the two scalar terms reduce with a ``psum``. No ``(n, m, m)``
    intermediate exists on any shard.
    """
    m = ps.shape[0]
    Fs = _sharded_riccati_stacked(d, ps, qs, as_, m, axis_name=axis_name)

    Fp = chip_scan._smv(Fs, ps, m, m)
    c2 = d - jnp.sum(ps * Fp, axis=0)
    c = jnp.sqrt(c2)
    inv_c = 1.0 / c
    w = (qs - chip_scan._smv(as_, Fp, m, m)) * inv_c

    # Solve L alpha = y with L = diag(c) + strict_lower(p, w, a): fold the
    # diagonal into the transition (ops.lower_triangular_solve math).
    wd = w * inv_c
    A = as_ - chip_scan._souter(wd, ps)
    e = _sharded_affine_stacked(A, wd * y, m, 1, axis_name=axis_name)
    alpha = (y - jnp.sum(ps * e, axis=0)) * inv_c

    quad = jnp.sum(alpha**2)
    logdet = jnp.sum(jnp.log(c))
    n_local = jnp.asarray(y.shape[0], y.dtype)
    quad, logdet, n = jax.lax.psum(
        (quad, logdet, n_local), axis_name
    )
    return -0.5 * quad - logdet - 0.5 * n * jnp.log(2 * jnp.pi)


def sharded_loglik(
    kernel,
    X: Array,
    y: Array,
    *,
    diag: Array | float,
    mesh: Mesh,
    axis: str = "data",
) -> Array:
    """GP marginal log-likelihood with the time axis sharded over ``mesh``.

    The quasiseparable generators are built shard-locally (each device
    additionally needs its left-neighbor coordinate for the first
    transition, obtained with one ``ppermute``), then the factorization
    and solve run as sharded scans. ``X`` must be globally sorted;
    ``kernel`` must be a :class:`tinygp_tpu.kernels.quasisep.Quasisep`.

    Equivalent to ``GaussianProcess(kernel, X, diag=diag).log_probability``
    on one device (same math, same parallel-scan numerics).
    """
    devices = mesh.shape[axis]
    n = X.shape[0]
    if n % devices:
        raise ValueError(
            f"data length {n} must divide evenly over mesh axis "
            f"{axis!r} ({devices} devices)"
        )

    diag = jnp.broadcast_to(jnp.asarray(diag, y.dtype), y.shape)

    def local(X_loc, y_loc, diag_loc):
        X_prev = _left_shifted_coords(X_loc, axis, devices)
        return _one_chain_local(
            kernel, X_loc, X_prev, y_loc, diag_loc, axis=axis
        )

    spec = P(axis)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(),
        check_vma=False,
    )
    return fn(X, y, diag)


def _left_shifted_coords(X_loc: Array, axis: str, devices: int) -> Array:
    """The previous-point coordinate for every local point.

    Device d needs the last coordinate of device d-1 for its first
    transition; one ``ppermute`` moves it. Device 0 keeps its own first
    coordinate, matching the single-device convention ``X_prev[0] = X[0]``.
    """
    axis_idx = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % devices) for i in range(devices)]
    left = jax.lax.ppermute(X_loc[-1:], axis, perm)
    left = jnp.where(axis_idx == 0, X_loc[:1], left)
    return jnp.concatenate([left, X_loc[:-1]])


def _one_chain_local(kernel, X_loc, X_prev, y_loc, diag_loc, *, axis: str):
    """Shard-local log-likelihood pieces for one kernel/observation set.

    Operands are generated directly in the scans' stacked layout where the
    kernel supports it; lazily block-diagonal kernels (quasisep ``Sum``)
    generate row-major, densify, and repack.
    """
    try:
        d, ps, qs, as_ = kernel.to_stacked_ssm(X_loc, X_prev=X_prev)
    except NotImplementedError:
        Pinf = kernel.stationary_covariance()
        from tinygp_tpu.kernels.quasisep import _anchor, _mT, _vm
        from tinygp_tpu.solvers.quasisep.block import ensure_dense

        a = ensure_dense(
            _mT(jax.vmap(kernel.transition_matrix)(X_prev, X_loc))
        )
        t = jax.vmap(kernel.coord_to_sortable)(X_loc)
        h = _anchor(jax.vmap(kernel.observation_model)(X_loc), t)
        q = _vm(h, Pinf)
        d = jnp.sum(q * h, axis=1)
        p = _vm(h, a)
        ps, qs, as_ = p.T, q.T, chip_scan._pack3(a)
    return _stacked_loglik_pieces(
        d + diag_loc, ps, qs, as_, y_loc, axis_name=axis
    )


def sharded_loglik_chains(
    kernel,
    X: Array,
    y: Array,
    *,
    diag: Array | float,
    mesh: Mesh,
    data_axis: str = "data",
    chain_axis: str = "chains",
) -> Array:
    """Chain-parallel × sequence-parallel log-likelihoods on a 2-D mesh.

    The pod-scale composition: hyperparameter chains are sharded over
    ``chain_axis`` (e.g. across hosts) while each chain's time axis is
    sharded over ``data_axis`` (across the chips of a host). ``kernel`` is a
    quasiseparable kernel whose array leaves carry a leading chain dimension
    (build one with ``jax.vmap`` over the constructor or by stacking
    parameters); ``X`` of shape ``(N,)`` is shared by all chains; ``y`` has
    shape ``(C, N)``. Returns the ``(C,)`` per-chain log-likelihoods.

    Inside each shard the chain dimension is a plain ``vmap`` — the
    ``data_axis`` collectives batch over it — so every chip computes its
    local slice of every local chain with no cross-axis traffic.
    """
    if y.ndim != 2:
        raise ValueError(f"y must be (num_chains, N); got shape {y.shape}")
    num_chains, n = y.shape
    data_devices = mesh.shape[data_axis]
    chain_devices = mesh.shape[chain_axis]
    if n % data_devices or X.shape[0] != n:
        raise ValueError(
            f"data length {n} must match X and divide evenly over mesh "
            f"axis {data_axis!r} ({data_devices} devices)"
        )
    if num_chains % chain_devices:
        raise ValueError(
            f"{num_chains} chains must divide evenly over mesh axis "
            f"{chain_axis!r} ({chain_devices} devices)"
        )

    diag = jnp.broadcast_to(jnp.asarray(diag, y.dtype), y.shape)

    def local(kernel_loc, X_loc, y_loc, diag_loc):
        X_prev = _left_shifted_coords(X_loc, data_axis, data_devices)

        def one(kern, y1, diag1):
            return _one_chain_local(
                kern, X_loc, X_prev, y1, diag1, axis=data_axis
            )

        return jax.vmap(one)(kernel_loc, y_loc, diag_loc)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(chain_axis),
            P(data_axis),
            P(chain_axis, data_axis),
            P(chain_axis, data_axis),
        ),
        out_specs=P(chain_axis),
        check_vma=False,
    )
    return fn(kernel, X, y, diag)
