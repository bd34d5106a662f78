"""Scalable state-space (quasiseparable) kernels.

Behavioral parity: ``/root/reference/src/tinygp/kernels/quasisep.py`` — the
celerite capability. A kernel here is specified as a continuous-time linear
stochastic differential equation through four ingredients:

- ``design_matrix``   F : the SDE drift,
- ``stationary_covariance`` Pinf : the state's stationary covariance,
- ``observation_model`` h(X) : the projection from state to observation,
- ``transition_matrix``(X1, X2) : the *adjoint* propagator ``expm(F^T dt)``.

The quasiseparable generators follow directly: ``q = h @ Pinf``,
``p = h @ a^T``, ``a = A^T`` (A the adjoint propagator), and the diagonal is
``h Pinf h^T``.

TPU-first notes: the :class:`SHO` propagator is written branch-free
(guarded ``where`` selects instead of nested ``lax.cond``) so it vectorizes
cleanly under ``vmap``/``pjit`` and keeps reverse-mode gradients NaN-free at
the critical damping boundary.

Examples:
    A quasiseparable kernel routes the GP through the O(N) solver
    automatically; inputs must be sorted:

    >>> import jax.numpy as jnp
    >>> from tinygp_tpu import GaussianProcess
    >>> from tinygp_tpu.kernels import quasisep
    >>> X = jnp.linspace(0.0, 10.0, 500)
    >>> gp = GaussianProcess(quasisep.Matern32(scale=1.5), X, diag=0.1)
    >>> bool(jnp.isfinite(gp.log_probability(jnp.sin(X))))
    True
"""

from __future__ import annotations

__all__ = [
    "Quasisep",
    "Wrapper",
    "Sum",
    "Product",
    "Scale",
    "Celerite",
    "SHO",
    "Exp",
    "Matern32",
    "Matern52",
    "Cosine",
    "CARMA",
]

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import block_diag as dense_block_diag

from tinygp_tpu.helpers import Array
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.solvers.quasisep.block import Block, ensure_dense
from tinygp_tpu.solvers.quasisep.core import (
    DiagQSM,
    StrictLowerTriQSM,
    SymmQSM,
)
from tinygp_tpu.solvers.quasisep.general import GeneralQSM
from tinygp_tpu.utils.module import field, static_field


def _mT(matrix: Array) -> Array:
    """Transpose the trailing matrix dims, Block-aware."""
    if isinstance(matrix, Block):
        return matrix.mT
    return jnp.swapaxes(matrix, -1, -2)


def _vm(v: Array, M: Array) -> Array:
    """Row-batched ``v @ M`` as mul+reduce, never a ``dot_general``.

    ``v`` is ``(n, m)``; ``M`` is ``(m, k)`` or batched ``(n, m, k)``.
    Observation-model stacks are often constant broadcasts, and a TPU
    ``dot`` with a broadcast/select producer crashes the chipless AOT
    compile helper's fusion cost model (SIGILL in
    ``TpuPriorityFusionQueue::NormalizedComputationCost``). For the tiny
    state dimensions here a fused multiply-reduce is also at least as fast
    as an MXU dispatch.
    """
    M = ensure_dense(M)
    return jnp.sum(v[..., :, None] * M, axis=-2)


def _anchor(h: Array, t: Array) -> Array:
    """Tie a (possibly input-independent) generator array to the inputs.

    Observation models are often constant in ``X``, which would make the
    whole (N, m) generator stack a compile-time constant. XLA's constant
    folder then materializes it host-side — slow, and it crashes the
    chipless TPU AOT compile helper on large folds. Masking through
    ``isnan(t)`` creates a data dependence the simplifier cannot remove
    (NaN semantics forbid folding ``isnan``), fuses to a single select on
    the VPU, and is a semantic no-op for finite coordinates.
    """
    mask = jnp.isnan(t)
    mask = mask.reshape(mask.shape + (1,) * (h.ndim - mask.ndim))
    return jnp.where(mask, 0.0, h)


class Quasisep(Kernel):
    """Base class for all quasiseparable kernels.

    Subclasses implement the state-space quadruple documented in the module
    docstring. All quasiseparable machinery (QSM construction, O(N) matvecs,
    pointwise evaluation) is derived here.
    """

    def design_matrix(self) -> Array:
        """The SDE design (drift) matrix F."""
        raise NotImplementedError("the SSM quadruple requires design_matrix")

    def stationary_covariance(self) -> Array:
        """The stationary state covariance Pinf."""
        raise NotImplementedError(
            "the SSM quadruple requires stationary_covariance"
        )

    def observation_model(self, X: Array) -> Array:
        """The observation vector h at one coordinate."""
        raise NotImplementedError(
            "the SSM quadruple requires observation_model"
        )

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        """The adjoint propagator: if means propagate as ``m2 = F @ m1``,
        return ``F.T`` (i.e. ``expm(design_matrix().T * dt)``)."""
        raise NotImplementedError(
            "the SSM quadruple requires transition_matrix"
        )

    def coord_to_sortable(self, X: Array) -> Array:
        """Map a (possibly structured) coordinate to a sortable scalar."""
        return X

    def to_symm_qsm(self, X: Array) -> SymmQSM:
        """The symmetric quasiseparable representation of ``K(X, X)``."""
        Pinf = self.stationary_covariance()
        X_prev = jax.tree_util.tree_map(
            lambda x: jnp.append(x[0], x[:-1]), X
        )
        a = _mT(jax.vmap(self.transition_matrix)(X_prev, X))
        t = jax.vmap(self.coord_to_sortable)(X)
        h = _anchor(jax.vmap(self.observation_model)(X), t)
        q = _vm(h, Pinf)  # Pinf symmetric: also the forward generator
        d = jnp.sum(q * h, axis=1)
        p = _vm(h, a)
        return SymmQSM(
            diag=DiagQSM(d=d), lower=StrictLowerTriQSM(p=p, q=q, a=a)
        )

    def to_stacked_ssm(
        self, X: Array, *, X_prev: Array | None = None
    ) -> tuple[Array, Array, Array, Array]:
        """``(d, ps, qs, as_)`` of ``K(X, X)`` in the scans' stacked layout.

        Same math as :meth:`to_symm_qsm`, but every array is *generated*
        components-first — ``d`` of shape ``(N,)``, generators ``ps``/``qs``
        of ``(m, N)``, transitions ``as_`` of ``(m*m, N)`` — which is the
        native operand layout of the blocked parallel scans. Building here
        with ``vmap(out_axes=-1)`` means the fused log-likelihood path never
        pays an HBM transpose to repack ``(N, m, m)`` arrays.

        ``X_prev`` overrides the previous-point coordinates (shard-local
        callers supply the neighbor shard's boundary point); by default the
        first point pairs with itself, making its transition the identity.

        Raises ``NotImplementedError`` for kernels with lazily block-
        diagonal transitions (:class:`Sum`); callers fall back to the QSM
        route, which densifies the blocks where needed.
        """
        Pinf = self.stationary_covariance()
        if isinstance(Pinf, Block):
            raise NotImplementedError(
                "stacked SSM generation needs dense transitions"
            )
        if X_prev is None:
            X_prev = jax.tree_util.tree_map(
                lambda x: jnp.append(x[0], x[:-1]), X
            )
        raw = jax.vmap(self.transition_matrix, out_axes=-1)(X_prev, X)
        if not isinstance(raw, jax.Array):
            raise NotImplementedError(
                "stacked SSM generation needs dense transitions"
            )
        m, _, n = raw.shape
        # The adjoint a = raw^T per point, stacked row-major: row i*m+j of
        # as_ holds a[i, j] = raw[j, i].
        as_ = jnp.swapaxes(raw, 0, 1).reshape(m * m, n)
        t = jax.vmap(self.coord_to_sortable)(X)
        h = jax.vmap(self.observation_model, out_axes=-1)(X)
        h = jnp.where(jnp.isnan(t)[None, :], 0.0, h)
        # All contractions as mul+reduce (see _vm: a TPU dot with a
        # broadcast producer crashes the AOT compile helper).
        qs = jnp.sum(Pinf[:, :, None] * h[:, None, :], axis=0)
        d = jnp.sum(qs * h, axis=0)
        ps = jnp.sum(raw * h[None, :, :], axis=1)
        return d, ps, qs, as_

    def to_general_qsm(self, X1: Array, X2: Array) -> GeneralQSM:
        """The rectangular representation of ``K(X1, X2)``."""
        sortable = jax.vmap(self.coord_to_sortable)
        idx = jnp.searchsorted(sortable(X2), sortable(X1), side="right") - 1

        X2_prev = jax.tree_util.tree_map(
            lambda x: jnp.append(x[0], x[:-1]), X2
        )
        Pinf = self.stationary_covariance()
        a = _mT(jax.vmap(self.transition_matrix)(X2_prev, X2))
        t1 = sortable(X1)
        t2 = sortable(X2)
        h1 = _anchor(jax.vmap(self.observation_model)(X1), t1)
        h2 = _anchor(jax.vmap(self.observation_model)(X2), t2)

        ql = _vm(h2, _mT(Pinf))
        qu = _vm(h1, Pinf)
        n2 = jax.tree_util.tree_leaves(X2)[0].shape[0]

        # Propagate each row's generator to/from its anchor column.
        anchor = jnp.clip(idx, 0, n2 - 1)
        X_anchor = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)[anchor], X2
        )
        trans_past = jax.vmap(self.transition_matrix)(X_anchor, X1)
        pl = _vm(h1, _mT(ensure_dense(trans_past)))

        anchor = jnp.clip(idx + 1, 0, n2 - 1)
        X_anchor = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x)[anchor], X2
        )
        trans_future = jax.vmap(self.transition_matrix)(X1, X_anchor)
        qu = _vm(qu, ensure_dense(trans_future))

        return GeneralQSM(pl=pl, ql=ql, pu=h2, qu=qu, a=a, idx=idx)

    def matmul(
        self,
        X1: Array,
        X2: Array | None = None,
        y: Array | None = None,
    ) -> Array:
        """O(N) matvec through the quasiseparable representation."""
        if y is None:
            X2, y = None, X2
            if y is None:
                raise TypeError("matmul() needs a right-hand side `y`")
        if X2 is None:
            return self.to_symm_qsm(X1).matmul(y)
        return self.to_general_qsm(X1, X2).matmul(y)

    # -- algebra (closed within the quasisep family) ------------------------
    def __add__(self, other: Kernel | Array) -> Kernel:
        return Sum(self, _quasisep_only(other))

    def __radd__(self, other: Any) -> Kernel:
        # builtin sum() seeds its accumulator with the int 0; fold it away.
        return self if other == 0 else Sum(_quasisep_only(other), self)

    def __mul__(self, other: Kernel | Array) -> Kernel:
        if isinstance(other, Quasisep):
            return Product(self, other)
        return Scale(kernel=self, scale=_scalar_only(other))

    def __rmul__(self, other: Any) -> Kernel:
        if isinstance(other, Quasisep):
            return Product(other, self)
        return Scale(kernel=self, scale=_scalar_only(other))

    def evaluate(self, X1: Array, X2: Array) -> Array:
        """Pointwise evaluation via the state-space representation.

        Branches on time order, so non-reversible (causal) processes are
        handled correctly.
        """
        Pinf = ensure_dense(self.stationary_covariance())
        h1 = self.observation_model(X1)
        h2 = self.observation_model(X2)
        t1 = self.coord_to_sortable(X1)
        t2 = self.coord_to_sortable(X2)

        def form(ha, hb, trans):
            # mul+reduce instead of chained dots: see _vm.
            v = jnp.sum(ha[:, None] * ensure_dense(trans).T, axis=0)
            return jnp.sum(jnp.sum(v[:, None] * Pinf, axis=0) * hb)

        fwd = form(h2, h1, self.transition_matrix(X1, X2))
        bwd = form(h1, h2, self.transition_matrix(X2, X1))
        return jnp.where(t1 < t2, fwd, bwd)

    def evaluate_diag(self, X: Array) -> Array:
        h = self.observation_model(X)
        Pinf = ensure_dense(self.stationary_covariance())
        return jnp.sum(jnp.sum(h[:, None] * Pinf, axis=0) * h)


def _quasisep_only(other: Any) -> Quasisep:
    if not isinstance(other, Quasisep):
        raise ValueError(
            "adding a non-quasiseparable term would lose the O(N) "
            "structure; build a dense kernel instead"
        )
    return other


def _scalar_only(other: Any) -> Any:
    if isinstance(other, Kernel) or jnp.ndim(other) != 0:
        raise ValueError(
            "Quasisep kernels can only be multiplied by scalars and "
            "other Quasisep kernels"
        )
    return other


class Wrapper(Quasisep):
    """Base class for kernels that delegate to a wrapped quasisep kernel."""

    kernel: Quasisep

    def coord_to_sortable(self, X: Array) -> Array:
        return self.kernel.coord_to_sortable(X)

    def design_matrix(self) -> Array:
        return self.kernel.design_matrix()

    def stationary_covariance(self) -> Array:
        return self.kernel.stationary_covariance()

    def observation_model(self, X: Array) -> Array:
        return self.kernel.observation_model(self.coord_to_sortable(X))

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        return self.kernel.transition_matrix(
            self.coord_to_sortable(X1), self.coord_to_sortable(X2)
        )


class _Pair(Quasisep):
    """Shared structure for binary quasisep combinations.

    ``kernel1``/``kernel2`` are part of the public pytree surface. Both
    operands must share input coordinates; ``kernel1`` is the authority
    for the sortable mapping.
    """

    kernel1: Quasisep
    kernel2: Quasisep

    def coord_to_sortable(self, X: Array) -> Array:
        return self.kernel1.coord_to_sortable(X)

    def _both(self, method: str, *args: Array) -> tuple[Array, Array]:
        return (
            getattr(self.kernel1, method)(*args),
            getattr(self.kernel2, method)(*args),
        )


class Sum(_Pair):
    """The sum of two quasisep kernels: states concatenate block-diagonally.

    Args:
        kernel1, kernel2: The operands.
        use_block: Keep the block structure lazy (default) to avoid paying
            dense m×m transition cost; set ``False`` for dense
            ``block_diag`` when composing with operations that require dense
            transitions (e.g. products, banded noise).
    """

    use_block: bool = static_field(default=True)

    def _combine(self, m1: Array, m2: Array) -> Array:
        if not self.use_block:
            return dense_block_diag(ensure_dense(m1), ensure_dense(m2))
        # Flatten nested Blocks so sums of sums stay a single-level Block.
        blocks1 = m1.blocks if isinstance(m1, Block) else (m1,)
        blocks2 = m2.blocks if isinstance(m2, Block) else (m2,)
        return Block(*blocks1, *blocks2)

    def design_matrix(self) -> Array:
        return self._combine(*self._both("design_matrix"))

    def stationary_covariance(self) -> Array:
        return self._combine(*self._both("stationary_covariance"))

    def observation_model(self, X: Array) -> Array:
        return jnp.concatenate(self._both("observation_model", X))

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        return self._combine(*self._both("transition_matrix", X1, X2))

    def to_stacked_ssm(
        self, X: Array, *, X_prev: Array | None = None
    ) -> tuple[Array, Array, Array, Array]:
        """Stacked SSM of a sum, composed from the terms' stacked SSMs.

        The sum's state concatenates block-diagonally, so the stacked
        operands compose without ever materializing row-major arrays:
        generators concatenate (``p = [p1, p2]``, ``q = [q1, q2]``), the
        diagonal adds, and the ``(m*m, N)`` stacked transitions interleave
        each term's rows with zero rows for the off-diagonal blocks. This
        keeps multi-term celerite models — the reference's flagship use
        case (``/root/reference/src/tinygp/kernels/quasisep.py:241-295``)
        — on the fused factor-and-whiten path on-chip and in the
        sequence-parallel sharded scans.
        """
        d1, ps1, qs1, as1 = self.kernel1.to_stacked_ssm(X, X_prev=X_prev)
        d2, ps2, qs2, as2 = self.kernel2.to_stacked_ssm(X, X_prev=X_prev)
        m1, m2 = ps1.shape[0], ps2.shape[0]
        n = d1.shape[-1]
        dtype = jnp.result_type(as1, as2)
        z1 = jnp.zeros((m2, n), dtype)
        z2 = jnp.zeros((m1, n), dtype)
        rows = []
        for i in range(m1):
            rows.append(as1[i * m1 : (i + 1) * m1].astype(dtype))
            rows.append(z1)
        for i in range(m2):
            rows.append(z2)
            rows.append(as2[i * m2 : (i + 1) * m2].astype(dtype))
        return (
            d1 + d2,
            jnp.concatenate([ps1, ps2], axis=0),
            jnp.concatenate([qs1, qs2], axis=0),
            jnp.concatenate(rows, axis=0),
        )


def _kron(m1: Array, m2: Array) -> Array:
    """Kronecker combination for products of state-space models."""
    m1 = ensure_dense(m1)
    m2 = ensure_dense(m2)
    if m1.ndim == 1:
        return jnp.reshape(m1[:, None] * m2[None, :], (-1,))
    if m1.ndim == 2:
        return jnp.kron(m1, m2)
    raise NotImplementedError


class Product(_Pair):
    """The product of two quasisep kernels: states combine as Kroneckers."""

    def design_matrix(self) -> Array:
        F1, F2 = map(ensure_dense, self._both("design_matrix"))
        return _kron(F1, jnp.eye(F2.shape[0])) + _kron(jnp.eye(F1.shape[0]), F2)

    def stationary_covariance(self) -> Array:
        return _kron(*self._both("stationary_covariance"))

    def observation_model(self, X: Array) -> Array:
        return _kron(*self._both("observation_model", X))

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        return _kron(*self._both("transition_matrix", X1, X2))


class Scale(Wrapper):
    """A scalar multiple of a quasisep kernel (scales Pinf)."""

    scale: Array | float

    def stationary_covariance(self) -> Array:
        return self.scale * self.kernel.stationary_covariance()

    def to_stacked_ssm(
        self, X: Array, *, X_prev: Array | None = None
    ) -> tuple[Array, Array, Array, Array]:
        """Keep ``amp * (k1 + k2)`` — the canonical multi-term model — on
        the fused stacked path.

        The base implementation (which routes through this Wrapper's
        coordinate-mapping observation model) handles every dense-Pinf
        case; for lazily block-diagonal operands (``Scale(Sum)``) scaling
        is pushed into the wrapped kernel's stacked SSM instead: scaling
        Pinf scales ``q = h Pinf`` (and hence ``d = q . h``) while ``p``
        and the transitions are Pinf-free. That delegation bypasses the
        Wrapper's ``coord_to_sortable`` pre-mapping, so it is only taken
        when the wrapped tree's coordinate maps are all the identity.
        """
        try:
            return super().to_stacked_ssm(X, X_prev=X_prev)
        except NotImplementedError:
            if not _identity_coords(self.kernel):
                raise
            d, ps, qs, as_ = self.kernel.to_stacked_ssm(X, X_prev=X_prev)
            return self.scale * d, ps, self.scale * qs, as_


def _identity_coords(kernel: Quasisep) -> bool:
    """Whether a kernel tree's ``coord_to_sortable`` maps are all identity."""
    if isinstance(kernel, _Pair):
        return _identity_coords(kernel.kernel1) and _identity_coords(
            kernel.kernel2
        )
    if isinstance(kernel, Wrapper):
        if type(kernel).coord_to_sortable is not Wrapper.coord_to_sortable:
            return False
        return _identity_coords(kernel.kernel)
    return type(kernel).coord_to_sortable is Quasisep.coord_to_sortable


class Celerite(Quasisep):
    r"""The classic celerite term (Foreman-Mackey et al. 2017):

    .. math::

        k(\tau) = \exp(-c\tau) [a \cos(d\tau) + b \sin(d\tau)]

    Positive definiteness requires ``a*c - b*d > 0`` (NaNs otherwise).
    """

    a: Array | float
    b: Array | float
    c: Array | float
    d: Array | float

    def design_matrix(self) -> Array:
        return jnp.array([[-self.c, -self.d], [self.d, -self.c]])

    def stationary_covariance(self) -> Array:
        ratio = self.c / self.d
        return jnp.array(
            [[1.0, -ratio], [-ratio, 1.0 + 2.0 * jnp.square(ratio)]]
        )

    def observation_model(self, X: Array) -> Array:
        del X
        # Solve for the observation vector whose induced kernel matches the
        # (a, b, c, d) parameterization against this Pinf.
        a, b, c, d = self.a, self.b, self.c, self.d
        c2 = jnp.square(c)
        d2 = jnp.square(d)
        s2 = c2 + d2
        h2_2 = d2 * (a * c - b * d) / (2.0 * c * s2)
        h2 = jnp.sqrt(h2_2)
        h1 = (c * h2 - jnp.sqrt(a * d2 - s2 * h2_2)) / d
        return jnp.array([h1, h2])

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        dt = X2 - X1
        cos = jnp.cos(self.d * dt)
        sin = jnp.sin(self.d * dt)
        return jnp.exp(-self.c * dt) * jnp.array([[cos, sin], [-sin, cos]])


class SHO(Quasisep):
    r"""The stochastically driven damped simple harmonic oscillator.

    .. math::

        k(\tau) = \sigma^2 \exp(-\omega\tau/2Q) \times
        \begin{cases}
          1 + \omega\tau & Q = 1/2 \\
          \cosh(f\omega\tau/2Q) + \sinh(f\omega\tau/2Q)/f & Q < 1/2 \\
          \cos(g\omega\tau/2Q) + \sin(g\omega\tau/2Q)/g   & Q > 1/2
        \end{cases}

    with :math:`f = \sqrt{1-4Q^2}`, :math:`g = \sqrt{4Q^2-1}`.

    The propagator is implemented branch-free: both damped regimes are
    evaluated with guarded operands and combined with ``where`` selects, so
    the kernel vectorizes under ``vmap`` and keeps gradients finite at the
    critical point (the reference uses nested ``lax.cond``,
    ``quasisep.py:483-488``).

    Args:
        omega: The undamped frequency :math:`\omega`.
        quality: The quality factor :math:`Q`.
        sigma: The amplitude :math:`\sigma` (default 1).
    """

    omega: Array | float
    quality: Array | float
    sigma: Array | float = field(default_factory=lambda: jnp.ones(()))

    _CRITICAL_TOL = 1e-5

    def design_matrix(self) -> Array:
        return jnp.array(
            [[0.0, 1.0], [-jnp.square(self.omega), -self.omega / self.quality]]
        )

    def stationary_covariance(self) -> Array:
        return jnp.diag(jnp.array([1.0, jnp.square(self.omega)]))

    def observation_model(self, X: Array) -> Array:
        del X
        return jnp.array([self.sigma, 0.0])

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        dt = X2 - X1
        w = self.omega
        q = self.quality
        disc = 4.0 * jnp.square(q) - 1.0
        near_critical = jnp.abs(disc) < self._CRITICAL_TOL

        # Critical damping: polynomial-times-exponential propagator.
        crit = jnp.exp(-w * dt) * jnp.array(
            [[1.0 + w * dt, -jnp.square(w) * dt], [dt, 1.0 - w * dt]]
        )

        # Oscillatory / overdamped regimes share the same algebraic shape
        # with (sin, cos) <-> (sinh, cosh); guard the sqrt and divisions so
        # the unselected branch stays finite (and differentiable).
        safe = jnp.maximum(jnp.abs(disc), self._CRITICAL_TOL)
        f = jnp.sqrt(safe)
        arg = 0.5 * f * w * dt / q
        damp = jnp.exp(-0.5 * w * dt / q)

        def regime(s, c):
            return damp * jnp.array(
                [
                    [c + s / f, -2.0 * q * w * s / f],
                    [2.0 * q * s / (w * f), c - s / f],
                ]
            )

        under = regime(jnp.sin(arg), jnp.cos(arg))
        over = regime(jnp.sinh(arg), jnp.cosh(arg))

        out = jnp.where(disc > 0.0, under, over)
        return jnp.where(near_critical, crit, out)


class Exp(Quasisep):
    r"""O(N) exponential kernel :math:`k(\tau)=\sigma^2\exp(-\tau/\ell)`.

    Args:
        scale: The length scale :math:`\ell`.
        sigma: The amplitude :math:`\sigma` (default 1).
    """

    scale: Array | float
    sigma: Array | float = field(default_factory=lambda: jnp.ones(()))

    def design_matrix(self) -> Array:
        return jnp.array([[-1.0 / self.scale]])

    def stationary_covariance(self) -> Array:
        return jnp.ones((1, 1))

    def observation_model(self, X: Array) -> Array:
        del X
        return jnp.array([self.sigma])

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        dt = jnp.asarray(X2 - X1)
        return jnp.exp(-dt[None, None] / self.scale)


class Matern32(Quasisep):
    r"""O(N) Matern-3/2: :math:`k(\tau)=\sigma^2(1+f\tau)\exp(-f\tau)`,
    :math:`f=\sqrt{3}/\ell`.

    Args:
        scale: The length scale :math:`\ell`.
        sigma: The amplitude :math:`\sigma` (default 1).
    """

    scale: Array | float
    sigma: Array | float = field(default_factory=lambda: jnp.ones(()))

    def design_matrix(self) -> Array:
        f = np.sqrt(3.0) / self.scale
        return jnp.array([[0.0, 1.0], [-jnp.square(f), -2.0 * f]])

    def stationary_covariance(self) -> Array:
        return jnp.diag(jnp.array([1.0, 3.0 / jnp.square(self.scale)]))

    def observation_model(self, X: Array) -> Array:
        del X
        return jnp.array([self.sigma, 0.0])

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        dt = X2 - X1
        f = np.sqrt(3.0) / self.scale
        return jnp.exp(-f * dt) * jnp.array(
            [[1.0 + f * dt, -jnp.square(f) * dt], [dt, 1.0 - f * dt]]
        )


class Matern52(Quasisep):
    r"""O(N) Matern-5/2: :math:`k(\tau)=\sigma^2(1+f\tau+f^2\tau^2/3)
    \exp(-f\tau)`, :math:`f=\sqrt{5}/\ell`.

    Args:
        scale: The length scale :math:`\ell`.
        sigma: The amplitude :math:`\sigma` (default 1).
    """

    scale: Array | float
    sigma: Array | float = field(default_factory=lambda: jnp.ones(()))

    def design_matrix(self) -> Array:
        f = np.sqrt(5.0) / self.scale
        f2 = jnp.square(f)
        return jnp.array(
            [[0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [-f2 * f, -3.0 * f2, -3.0 * f]]
        )

    def stationary_covariance(self) -> Array:
        f = np.sqrt(5.0) / self.scale
        f2 = jnp.square(f)
        f2o3 = f2 / 3.0
        return jnp.array(
            [
                [1.0, 0.0, -f2o3],
                [0.0, f2o3, 0.0],
                [-f2o3, 0.0, jnp.square(f2)],
            ]
        )

    def observation_model(self, X: Array) -> Array:
        del X
        return jnp.array([self.sigma, 0.0, 0.0])

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        dt = X2 - X1
        f = np.sqrt(5.0) / self.scale
        f2 = jnp.square(f)
        d2 = jnp.square(dt)
        return jnp.exp(-f * dt) * jnp.array(
            [
                [
                    0.5 * f2 * d2 + f * dt + 1.0,
                    -0.5 * f * f2 * d2,
                    0.5 * f2 * f * dt * (f * dt - 2.0),
                ],
                [
                    dt * (f * dt + 1.0),
                    -f2 * d2 + f * dt + 1.0,
                    f2 * dt * (f * dt - 3.0),
                ],
                [
                    0.5 * d2,
                    0.5 * dt * (2.0 - f * dt),
                    0.5 * f2 * d2 - 2.0 * f * dt + 1.0,
                ],
            ]
        )


class Cosine(Quasisep):
    r"""O(N) cosine kernel :math:`k(\tau)=\sigma^2\cos(2\pi\tau/\ell)`.

    Args:
        scale: The period :math:`\ell`.
        sigma: The amplitude :math:`\sigma` (default 1).
    """

    scale: Array | float
    sigma: Array | float = field(default_factory=lambda: jnp.ones(()))

    def design_matrix(self) -> Array:
        f = 2.0 * np.pi / self.scale
        return jnp.array([[0.0, -f], [f, 0.0]])

    def stationary_covariance(self) -> Array:
        return jnp.eye(2)

    def observation_model(self, X: Array) -> Array:
        del X
        return jnp.array([self.sigma, 0.0])

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        dt = X2 - X1
        f = 2.0 * np.pi / self.scale
        cos = jnp.cos(f * dt)
        sin = jnp.sin(f * dt)
        return jnp.array([[cos, sin], [-sin, cos]])


class CARMA(Quasisep):
    r"""A continuous-time ARMA(p, q) process kernel (Kelly et al. 2014).

    The power spectrum is the ratio of two polynomials in :math:`i\omega`
    with AR coefficients ``alpha`` (length p, excluding the leading 1) and
    MA coefficients ``beta`` (length q+1 <= p, with the amplitude absorbed).
    Internally the autocovariance is decomposed into a mixture of real and
    complex exponentials; each real root maps to an :class:`Exp`-like state
    and each conjugate pair to a :class:`Celerite`-like 2-state block, with
    real/complex masking instead of control flow so everything traces
    cleanly.

    Stationarity requires all AR roots to have negative real parts — use
    :meth:`from_quads` for an automatically-stationary parameterization.

    .. note:: Construction computes polynomial roots via an eigensolve,
        which XLA only supports on CPU; build CARMA kernels host-side (the
        O(N) solves themselves run fine on TPU).
    """

    alpha: Array
    beta: Array
    sigma: Array
    arroots_re: Array
    arroots_im: Array
    acf_re: Array
    acf_im: Array
    _real_mask: Array
    _complex_mask: Array
    _complex_select: Array
    obsmodel: Array

    def __init__(self, alpha: Any, beta: Any):
        sigma = jnp.ones(())
        alpha = jnp.atleast_1d(jnp.asarray(alpha))
        beta = jnp.atleast_1d(jnp.asarray(beta))
        assert alpha.ndim == 1 and beta.ndim == 1
        assert beta.shape[0] <= alpha.shape[0]

        # Roots/ACVF in (re, im) pair arithmetic: this TPU backend lowers
        # no complex primitives (see _carma_roots_ri).
        re, im = _carma_roots_ri(jnp.append(alpha, 1.0))
        acf_re, acf_im = _carma_acvf_ri(re, im, alpha, beta * sigma)

        # Real roots get a 1-state exponential; each complex-conjugate pair
        # shares a 2-state rotation block. The *_select mask marks the first
        # member of each pair (where the off-diagonal couplings live).
        real_mask = jnp.abs(im) < 10 * jnp.finfo(im.dtype).eps
        complex_mask = ~real_mask
        pair_rank = jnp.cumsum(complex_mask) * complex_mask
        complex_select = complex_mask * (pair_rank % 2)

        om_real = jnp.sqrt(jnp.abs(acf_re))
        a, b = 2.0 * acf_re, 2.0 * acf_im
        c, d = -re, -im
        c2, d2 = jnp.square(c), jnp.square(d)
        s2 = c2 + d2
        denom = jnp.where(real_mask, 1.0, 2.0 * c * s2)
        h2_2 = d2 * (a * c - b * d) / denom
        h2 = jnp.sqrt(h2_2)
        denom = jnp.where(real_mask, 1.0, d)
        h1 = (c * h2 - jnp.sqrt(a * d2 - s2 * h2_2)) / denom
        om_complex = jnp.array([h1, h2])
        # Conjugate pairs consume both celerite components; interleave.
        obsmodel = jnp.where(real_mask, om_real, jnp.ravel(om_complex)[::2])

        self._init(
            alpha=alpha,
            beta=beta,
            sigma=sigma,
            arroots_re=re,
            arroots_im=im,
            acf_re=acf_re,
            acf_im=acf_im,
            _real_mask=real_mask,
            _complex_mask=complex_mask,
            _complex_select=complex_select,
            obsmodel=obsmodel,
        )

    @property
    def arroots(self) -> Array:
        """Complex AR roots (CPU-friendly view of the (re, im) fields)."""
        return jax.lax.complex(self.arroots_re, self.arroots_im)

    @property
    def acf(self) -> Array:
        """Complex ACVF coefficients (CPU-friendly view)."""
        return jax.lax.complex(self.acf_re, self.acf_im)

    @classmethod
    def init(cls, alpha: Array, beta: Array) -> CARMA:
        return cls(alpha, beta)

    @classmethod
    def from_quads(
        cls,
        alpha_quads: Array,
        beta_quads: Array,
        beta_mult: Array,
    ) -> CARMA:
        r"""Construct from quadratic factors of the characteristic polynomials.

        Positive quadratic coefficients guarantee negative-real-part roots,
        i.e. a stationary process (Kelly et al. 2014, Eq. 30).

        Args:
            alpha_quads: AR quadratic coefficients, length ``p``.
            beta_quads: MA quadratic coefficients, length ``q``.
            beta_mult: Multiplier for the MA polynomial (the highest-order
                beta).
        """
        alpha_quads = jnp.atleast_1d(alpha_quads)
        beta_quads = jnp.atleast_1d(beta_quads)
        beta_mult = jnp.atleast_1d(beta_mult)
        alpha = carma_quads2poly(jnp.append(alpha_quads, jnp.array([1.0])))[:-1]
        beta = carma_quads2poly(jnp.append(beta_quads, beta_mult))
        return cls(alpha, beta)

    def design_matrix(self) -> Array:
        real = jnp.diag(self.arroots_re * self._real_mask)
        cplx_diag = jnp.diag(self.arroots_re * self._complex_mask)
        cplx_off = jnp.diag(
            (self.arroots_im * self._complex_select)[:-1], k=1
        )
        return real + cplx_diag + cplx_off - cplx_off.T

    def stationary_covariance(self) -> Array:
        p = self.acf_re.shape[0]
        sign = jnp.diag(jnp.where(self.acf_re > 0, jnp.ones(p), -jnp.ones(p)))
        denom = jnp.where(self._real_mask, 1.0, self.arroots_im)
        ratio = self.arroots_re / denom
        second = jnp.diag(
            2.0
            * jnp.square(
                ratio * jnp.roll(self._complex_select, 1) * self._complex_mask
            )
        )
        off = jnp.diag((-ratio * self._complex_select)[:-1], k=1)
        return sign + second + off + off.T

    def observation_model(self, X: Array) -> Array:
        del X
        return self.obsmodel

    def transition_matrix(self, X1: Array, X2: Array) -> Array:
        dt = X2 - X1
        c = -self.arroots_re
        d = -self.arroots_im
        decay = jnp.exp(-c * dt)
        real = jnp.diag(decay * self._real_mask)
        cplx_diag = jnp.diag(decay * jnp.cos(d * dt) * self._complex_mask)
        cplx_off = jnp.diag(
            (decay * jnp.sin(d * dt) * self._complex_select)[:-1], k=1
        )
        return real + cplx_diag + cplx_off - cplx_off.T


# -- complex-free complex arithmetic ----------------------------------------
# This TPU backend lowers NO complex64 primitives (not even add), and the
# reference's ``jnp.roots`` needs the ``eig`` primitive which has no TPU
# rule at all (``/root/reference/src/tinygp/kernels/quasisep.py:903-906``).
# All CARMA root/ACVF math therefore runs on (real, imag) pairs of real
# arrays — plain VPU arithmetic that jits, vmaps, and differentiates.


def _cmul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _cdiv(a, b):
    d = b[0] * b[0] + b[1] * b[1]
    return (a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d


def _carma_roots_ri(poly_coeffs: Array) -> tuple[Array, Array]:
    """Roots (sorted by real part) of a real polynomial, as (re, im).

    Degrees 1-2 use closed forms; higher degrees run a fixed-iteration
    Durand-Kerner (Weierstrass) solver whose converged final step gives
    implicit-function-quality derivatives.
    """
    p = poly_coeffs.shape[0] - 1
    monic = poly_coeffs / poly_coeffs[-1]

    if p == 1:
        re, im = -monic[:1], jnp.zeros(1, monic.dtype)
    elif p == 2:
        b, c = monic[1], monic[0]
        disc = b * b - 4.0 * c
        sq = jnp.sqrt(jnp.abs(disc))
        is_real = disc >= 0
        re = jnp.where(
            is_real,
            jnp.stack([(-b - sq), (-b + sq)]) / 2.0,
            jnp.stack([-b, -b]) / 2.0,
        )
        im = jnp.where(
            is_real,
            jnp.zeros(2, monic.dtype),
            jnp.stack([-sq, sq]) / 2.0,
        )
    else:
        # Staggered ring start (radius > root bound, irrational-ish angles
        # so no start point is real or a symmetry fixed point).
        radius = 1.0 + jnp.max(jnp.abs(monic[:-1]))
        ang = 2.0 * jnp.pi * (jnp.arange(p) + 0.25) / p + 0.7
        z = (radius * jnp.cos(ang), radius * jnp.sin(ang))
        coef = monic[::-1]  # high-to-low for Horner

        def poly(z):
            acc = (jnp.full(p, coef[0]), jnp.zeros(p, monic.dtype))
            for c in coef[1:]:
                acc = _cmul(acc, z)
                acc = (acc[0] + c, acc[1])
            return acc

        eye = jnp.eye(p, dtype=bool)

        def step(z, _):
            dr = z[0][:, None] - z[0][None, :]
            di = z[1][:, None] - z[1][None, :]
            dr = jnp.where(eye, 1.0, dr)
            di = jnp.where(eye, 0.0, di)
            denom = (jnp.ones(p, monic.dtype), jnp.zeros(p, monic.dtype))
            for j in range(p):
                denom = _cmul(denom, (dr[:, j], di[:, j]))
            num = poly(z)
            upd = _cdiv(num, denom)
            return (z[0] - upd[0], z[1] - upd[1]), None

        z, _ = jax.lax.scan(step, z, None, length=64)
        re, im = z

    order = jnp.argsort(re)
    return re[order], im[order]


def carma_roots(poly_coeffs: Array) -> Array:
    """Sorted complex roots (low-to-high coefficients). CPU-friendly
    wrapper over the pair-arithmetic solver; on TPU use the internal
    (re, im) form — this backend has no complex primitives."""
    re, im = _carma_roots_ri(poly_coeffs)
    return jax.lax.complex(re, im)


@jax.jit
def carma_quads2poly(quads_coeffs: Array) -> Array:
    """Expand quadratic factors into a full polynomial (low-to-high).

    The last input entry is the multiplier (the highest-order output
    coefficient).
    """
    size = quads_coeffs.shape[0] - 1
    remain = size % 2
    n_pair = size // 2
    mult = quads_coeffs[-1:]

    poly = jax.lax.cond(
        remain == 1,
        lambda x: jnp.array([1.0, x]),
        lambda _: jnp.array([0.0, 1.0]),
        quads_coeffs[-2],
    )
    poly = poly[-remain + 1 :]
    for k in range(n_pair):
        quad = jnp.append(
            jnp.array([quads_coeffs[2 * k], quads_coeffs[2 * k + 1]]),
            jnp.ones(1),
        )
        poly = jnp.convolve(poly, quad[::-1])
    return poly[::-1] * mult


def carma_poly2quads(poly_coeffs: Array) -> Array:
    """Factor a polynomial (low-to-high) into quadratic coefficients."""
    mult = poly_coeffs[-1]
    roots = carma_roots(poly_coeffs / mult)
    odd = bool(len(roots) & 1)
    roots_c = roots[roots.imag != 0]
    roots_r = roots[roots.imag == 0]

    quads = []
    for i in range(len(roots_c) // 2):
        r1, r2 = roots_c[i], roots_c[i + 1]
        quads.extend([(r1 * r2).real, -(r1.real + r2.real)])
    for i in range(len(roots_r) // 2):
        r1, r2 = roots_r[i], roots_r[i + 1]
        quads.extend([(r1 * r2).real, -(r1.real + r2.real)])
    if odd:
        quads.append(-roots_r[-1].real)
    return jnp.append(jnp.array(quads), mult)


def _carma_acvf_ri(
    roots_re: Array,
    roots_im: Array,
    arparam: Array,
    maparam: Array,
) -> tuple[Array, Array]:
    r"""Autocovariance coefficients (Kelly+14 Eq. 4), in (re, im) pairs."""
    arparam = jnp.atleast_1d(arparam)
    maparam = jnp.atleast_1d(maparam)

    p = arparam.shape[0]
    q = maparam.shape[0] - 1
    sigma = maparam[0]
    maparam = maparam / sigma

    z = (roots_re, roots_im)
    zneg = (-roots_re, -roots_im)
    zero = jnp.zeros(p, roots_re.dtype)
    num_left = (zero, zero)
    num_right = (zero, zero)
    pow_l = (jnp.ones(p, roots_re.dtype), zero)
    pow_r = (jnp.ones(p, roots_re.dtype), zero)
    for k in range(q + 1):
        num_left = (
            num_left[0] + maparam[k] * pow_l[0],
            num_left[1] + maparam[k] * pow_l[1],
        )
        num_right = (
            num_right[0] + maparam[k] * pow_r[0],
            num_right[1] + maparam[k] * pow_r[1],
        )
        if k < q:
            pow_l = _cmul(pow_l, z)
            pow_r = _cmul(pow_r, zneg)

    denom = (-2.0 * roots_re, zero)
    idx = jnp.arange(p)
    for j in range(1, p):
        sh = jnp.roll(idx, j)
        shifted = (roots_re[sh], roots_im[sh])
        denom = _cmul(denom, (shifted[0] - roots_re, shifted[1] - roots_im))
        # conj(shifted) + z
        denom = _cmul(denom, (shifted[0] + roots_re, roots_im - shifted[1]))

    out = _cdiv(_cmul(num_left, num_right), denom)
    return sigma**2 * out[0], sigma**2 * out[1]


def carma_acvf(
    arroots: Array, arparam: Array, maparam: Array
) -> Array:
    r"""Autocovariance coefficients, one per AR root (Kelly+14 Eq. 4).

    CPU-friendly complex wrapper over the pair-arithmetic implementation.
    """
    re, im = _carma_acvf_ri(
        jnp.real(arroots), jnp.imag(arroots), arparam, maparam
    )
    return jax.lax.complex(re, im)
