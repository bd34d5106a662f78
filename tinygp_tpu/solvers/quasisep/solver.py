"""The scalable O(N) quasiseparable solver.

Behavioral parity: ``/root/reference/src/tinygp/solvers/quasisep/solver.py``,
with two TPU-first changes:

1. ``parallel`` defaults to **True**: on TPU the sequential scan serializes
   the whole chip, while the associative-scan factorization/solves run in
   O(log N) depth (the reference defaults to the sequential path and leaves
   ``parallel=True`` as an opt-in).
2. The sorted-input check never uses a host callback (which would not
   compose with multi-host ``pjit``): when the inputs are concrete we raise
   eagerly; when traced, the covariance diagonal is *poisoned* with NaN so
   ``log_probability`` returns ``-inf`` through the GP's NaN guard instead
   of silently returning wrong values.
"""

from __future__ import annotations

__all__ = ["QuasisepSolver"]

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.helpers import Array
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.noise import Diagonal, Noise
from tinygp_tpu.solvers.quasisep.core import DiagQSM, LowerTriQSM, SymmQSM
from tinygp_tpu.solvers.solver import Solver
from tinygp_tpu.utils.module import static_field


class QuasisepSolver(Solver):
    """Factorize a quasiseparable covariance in O(N) work.

    Built for kernels subclassing
    :class:`tinygp_tpu.kernels.quasisep.Quasisep` (or a precomputed
    :class:`~tinygp_tpu.solvers.quasisep.core.SymmQSM` covariance).

    Args:
        kernel: A quasiseparable kernel.
        X: Input coordinates (must be sorted along the kernel's sortable
            coordinate).
        noise: The observation noise model.
        covariance: Optionally a precomputed ``SymmQSM``.
        assume_sorted: Skip the sorted-input check.
        parallel: Use associative-scan algorithms (default on TPU-native
            builds) instead of sequential scans.

    Precision note: in float32 the triangular-solve error grows with the
    covariance's condition number (the solve applies ``L^{-1}``, whose
    composed transitions carry norms up to ``cond(K)``); with strong
    smoothing (e.g. SHO at high quality, tiny ``diag``) expect log-
    likelihood errors of order ``eps_f32 * cond(K) * |loglik|``. Every
    structural contraction here is pinned to true-f32 accumulation
    (``helpers.pdot`` — TPU would otherwise demote matmuls to bf16), which
    is enough for typical jitters (>= 1e-2 of the signal variance); for
    severely ill-conditioned problems enable x64 as the reference advises
    (``/root/reference/docs/troubleshooting.md:12-37``).
    """

    X: Array
    matrix: SymmQSM
    factor: LowerTriQSM
    ssm: Any
    parallel: bool = static_field()

    def __init__(
        self,
        kernel: Kernel,
        X: Array,
        noise: Noise,
        *,
        covariance: Any | None = None,
        assume_sorted: bool = False,
        parallel: bool = True,
    ):
        ssm = None
        if covariance is None:
            from tinygp_tpu.kernels.quasisep import Quasisep

            assert isinstance(kernel, Quasisep)
            matrix = kernel.to_symm_qsm(X)
            if not assume_sorted:
                coords = kernel.coord_to_sortable(X)
                matrix = _guard_sorted(matrix, coords)
            matrix = matrix + noise.to_qsm()
            if parallel and isinstance(noise, Diagonal):
                # Fused log-likelihood operands, generated in the scans'
                # native stacked layout. Diagonal noise (and the sorted
                # poison) live entirely in `matrix.diag.d`, so pairing that
                # d with kernel-stacked generators matches the QSM route
                # bit for bit. Kernels with lazy-Block transitions decline.
                try:
                    _, ps, qs, as_ = kernel.to_stacked_ssm(X)
                except NotImplementedError:
                    pass
                else:
                    ssm = (matrix.diag.d, ps, qs, as_)
        else:
            assert isinstance(covariance, SymmQSM)
            matrix = covariance
        self._init(
            X=X,
            matrix=matrix,
            parallel=parallel,
            ssm=ssm,
            factor=matrix.cholesky(parallel=parallel),
        )

    def variance(self) -> Array:
        return self.matrix.diag.d

    def covariance(self) -> Array:
        return self.matrix.to_dense()

    def normalization(self) -> Array:
        n = self.factor.shape[0]
        return jnp.sum(jnp.log(self.factor.diag.d)) + 0.5 * n * np.log(2 * np.pi)

    def solve_triangular(self, y: Array, *, transpose: bool = False) -> Array:
        if transpose:
            return self.factor.transpose().solve(y, parallel=self.parallel)
        return self.factor.solve(y, parallel=self.parallel)

    def log_likelihood(self, r: Array) -> Array:
        """Fused factor-and-whiten when stacked operands are available.

        One pass in the stacked layout (no ``(N, m, m)`` intermediates, no
        repacking transposes); under ``jit`` the eagerly-built ``factor``
        is dead code for this path and XLA eliminates it.
        """
        if self.ssm is None or r.ndim != 1:
            return super().log_likelihood(r)
        from tinygp_tpu.solvers.quasisep.ops import stacked_loglik_terms

        d, ps, qs, as_ = self.ssm
        quad, logdet = stacked_loglik_terms(d, ps, qs, as_, r)
        n = r.shape[0]
        return -0.5 * (quad + n * np.log(2 * np.pi)) - logdet

    def dot_triangular(self, y: Array) -> Array:
        return self.factor.matmul(y, parallel=self.parallel)

    def condition(
        self, kernel: Kernel, X_test: Array | None, noise: Noise
    ) -> Any:
        """Conditional covariance.

        When predicting at the training points with a quasiseparable kernel
        the posterior covariance stays quasiseparable:
        ``M + noise - (L^{-1} M).gram()``. Otherwise this falls back to a
        dense representation (careful with many test points).
        """
        from tinygp_tpu.kernels.quasisep import Quasisep

        if X_test is None and isinstance(kernel, Quasisep):
            M = kernel.to_symm_qsm(self.X)
            delta = (self.factor.inv() @ M).gram()
            return (M + noise.to_qsm()) - delta

        if X_test is None:
            Kss = Ks = kernel(self.X, self.X)
        else:
            Kss = kernel(X_test, X_test)
            Ks = kernel(self.X, X_test)
        A = self.solve_triangular(Ks)
        return Kss - A.T @ A


def _guard_sorted(matrix: SymmQSM, coords: Array) -> SymmQSM:
    """Enforce sorted inputs without host callbacks.

    Concrete inputs raise immediately. Traced inputs poison the diagonal
    with NaN when unsorted, which the GP's NaN guard converts to a ``-inf``
    log probability — the multi-host-safe analog of the reference's
    ``jax.debug.callback`` check (``quasisep/solver.py:142-146``).
    """
    if isinstance(coords, jax.core.Tracer):
        ok = jnp.all(jnp.diff(coords) >= 0)
        poison = jnp.where(ok, 1.0, jnp.nan).astype(matrix.diag.d.dtype)
        return SymmQSM(
            diag=DiagQSM(d=matrix.diag.d * poison), lower=matrix.lower
        )
    if np.any(np.diff(np.asarray(coords)) < 0):
        raise ValueError(
            "Input coordinates must be sorted in order to use the "
            "QuasisepSolver"
        )
    return matrix
