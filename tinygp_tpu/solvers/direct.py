"""The exact dense O(N^3) solver.

API parity: ``/root/reference/src/tinygp/solvers/direct.py:17-95``.

TPU mapping: the three hot operations are (1) the O(N^2) kernel-matrix
construction (fused by XLA, ~bandwidth bound), (2) the O(N^3) Cholesky
factorization, and (3) the O(N^2) triangular solves.

The factorization: XLA's native TPU Cholesky runs trailing updates at the
slow f32-accurate MXU rate (~19 TF/s sustained on v5e vs the ~175 TF/s
bf16 fast path). For f32 matrices at N >= 4096 this solver instead uses
:func:`tinygp_tpu.ops.dense.cholesky_with_fallback`: a right-looking
blocked factorization whose trailing updates run as fused split-bf16
Pallas kernels, with the split order picked at runtime from the noise
floor and a NaN-triggered native re-factorization for
borderline-indefinite inputs. Set ``blocked=False`` to force the native
kernel. Full analysis: ``docs/rooflines.md``.
"""

from __future__ import annotations

__all__ = ["DirectSolver"]

from typing import Any

import jax.numpy as jnp
import numpy as np
from jax.scipy import linalg

from tinygp_tpu import kernels
from tinygp_tpu.helpers import Array
from tinygp_tpu.noise import Diagonal, Noise
from tinygp_tpu.ops.dense import blocked_loglik_terms, cholesky_with_fallback
from tinygp_tpu.solvers.solver import Solver
from tinygp_tpu.utils.module import static_field


class DirectSolver(Solver):
    """Factorize the dense covariance with a Cholesky decomposition."""

    X: Array
    variance_value: Array
    covariance_value: Array
    scale_tril: Array
    rel_floor: Array
    kernel: Any
    noise_diag: Any
    blocked: bool = static_field(default=True)

    def __init__(
        self,
        kernel: kernels.Kernel,
        X: Array,
        noise: Noise,
        *,
        covariance: Any | None = None,
        blocked: bool = True,
    ):
        """Build the solver, factorizing eagerly.

        Args:
            kernel: The kernel function.
            X: The input coordinates.
            noise: The observation noise model.
            covariance: Optionally, a pre-computed dense covariance matrix
                (assumed equal to ``kernel(X, X) + noise``; not checked).
            blocked: Use the MXU split-precision blocked Cholesky for large
                f32 matrices (with automatic native fallback on breakdown).
                ``False`` forces XLA's native kernel everywhere.
        """
        # The strip-built fused log-likelihood reconstructs the covariance
        # from the kernel, so it must not engage when the caller supplied a
        # (possibly different) precomputed matrix.
        kernel_matches_cov = covariance is None
        if covariance is None:
            variance_value = kernel(X) + noise.diagonal()
            covariance = kernel(X, X) + noise
        else:
            # A supplied covariance is by contract kernel(X, X) + noise, so
            # its diagonal IS the variance. Reading it here matters a lot
            # for conditioned processes: their kernel's evaluate_diag runs
            # one O(N_train^2) triangular solve per point, so a vmapped
            # diag at M test points would cost O(M N^2) — at N=M=1e4 that
            # dwarfs the conditioning itself.
            variance_value = jnp.diagonal(covariance)
        if blocked:
            # The noise floor bounds lambda_min of the unit-scaled
            # covariance from below — but only for DIAGONAL noise (kernel
            # part PSD + diagonal shift). Dense/Banded noise can be
            # indefinite-shifting, so they take the conservative 3-term
            # split (rel_floor=0) rather than trusting the diagonal.
            if isinstance(noise, Diagonal):
                rel_floor = jnp.min(
                    noise.diagonal() / jnp.maximum(variance_value, 1e-30)
                )
            else:
                rel_floor = jnp.zeros(())
            scale_tril = cholesky_with_fallback(
                covariance, rel_floor=rel_floor
            )
        else:
            rel_floor = jnp.zeros(())
            scale_tril = linalg.cholesky(covariance, lower=True)
        self._init(
            X=X,
            variance_value=variance_value,
            covariance_value=covariance,
            scale_tril=scale_tril,
            rel_floor=rel_floor,
            # Operands for the fully-fused log-likelihood (gram built in
            # panel strips, never materialized). Diagonal-noise only; the
            # eager covariance above is dead code under jit on that path.
            kernel=(
                kernel
                if kernel_matches_cov and isinstance(noise, Diagonal)
                else None
            ),
            noise_diag=(
                noise.diagonal()
                if kernel_matches_cov and isinstance(noise, Diagonal)
                else None
            ),
            blocked=blocked,
        )

    def variance(self) -> Array:
        return self.variance_value

    def covariance(self) -> Array:
        return self.covariance_value

    def normalization(self) -> Array:
        n = self.scale_tril.shape[0]
        half_log2pi = 0.5 * np.log(2.0 * np.pi)
        return jnp.sum(jnp.log(jnp.diag(self.scale_tril))) + n * half_log2pi

    def log_likelihood(self, r: Array) -> Array:
        """Fused factor-and-whiten for large f32 covariances.

        One blocked panel loop computes the quadratic form and the log
        determinant together (``ops.dense.blocked_loglik_terms``): the
        scaling/padding passes fold into the matrix assembly, forward
        substitution interleaves with the factorization (no separate
        O(N^2) TRSM), and the factor is never rescaled. Under ``jit`` the
        eagerly-built ``scale_tril`` is dead code on this path and XLA
        eliminates it. Small/f64/batched inputs use the generic route.
        """
        n = self.covariance_value.shape[0]
        from tinygp_tpu.ops import dense as _dense

        if (
            not self.blocked
            or r.ndim != 1
            or self.covariance_value.dtype != jnp.float32
            or n < _dense._MIN_BLOCKED
        ):
            return super().log_likelihood(r)
        if self.kernel is not None:
            # Strip-built gram: kernel evaluated on lower panels only, the
            # noise/scale/pad passes fused into the strip writes.
            quad, half_logdet = _dense.kernel_loglik_terms(
                self.kernel,
                self.X,
                self.noise_diag,
                r,
                variance=self.variance_value,
                rel_floor=self.rel_floor,
            )
        else:
            quad, half_logdet = blocked_loglik_terms(
                self.covariance_value,
                r,
                min_size=_dense._MIN_BLOCKED,
                rel_floor=self.rel_floor,
            )
        return -0.5 * (quad + n * np.log(2.0 * np.pi)) - half_logdet

    def solve_triangular(self, y: Array, *, transpose: bool = False) -> Array:
        # Native TRSM for every right-hand-side shape. Thin RHS: a blocked
        # substitution measured within noise of native (2.38 vs 2.35 ms at
        # N=1e4, 1 RHS). Wide RHS: the round-4 split-bf16 blocked
        # substitution measured a clean NEGATIVE on v5e (2026-08-20,
        # benchmarks/condition_bench.json): 0.77x the native formulation
        # end-to-end AND ~1e-2 absolute error in the whitened
        # cross-covariance — the split operand error amplifies by the
        # factor's condition number across the sequential panel
        # substitution, which a posterior-variance cancellation then turns
        # into negative variances. docs/rooflines.md §1, negative results.
        return linalg.solve_triangular(
            self.scale_tril, y, lower=True, trans=1 if transpose else 0
        )

    def dot_triangular(self, y: Array) -> Array:
        return jnp.einsum(
            "ij,j...->i...", self.scale_tril, y, precision="highest"
        )

    def condition(
        self, kernel: kernels.Kernel, X_test: Array | None, noise: Noise
    ) -> Any:
        """Dense conditional covariance ``Kss - A.T @ A``, ``A = L^{-1} Ks``.

        Matches ``/root/reference/src/tinygp/solvers/direct.py:75-95``.
        Both O(N^2 M) stages stay on the native kernels with pinned f32
        precision: the round-4 split-bf16 substitution + split-SYRK route
        measured slower AND less accurate (see ``solve_triangular``) —
        posterior variance is a large cancellation (prior ~1.5 down to
        ~3e-3 on the bench workload), so the downdate needs every f32
        digit the hardware has.
        """
        if X_test is None:
            Ks = kernel(self.X, self.X)
            Kss = Ks + noise
        else:
            Ks = kernel(self.X, X_test)
            Kss = kernel(X_test, X_test) + noise
        A = self.solve_triangular(Ks)
        return Kss - jnp.matmul(A.T, A, precision="highest")
