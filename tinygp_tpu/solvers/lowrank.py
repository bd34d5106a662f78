"""Inducing-point low-rank solver: dense kernels at large N in O(N M^2).

The reference's own benchmark table pits tinygp against george's HODLR
approximation for exactly this regime (BASELINE.md: 58 ms at N=1e4, 123 ms
at N=2e4, 1-thread CPU) but ships no approximate solver of its own. This
one approximates the prior with the standard FITC/Nystrom construction on
M inducing points Z:

    K ~= Khat = D + W W^T,
    W = k(X, Z) chol(k(Z, Z))^{-T},
    D = noise_diag + (k_diag(X) - rowsum(W^2))   [FITC: exact diagonal]

and then treats Khat EXACTLY via Woodbury identities — so within the
approximate prior, every number this solver produces (log-likelihood,
conditionals, samples) is exact, and with Z = X it reproduces
:class:`~tinygp_tpu.solvers.direct.DirectSolver` to float precision.

TPU-first: all heavy work is two tall GEMMs (N x M) and M x M
factorizations — pure MXU food with no sequential structure. The only
eigendecomposition is a symmetric M x M ``eigh`` (which has a TPU
lowering), used to apply the symmetric square root of the Woodbury
capacitance so the ``Solver`` contract's triangular-factor semantics hold:

    Khat = Lhat Lhat^T,  Lhat = D^{1/2} (I + V V^T)^{1/2},  V = D^{-1/2} W
    (I + V V^T)^{+-1/2} = I + V E f(lam) E^T V^T,  S = V^T V = E lam E^T

with f analytic in the eigenvalues (safe at lam -> 0 via a switch to the
series limit).
"""

from __future__ import annotations

__all__ = ["LowRankSolver"]

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.noise import Diagonal, Noise
from tinygp_tpu.solvers.solver import Solver


def _sqrt_eigs(lam: Array, sign: int) -> Array:
    """``((1 + lam)^{sign/2} - 1) / lam`` with the lam -> 0 limit guarded."""
    lam_safe = jnp.where(jnp.abs(lam) < 1e-12, 1.0, lam)
    f = (jnp.power(1.0 + lam, 0.5 * sign) - 1.0) / lam_safe
    return jnp.where(jnp.abs(lam) < 1e-12, 0.5 * sign, f)


class LowRankSolver(Solver):
    """FITC/Nystrom inducing-point solver for dense kernels.

    Args:
        kernel: Any dense :class:`~tinygp_tpu.kernels.base.Kernel`.
        X: Input coordinates, ``(N,)`` or ``(N, d)`` (or any pytree the
            kernel accepts).
        noise: Observation noise; must be :class:`Diagonal`.
        inducing_points: The ``(M,)``/``(M, d)`` inducing locations Z. A
            good default is a subset of ``X``. Required.
        fitc: Keep the prior's diagonal exact by folding the Nystrom
            residual ``k_diag - rowsum(W^2)`` into ``D`` (default). With
            ``False`` (subset-of-regressors) the diagonal is the Nystrom
            one and ``D`` is the noise alone.

    Within the approximate prior all outputs are exact; with ``Z = X`` the
    approximation is exact and this matches ``DirectSolver`` to float
    precision (tested). Cost: ``O(N M^2 + M^3)`` time, ``O(N M)`` memory.
    """

    X: Array
    inducing_points: Array
    W: Array
    D: Array
    eigvecs: Array
    eigvals: Array
    variance_value: Array
    fitc: bool

    def __init__(
        self,
        kernel: Kernel,
        X: Array,
        noise: Noise,
        *,
        covariance: Any | None = None,
        inducing_points: Array | None = None,
        fitc: bool = True,
    ):
        if covariance is not None:
            raise TypeError(
                "LowRankSolver builds its own structured covariance"
            )
        if inducing_points is None:
            raise TypeError(
                "LowRankSolver requires inducing_points=Z (e.g. a subset "
                "of X)"
            )
        if not isinstance(noise, Diagonal):
            raise TypeError("LowRankSolver supports Diagonal noise only")

        Z = inducing_points
        k_diag = kernel(X)
        Kmm = kernel(Z, Z)
        Knm = kernel(X, Z)
        # Smooth kernels make Kmm numerically singular for clustered Z
        # (eigenvalues decay past machine eps), so the factorization needs
        # a ridge. Sized by dtype: enough to dominate the round-off
        # negative tail (so chol cannot NaN) while perturbing Qff well
        # below the test-tolerance policy. An eigh-based truncated root
        # avoids the ridge but its VJP is 1/(lam_i - lam_j) — NaN on the
        # degenerate tail — so Cholesky it is.
        rel = 1e-10 if Kmm.dtype == jnp.float64 else 3e-6
        ridge = rel * jnp.max(jnp.abs(jnp.diagonal(Kmm)))
        Kmm = Kmm + ridge * jnp.eye(Kmm.shape[0], dtype=Kmm.dtype)
        Lmm = jax.scipy.linalg.cholesky(Kmm, lower=True)
        # W = Knm Lmm^{-T}: one triangular solve against the M x M factor.
        W = jax.scipy.linalg.solve_triangular(Lmm, Knm.T, lower=True).T

        qff_diag = jnp.sum(jnp.square(W), axis=1)
        noise_diag = noise.diagonal()
        if fitc:
            D = noise_diag + jnp.maximum(k_diag - qff_diag, 0.0)
            variance = k_diag + noise_diag
        else:
            D = noise_diag * jnp.ones_like(k_diag)
            variance = qff_diag + noise_diag

        V = W / jnp.sqrt(D)[:, None]
        S = pdot(V.T, V)
        lam, E = jnp.linalg.eigh(S)
        lam = jnp.maximum(lam, 0.0)

        self._init(
            X=X,
            inducing_points=Z,
            W=W,
            D=D,
            eigvecs=E,
            eigvals=lam,
            variance_value=variance,
            fitc=fitc,
        )

    # -- the (I + V V^T)^{sign/2} operator -----------------------------------

    def _half_power(self, y: Array, sign: int) -> Array:
        V = self.W / jnp.sqrt(self.D)[:, None]
        f = _sqrt_eigs(self.eigvals, sign)
        t = pdot(self.eigvecs.T, pdot(V.T, y))
        f = f.reshape((-1,) + (1,) * (t.ndim - 1))
        return y + pdot(V, pdot(self.eigvecs, f * t))

    def variance(self) -> Array:
        return self.variance_value

    def covariance(self) -> Array:
        # Dense Khat; O(N^2 M) — for tests and small problems only.
        return jnp.diag(self.D) + pdot(self.W, self.W.T)

    def normalization(self) -> Array:
        n = self.D.shape[0]
        logdet = jnp.sum(jnp.log(self.D)) + jnp.sum(
            jnp.log1p(self.eigvals)
        )
        return 0.5 * logdet + 0.5 * n * np.log(2 * np.pi)

    def solve_triangular(self, y: Array, *, transpose: bool = False) -> Array:
        sqrt_D = jnp.sqrt(self.D)
        shape = (-1,) + (1,) * (y.ndim - 1)
        if transpose:
            return self._half_power(y, -1) / sqrt_D.reshape(shape)
        return self._half_power(y / sqrt_D.reshape(shape), -1)

    def dot_triangular(self, y: Array) -> Array:
        shape = (-1,) + (1,) * (y.ndim - 1)
        return jnp.sqrt(self.D).reshape(shape) * self._half_power(y, 1)

    def condition(
        self, kernel: Kernel, X_test: Array | None, noise: Noise
    ) -> Any:
        """Conditional covariance (dense).

        Note: at the training points (``X_test=None``) this materializes
        the N x N matrix — condition on a prediction grid instead when N
        is the reason you chose this solver.
        """
        if X_test is None:
            Kss = Ks = kernel(self.X, self.X)
        else:
            Kss = kernel(X_test, X_test)
            Ks = kernel(self.X, X_test)
        A = self.solve_triangular(Ks)
        return Kss - pdot(A.T, A)
