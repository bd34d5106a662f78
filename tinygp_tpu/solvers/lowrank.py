"""Inducing-point low-rank solver: dense kernels at large N in O(N M^2).

The reference's own benchmark table pits tinygp against george's HODLR
approximation for exactly this regime (BASELINE.md: 58 ms at N=1e4, 123 ms
at N=2e4, 1-thread CPU) but ships no approximate solver. This one
approximates the prior with the standard FITC/Nystrom construction on M
inducing points Z:

    K ~= Khat = D + W W^T,
    W = k(X, Z) chol(k(Z, Z))^{-T},
    D = noise_diag + (k_diag(X) - rowsum(W^2))   [FITC: exact diagonal]

and then treats Khat EXACTLY via Woodbury identities — so within the
approximate prior, every number this solver produces (log-likelihood,
conditionals, samples) is exact, and with Z = X it reproduces
:class:`~tinygp_tpu.solvers.direct.DirectSolver` to float precision.

TPU-first: all heavy work is two tall GEMMs (N x M) and M x M
factorizations — pure MXU food with no sequential structure. The
``Solver`` contract's triangular-factor semantics hold through the
symmetric square root of the Woodbury capacitance:

    Khat = Lhat Lhat^T,  Lhat = D^{1/2} (I + V V^T)^{1/2},  V = D^{-1/2} W
    (I + V V^T)^{+-1/2} = I + V phi(S) V^T,     S = V^T V  (M x M)

where ``phi`` is an analytic matrix function of S applied through a
symmetric eigendecomposition. Its derivative is supplied explicitly via
the Daleckii-Krein divided-difference formula, which stays finite at
repeated eigenvalues — the raw ``eigh`` VJP has 1/(lam_i - lam_j) terms
that NaN out exactly when W is rank-deficient (duplicated inducing
points, M past the gram's numerical rank), a routine configuration here.
"""

from __future__ import annotations

__all__ = ["LowRankSolver"]

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.noise import Diagonal, Noise
from tinygp_tpu.solvers.solver import Solver
from tinygp_tpu.utils.module import static_field


def _phi(lam: Array, sign: int) -> Array:
    """``((1 + lam)^{sign/2} - 1) / lam`` in cancellation-free form."""
    u = jnp.sqrt(1.0 + lam)
    if sign > 0:
        return 1.0 / (1.0 + u)
    return -1.0 / (u * (1.0 + u))


def _phi_prime(lam: Array, sign: int) -> Array:
    """Derivative of :func:`_phi`, same stable parameterization."""
    u = jnp.sqrt(1.0 + lam)
    if sign > 0:
        return -1.0 / (2.0 * u * (1.0 + u) ** 2)
    return (1.0 + 2.0 * u) / (2.0 * u * (u * (1.0 + u)) ** 2)


def _finite_guard(S: Array) -> tuple[Array, Array]:
    """Replace a non-finite ``S`` with I and return a NaN poison scalar.

    ``eigh`` MUST never see non-finite input on TPU: the iterative
    eigensolver does not converge and takes the whole TPU worker process
    down (observed 2026-08-20 when an under-ridged Cholesky upstream
    produced a NaN capacitance). The guard keeps the solve well-defined
    and re-injects NaN into the *output*, so the GP-level NaN -> -inf
    log-probability guard still sees the failure.
    """
    bad = ~jnp.all(jnp.isfinite(S))
    safe = jnp.where(bad, jnp.eye(S.shape[0], dtype=S.dtype), S)
    poison = jnp.where(bad, jnp.nan, 0.0).astype(S.dtype)
    return safe, poison


@partial(jax.custom_jvp, nondiff_argnums=(2,))
def _cap_apply(S: Array, T: Array, sign: int) -> Array:
    """``phi(S) @ T`` with a tie-safe derivative.

    ``(I + V V^T)^{sign/2} = I + V phi(S) V^T``. The primal applies ``phi``
    *in the eigenbasis* (scale each direction, never materialize
    ``E phi E^T`` — the materialized matrix mixes O(0.5) and O(1/lam_max)
    scalings into shared entries and costs ~20x accuracy in f32 when
    ``cond(S)`` is large). The tangent uses Daleckii-Krein divided
    differences ``(phi_i - phi_j)/(lam_i - lam_j)`` with the analytic
    ``phi'`` on (near-)ties, so gradients are finite for ANY PSD S —
    including the rank-deficient ones where the generic eigh VJP divides
    by zero.
    """
    S, poison = _finite_guard(S)
    lam, E = jnp.linalg.eigh(S)
    f = _phi(jnp.maximum(lam, 0.0), sign)
    return pdot(E, f[:, None] * pdot(E.T, T)) + poison


@_cap_apply.defjvp
def _cap_apply_jvp(sign, primals, tangents):
    S, T = primals
    dS, dT = tangents
    S, poison = _finite_guard(S)
    lam, E = jnp.linalg.eigh(S)
    lam = jnp.maximum(lam, 0.0)
    f = _phi(lam, sign)
    df = _phi_prime(lam, sign)
    Et_T = pdot(E.T, T)
    primal = pdot(E, f[:, None] * Et_T) + poison

    den = lam[:, None] - lam[None, :]
    tol = 1e-6 * (1.0 + lam[:, None] + lam[None, :])
    tie = jnp.abs(den) < tol
    diff = jnp.where(
        tie,
        0.5 * (df[:, None] + df[None, :]),
        (f[:, None] - f[None, :]) / jnp.where(tie, 1.0, den),
    )
    dS_sym = 0.5 * (dS + dS.T)
    inner = pdot(E.T, pdot(dS_sym, E))
    tangent = (
        pdot(E, pdot(diff * inner, Et_T))
        + pdot(E, f[:, None] * pdot(E.T, dT))
        + poison
    )
    return primal, tangent


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

    Conditioning note: the predictive covariance contracts the *Nystrom*
    cross-covariances ``Qsf = k(X*, Z) Kmm^{-1} k(Z, X)`` against the
    approximate prior inverse (the standard FITC predictive), which keeps
    it positive semi-definite; mixing exact cross-covariances with the
    approximate inverse does not. The predictive mean assembled by
    :meth:`GaussianProcess.condition` uses the exact cross-covariance
    against ``Khat^{-1} y`` (a DTC-style mean).
    """

    X: Array
    inducing_points: Array
    Lmm: Array
    W: Array
    D: Array
    S: Array
    variance_value: Array
    fitc: bool = static_field()

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
        # a ridge: sized by dtype to dominate the round-off negative tail
        # (so chol cannot NaN) while perturbing Qff far below the test
        # tolerance policy. The tail scales with ||Kmm||_2, for which the
        # trace is the cheap PSD upper bound — scaling by max|diag| alone
        # was ~M times too small for clustered inducing points (measured
        # 2026-08-20: NaN factor at N=1e4, M=512, f32 on the v5e, whose
        # eigh then took the whole TPU worker process down).
        rel = 1e-10 if Kmm.dtype == jnp.float64 else 3e-6
        ridge = rel * jnp.sum(jnp.abs(jnp.diagonal(Kmm)))
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

        self._init(
            X=X,
            inducing_points=Z,
            Lmm=Lmm,
            W=W,
            D=D,
            S=S,
            variance_value=variance,
            fitc=fitc,
        )

    # -- the (I + V V^T)^{sign/2} operator -----------------------------------

    def _half_power(self, y: Array, sign: int) -> Array:
        V = self.W / jnp.sqrt(self.D)[:, None]
        t = pdot(V.T, y)
        t2 = _cap_apply(self.S, t if t.ndim > 1 else t[:, None], sign)
        return y + pdot(V, t2.reshape(t.shape))

    def variance(self) -> Array:
        return self.variance_value

    def covariance(self) -> Array:
        # Dense Khat; O(N^2 M) — for tests and small problems only.
        return jnp.diag(self.D) + pdot(self.W, self.W.T)

    def _cap_chol(self) -> Array:
        """Cholesky of the M x M capacitance ``I + S`` (always SPD)."""
        eye = jnp.eye(self.S.shape[0], dtype=self.S.dtype)
        return jax.scipy.linalg.cholesky(eye + self.S, lower=True)

    def normalization(self) -> Array:
        n = self.D.shape[0]
        logdet_cap = 2.0 * jnp.sum(jnp.log(jnp.diagonal(self._cap_chol())))
        logdet = jnp.sum(jnp.log(self.D)) + logdet_cap
        return 0.5 * logdet + 0.5 * n * np.log(2 * np.pi)

    def log_likelihood(self, r: Array) -> Array:
        """Fused Woodbury log density — no eigendecomposition.

        The generic route whitens through the symmetric square root,
        whose ``eigh(M x M)`` dominates the whole evaluation on TPU (the
        iterative eigensolver costs ~20 ms at M=512 — measured
        2026-08-20, ``benchmarks/lowrank_bench.json``'s N-independent
        ~23 ms floor). The quadratic form only needs ``Khat^{-1}``,
        which Woodbury gives through one M x M Cholesky::

            quad = z^T z - u^T (I + S)^{-1} u,  z = D^{-1/2} r, u = V^T z
            log|Khat| = sum log D + 2 sum log diag(chol(I + S))

        The square-root operator (``solve_triangular``/``dot_triangular``)
        keeps the eigh route for sampling and conditioning semantics.
        """
        z = r / jnp.sqrt(self.D)
        u = pdot((self.W / self.D[:, None]).T, r)
        C = self._cap_chol()
        w = jax.scipy.linalg.solve_triangular(C, u, lower=True)
        quad = jnp.sum(jnp.square(z)) - jnp.sum(jnp.square(w))
        return -0.5 * quad - self.normalization()

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
        """FITC predictive covariance ``Kss + noise - Qsf Khat^{-1} Qfs``.

        PSD by construction (``Qsf Khat^{-1} Qfs <= Qss <= Kss``
        elementwise in the Loewner order). At the training points
        (``X_test=None``) this materializes N x N — condition on a
        prediction grid instead when N is the reason you chose this
        solver.
        """
        Xs = self.X if X_test is None else X_test
        Kss = kernel(Xs, Xs) + noise
        # Ws = k(Xs, Z) Lmm^{-T}, so Qfs = W Ws^T.
        Ksm = kernel(Xs, self.inducing_points)
        Ws = jax.scipy.linalg.solve_triangular(
            self.Lmm, Ksm.T, lower=True
        ).T
        # Whiten the Nystrom cross-covariance directly (O(N M T)): the
        # algebraically equivalent M x M capacitance route
        # ``Ws (W^T Khat^{-1} W) Ws^T`` squares the conditioning and loses
        # ~1e-3 absolute on f32 posterior variances.
        A = self.solve_triangular(pdot(self.W, Ws.T))
        return Kss - pdot(A.T, A)
