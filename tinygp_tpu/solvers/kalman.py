"""A Kalman-filter solver, used as an independent O(N) oracle.

Behavioral parity: ``/root/reference/src/tinygp/solvers/kalman.py``. Only the
marginal-likelihood path (``normalization`` + whitening ``solve_triangular``)
is implemented; this solver exists to cross-check the quasiseparable
factorization through a completely different recursion (the innovations form
of the state-space filter).
"""

from __future__ import annotations

__all__ = ["kalman_filter", "kalman_gains", "KalmanSolver"]

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu.helpers import Array, pdot
from tinygp_tpu.kernels.base import Kernel
from tinygp_tpu.noise import Diagonal, Noise
from tinygp_tpu.solvers.quasisep.block import ensure_dense
from tinygp_tpu.solvers.solver import Solver


_ORACLE_ONLY = (
    "KalmanSolver is a cross-checking oracle: only the marginal-"
    "likelihood path (normalization + forward whitening) is implemented"
)


class KalmanSolver(Solver):
    """Whiten observations with a Kalman filter.

    Args:
        kernel: A :class:`tinygp_tpu.kernels.quasisep.Quasisep` kernel.
        X: Sorted input coordinates.
        noise: Must be :class:`tinygp_tpu.noise.Diagonal`.
    """

    X: Array
    A: Array
    H: Array
    s: Array
    K: Array

    def __init__(
        self,
        kernel: Kernel,
        X: Array,
        noise: Noise,
        *,
        covariance: Any | None = None,
    ):
        from tinygp_tpu.kernels.quasisep import Quasisep

        if not isinstance(kernel, Quasisep):
            raise TypeError("the Kalman oracle needs a state-space kernel")
        if not isinstance(noise, Diagonal):
            raise TypeError("the Kalman oracle handles diagonal noise only")
        if covariance is not None:
            raise TypeError("precomputed covariances are not supported here")

        Pinf = kernel.stationary_covariance()
        X_prev = jax.tree_util.tree_map(
            lambda x: jnp.append(x[0], x[:-1]), X
        )
        # Densify lazily-blocked transitions (e.g. from Sum kernels): the
        # precision-pinned contractions below take plain arrays.
        A = jax.vmap(
            lambda x1, x2: ensure_dense(kernel.transition_matrix(x1, x2))
        )(X_prev, X)
        t = jax.vmap(kernel.coord_to_sortable)(X)
        H = jax.vmap(kernel.observation_model)(X)
        # Tie to the inputs so constant observation models don't become
        # giant compile-time constants (see kernels.quasisep._anchor).
        H = jnp.where(jnp.isnan(t)[:, None], 0.0, H)
        s, K = kalman_gains(Pinf, A, H, noise.diag)
        self._init(X=X, A=A, H=H, s=s, K=K)

    def variance(self) -> Array:
        raise NotImplementedError(_ORACLE_ONLY)

    def covariance(self) -> Array:
        raise NotImplementedError(_ORACLE_ONLY)

    def normalization(self) -> Array:
        n = self.s.shape[0]
        return 0.5 * (jnp.sum(jnp.log(self.s)) + n * np.log(2 * np.pi))

    def solve_triangular(self, y: Array, *, transpose: bool = False) -> Array:
        if transpose:
            raise NotImplementedError(_ORACLE_ONLY)
        innovations = kalman_filter(self.A, self.H, self.K, y)
        return innovations * jax.lax.rsqrt(self.s)

    def dot_triangular(self, y: Array) -> Array:
        raise NotImplementedError(_ORACLE_ONLY)

    def condition(
        self, kernel: Kernel, X_test: Array | None, noise: Noise
    ) -> Any:
        raise NotImplementedError(_ORACLE_ONLY)


@jax.jit
def kalman_gains(
    Pinf: Array, A: Array, H: Array, diag: Array
) -> tuple[Array, Array]:
    """Innovation variances and gains from the covariance recursion.

    Anchoring the recursion at the stationary covariance keeps it stable:
    ``P_pred = Pinf + A^T (P - Pinf) A`` propagates only the *deviation*
    from stationarity.
    """
    Pinf = ensure_dense(Pinf)

    def step(P, inputs):
        A_k, h_k, d_k = inputs
        P_pred = Pinf + pdot(pdot(A_k.T, P - Pinf), A_k)
        Ph = pdot(P_pred, h_k)
        s_k = pdot(h_k, Ph) + d_k
        K_k = Ph / s_k
        P_post = P_pred - s_k * jnp.outer(K_k, K_k)
        return P_post, (s_k, K_k)

    return jax.lax.scan(step, Pinf, (A, H, diag))[1]


@jax.jit
def kalman_filter(
    A: Array, H: Array, K: Array, y: Array
) -> Array:
    """Run the mean filter, returning the (unnormalized) innovations."""

    def step(m, inputs):
        A_k, h_k, K_k, y_k = inputs
        m_pred = pdot(A_k.T, m)
        v_k = y_k - pdot(h_k, m_pred)
        m_post = m_pred + K_k * v_k
        return m_post, v_k

    m0 = jnp.zeros_like(H[0])
    return jax.lax.scan(step, m0, (A, H, K, y))[1]
