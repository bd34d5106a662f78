"""The user-facing Gaussian process interface.

API parity: ``/root/reference/src/tinygp/gp.py:30-393`` — a
``GaussianProcess`` is a multivariate normal over function values at ``X``
with methods ``log_probability``, ``condition``, ``predict``, ``sample``,
and ``numpyro_dist``. Construction factorizes eagerly (functional style: the
whole object is a pytree, so rebuilding inside a jitted loss stages into one
XLA program).

Solver auto-selection: quasiseparable kernels (and precomputed ``SymmQSM``
covariances) route to the O(N) :class:`tinygp_tpu.solvers.QuasisepSolver`;
everything else uses the dense :class:`tinygp_tpu.solvers.DirectSolver`.
"""

from __future__ import annotations

__all__ = ["GaussianProcess", "ConditionResult"]

from collections.abc import Callable, Sequence
from functools import partial
from typing import TYPE_CHECKING, Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tinygp_tpu import kernels, means
from tinygp_tpu.helpers import Array
from tinygp_tpu.noise import Diagonal, Noise
from tinygp_tpu.solvers.solver import Solver
from tinygp_tpu.utils.module import Module, static_field

if TYPE_CHECKING:
    from tinygp_tpu.numpyro_support import TinyDistribution


class GaussianProcess(Module):
    """A Gaussian process regression model.

    Args:
        kernel: The covariance kernel.
        X: Input coordinates — any pytree whose leaves have leading dimension
            ``N_data``.
        diag: Extra diagonal variance (scalar or ``(N_data,)``); defaults to
            ``sqrt(eps)`` jitter for the active dtype.
        noise: A full :class:`tinygp_tpu.noise.Noise` model; overrides
            ``diag``.
        mean: A constant, a callable evaluated per input point, or a
            :class:`tinygp_tpu.means.MeanBase`.
        solver: A solver class; auto-selected when omitted.
        mean_value / covariance_value: Precomputed values used internally by
            :meth:`condition`.
        **solver_kwargs: Forwarded to the solver (e.g. ``parallel=…``,
            ``assume_sorted=…`` for the quasiseparable solver). Note the
            dense :class:`~tinygp_tpu.solvers.direct.DirectSolver` accepts
            ``blocked=False`` to force XLA's native Cholesky instead of
            the default MXU split-precision blocked factorization (which
            self-checks and re-factors natively when its factor is
            inaccurate) — the escape hatch if the blocked path ever
            misbehaves on your matrices.

    Examples:
        Build a GP, score data, and condition on it:

        >>> import jax.numpy as jnp
        >>> from tinygp_tpu import GaussianProcess, kernels
        >>> X = jnp.linspace(0.0, 5.0, 8)
        >>> y = jnp.sin(X)
        >>> gp = GaussianProcess(kernels.ExpSquared(scale=1.0), X, diag=0.01)
        >>> bool(jnp.isfinite(gp.log_probability(y)))
        True
        >>> _, cond = gp.condition(y, jnp.linspace(0.0, 5.0, 11))
        >>> cond.loc.shape
        (11,)
    """

    num_data: int = static_field()
    dtype: Any = static_field()
    kernel: kernels.Kernel
    X: Array
    mean_function: means.MeanBase
    mean: Array
    noise: Noise
    solver: Solver

    def __init__(
        self,
        kernel: kernels.Kernel,
        X: Array,
        *,
        diag: Array | None = None,
        noise: Noise | None = None,
        mean: means.MeanBase | Callable[[Array], Array] | Array | None = None,
        solver: Any | None = None,
        mean_value: Array | None = None,
        covariance_value: Any | None = None,
        **solver_kwargs: Any,
    ):
        # Deferred imports to avoid a cycle through the solver stack.
        from tinygp_tpu.kernels.quasisep import Quasisep
        from tinygp_tpu.solvers.direct import DirectSolver
        from tinygp_tpu.solvers.quasisep.core import SymmQSM
        from tinygp_tpu.solvers.quasisep.solver import QuasisepSolver

        mean_function = _as_mean_function(mean)
        if mean_value is None:
            mean_value = jax.vmap(mean_function)(X)
        if jnp.ndim(mean_value) != 1:
            raise ValueError(
                "the mean must evaluate to one scalar per data point; got "
                f"a {jnp.ndim(mean_value)}-d array"
            )
        noise = _as_noise(noise, diag, mean_value)

        if solver is None:
            structured = isinstance(kernel, Quasisep) or isinstance(
                covariance_value, SymmQSM
            )
            solver = QuasisepSolver if structured else DirectSolver
        if solver is DirectSolver:
            # Quasisep-only switches are harmless no-ops on the dense path;
            # dropping them lets one model function serve both solvers
            # (e.g. sweeping kernels with assume_sorted=True set).
            solver_kwargs.pop("assume_sorted", None)
            solver_kwargs.pop("parallel", None)
        elif solver is QuasisepSolver:
            # ... and the dense-only switch is a no-op on the O(N) path.
            solver_kwargs.pop("blocked", None)

        self._init(
            num_data=mean_value.shape[0],
            dtype=mean_value.dtype,
            kernel=kernel,
            X=X,
            mean_function=mean_function,
            mean=mean_value,
            noise=noise,
            solver=solver(
                kernel, X, noise, covariance=covariance_value, **solver_kwargs
            ),
        )

    loc = property(
        lambda self: self.mean, doc="The marginal mean (alias of ``mean``)."
    )
    variance = property(
        lambda self: self.solver.variance(),
        doc="Pointwise marginal variance at the input points.",
    )
    covariance = property(
        lambda self: self.solver.covariance(),
        doc="Dense marginal covariance at the input points.",
    )

    def log_probability(self, y: Array) -> Array:
        """The marginal log probability of ``y`` under this process.

        Non-finite results (e.g. from an indefinite covariance) are mapped to
        ``-inf`` so samplers reject rather than propagate NaNs. Routed
        through :meth:`Solver.log_likelihood` so solvers with a fused
        factor-and-whiten path (the quasiseparable one) skip materializing
        the whitened residual.
        """
        return self._log_probability(y)

    @jax.jit
    def _log_probability(self, y: Array) -> Array:
        # jit here keeps EAGER callers fast: one compiled program instead
        # of per-primitive dispatches (25-40 ms each through the tunnel).
        lp = self.solver.log_likelihood(y - self.loc)
        return jnp.where(jnp.isfinite(lp), lp, -jnp.inf)

    def condition(
        self,
        y: Array,
        X_test: Array | None = None,
        *,
        diag: Array | None = None,
        noise: Noise | None = None,
        include_mean: bool = True,
        kernel: kernels.Kernel | None = None,
    ) -> ConditionResult:
        """Condition on data, returning the posterior process at ``X_test``.

        Args:
            y: Observed values, shape ``(N_data,)``.
            X_test: Prediction coordinates (defaults to the training inputs).
            diag / noise: Observation noise for the *predicted* process.
            include_mean: Include the prior mean in the posterior mean.
            kernel: Optionally, a different cross-covariance kernel (e.g. one
                component of a mixture).

        Returns:
            A :class:`ConditionResult` with the marginal ``log_probability``
            and the conditioned ``gp``.
        """
        if X_test is not None:
            _check_test_points(self.X, X_test)

        kinv_r, log_prob, post_loc = self._condition(y, X_test, include_mean, kernel)
        cross_kernel = self.kernel if kernel is None else kernel
        noise = _as_noise(noise, diag, post_loc)

        post_mean = means.Conditioned(
            self.X, kinv_r, cross_kernel,
            include_mean=include_mean, mean_function=self.mean_function,
        )
        post = GaussianProcess(
            kernels.Conditioned(self.X, self.solver, cross_kernel),
            self.X if X_test is None else X_test,
            noise=noise,
            mean=post_mean,
            mean_value=post_loc,
            covariance_value=self.solver.condition(cross_kernel, X_test, noise),
        )
        return ConditionResult(log_prob, post)

    @partial(jax.jit, static_argnames=("include_mean", "return_var", "return_cov"))
    def predict(
        self,
        y: Array,
        X_test: Array | None = None,
        *,
        kernel: kernels.Kernel | None = None,
        include_mean: bool = True,
        return_var: bool = False,
        return_cov: bool = False,
    ) -> Array | tuple[Array, Array]:
        """Posterior mean (and optionally variance/covariance) at ``X_test``."""
        post = self.condition(y, X_test, kernel=kernel, include_mean=include_mean).gp
        if return_var:
            return post.loc, post.variance
        if return_cov:
            return post.loc, post.covariance
        return post.loc

    def sample(
        self,
        key: jax.Array,
        shape: Sequence[int] | None = None,
    ) -> Array:
        """Draw realizations; returns shape ``shape + (N_data,)``."""
        return self._sample(key, None if shape is None else tuple(shape))

    def numpyro_dist(self, **kwargs: Any) -> TinyDistribution:
        """This process as a numpyro distribution (requires numpyro)."""
        from tinygp_tpu.numpyro_support import TinyDistribution

        return TinyDistribution(self, **kwargs)

    @partial(jax.jit, static_argnames=("shape",))
    def _sample(
        self,
        key: jax.Array,
        shape: tuple[int, ...] | None,
    ) -> Array:
        # Color white noise through the factor: mu + L @ eps. The data axis
        # leads into dot_triangular and is moved last on the way out, so
        # arbitrary batch shapes ride along untouched.
        eps = jax.random.normal(
            key, (self.num_data, *(shape or ())), self.dtype
        )
        return self.mean + jnp.moveaxis(self.solver.dot_triangular(eps), 0, -1)

    @jax.jit
    def _whiten(self, y: Array) -> tuple[Array, Array]:
        """Whitened residual ``L^{-1}(y - mu)`` and the marginal log-prob.

        The two always travel together: the log-prob is the squared norm of
        the whitened residual plus the (cached) normalization constant,
        guarded so that a failed factorization reads as ``-inf``.
        """
        white = self.solver.solve_triangular(y - self.loc)
        lp = -0.5 * jnp.sum(jnp.square(white)) - self.solver.normalization()
        return white, jnp.where(jnp.isfinite(lp), lp, -jnp.inf)

    def _posterior_mean(
        self,
        kinv_r: Array,
        y: Array,
        X_test: Array | None,
        include_mean: bool,
        kernel: kernels.Kernel | None,
    ) -> Array:
        """The predictive mean ``K(X*, X) K^{-1}(y - mu) [+ mu(X*)]``.

        Three routes, cheapest first: at the training points with the
        training kernel, ``K kinv_r`` telescopes to ``(y - mu) - noise @
        kinv_r`` with no kernel evaluation at all; at the training points
        with a substitute kernel (e.g. one mixture component), one O(N)
        structured matmul; at fresh points, the rectangular cross matmul.
        """
        if X_test is None:
            if kernel is None:
                mu = y - (self.noise @ kinv_r)
                return mu if include_mean else mu - self.loc
            mu = kernel.matmul(self.X, y=kinv_r)
            return mu + self.loc if include_mean else mu
        mu = (self.kernel if kernel is None else kernel).matmul(
            X_test, self.X, kinv_r
        )
        if include_mean:
            mu = mu + jax.vmap(self.mean_function)(X_test)
        return mu

    @partial(jax.jit, static_argnames=("include_mean",))
    def _condition(
        self,
        y: Array,
        X_test: Array | None,
        include_mean: bool,
        kernel: kernels.Kernel | None = None,
    ) -> tuple[Array, Array, Array]:
        white, log_prob = self._whiten(y)
        # Second triangular solve: the whitened residual becomes K^{-1}(y - mu).
        kinv_r = self.solver.solve_triangular(white, transpose=True)
        mean = self._posterior_mean(kinv_r, y, X_test, include_mean, kernel)
        return kinv_r, log_prob, mean


class ConditionResult(NamedTuple):
    """The result of conditioning a :class:`GaussianProcess` on data."""

    log_probability: Array
    """The marginal log likelihood of the observed data."""

    gp: GaussianProcess
    """The conditional process evaluated at the test points."""


def _check_test_points(X: Array, X_test: Array) -> None:
    """Require ``X_test`` to be pointwise-compatible with the inputs ``X``:
    same pytree structure, same trailing (per-point) leaf shapes."""
    flat, struct = jax.tree_util.tree_flatten(X)
    flat_test, struct_test = jax.tree_util.tree_flatten(X_test)
    ok = struct == struct_test and all(
        jnp.shape(a)[1:] == jnp.shape(b)[1:] and jnp.ndim(a) == jnp.ndim(b)
        for a, b in zip(flat, flat_test)
    )
    if not ok:
        raise ValueError(
            "`X_test` must have the same tree structure as the input "
            "`X`, and all but the leading dimension must have "
            "matching sizes"
        )


def _default_diag(reference: Array) -> Array:
    """sqrt(eps) jitter for the active dtype — enough to stabilize most
    Cholesky factorizations without visibly perturbing the model."""
    return jnp.sqrt(jnp.finfo(jnp.result_type(reference)).eps)


def _as_mean_function(mean) -> means.MeanBase:
    """Coerce a constant / callable / MeanBase into a mean function."""
    if isinstance(mean, means.MeanBase):
        return mean
    return means.Mean(jnp.zeros(()) if mean is None else mean)


def _as_noise(noise, diag, reference: Array) -> Noise:
    """Coerce the (noise, diag) pair into a Noise model, defaulting to
    sqrt(eps) jitter matched to ``reference``'s length and dtype."""
    if noise is not None:
        return noise
    diag = _default_diag(reference) if diag is None else diag
    return Diagonal(diag=jnp.broadcast_to(diag, reference.shape))
