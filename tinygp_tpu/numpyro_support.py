"""numpyro interoperability (optional dependency).

API parity: ``/root/reference/src/tinygp/numpyro_support.py`` — wraps a
:class:`tinygp_tpu.GaussianProcess` as a numpyro ``Distribution`` so a GP
can be a sample site inside a numpyro model. Import-guarded: this module
only imports if numpyro is installed.
"""

from __future__ import annotations

__all__ = ["TinyDistribution"]

from typing import TYPE_CHECKING

import jax

try:
    import numpyro.distributions as dist
    from numpyro.distributions import constraints
except ImportError as exc:  # pragma: no cover - depends on environment
    raise ImportError(
        "tinygp_tpu.numpyro_support requires numpyro to be installed"
    ) from exc

if TYPE_CHECKING:
    from tinygp_tpu.gp import GaussianProcess


class TinyDistribution(dist.Distribution):
    """A numpyro distribution backed by a GaussianProcess."""

    support = constraints.real_vector

    def __init__(self, gp: GaussianProcess, *, validate_args=None):
        self.gp = gp
        super().__init__(
            batch_shape=(),
            event_shape=(gp.num_data,),
            validate_args=validate_args,
        )

    def sample(self, key: jax.Array, sample_shape=()):
        return self.gp.sample(key, shape=sample_shape)

    def log_prob(self, value):
        return self.gp.log_probability(value)

    @property
    def mean(self):
        return self.gp.loc

    @property
    def variance(self):
        return self.gp.variance

    @dist.util.lazy_property
    def covariance_matrix(self):
        return self.gp.covariance

    @dist.util.lazy_property
    def precision_matrix(self):
        import jax.numpy as jnp

        identity = jnp.broadcast_to(
            jnp.eye(self.gp.num_data, dtype=self.gp.dtype),
            self.covariance_matrix.shape,
        )
        return jax.scipy.linalg.cho_solve(
            (self.gp.solver.scale_tril, True), identity
        )
