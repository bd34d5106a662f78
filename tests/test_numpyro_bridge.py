"""The numpyro bridge contract, asserting in ANY environment.

``tinygp_tpu.numpyro_support.TinyDistribution`` touches a small, stable
slice of numpyro: the ``Distribution`` base constructor,
``constraints.real_vector``, and ``dist.util.lazy_property``. When numpyro
is installed the real package is used; otherwise a faithful stub of that
slice is injected so the bridge's own logic (log_prob delegation, sample
shapes, lazy covariance/precision) is exercised everywhere — the
"fake backend" pattern, with the dense numpy oracle as ground truth.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.test_utils import assert_allclose

try:
    import numpyro

    HAVE_NUMPYRO = True
except ImportError:
    HAVE_NUMPYRO = False


def _install_numpyro_stub():
    """A minimal stand-in for the numpyro surface the bridge imports."""

    class Distribution:
        def __init__(self, batch_shape=(), event_shape=(), validate_args=None):
            self.batch_shape = batch_shape
            self.event_shape = event_shape

    constraints = types.SimpleNamespace(real_vector="real_vector")

    class lazy_property:
        def __init__(self, fget):
            self.fget = fget
            self.name = fget.__name__

        def __get__(self, obj, objtype=None):
            if obj is None:
                return self
            value = self.fget(obj)
            obj.__dict__[self.name] = value
            return value

    numpyro_mod = types.ModuleType("numpyro")
    dist_mod = types.ModuleType("numpyro.distributions")
    util_mod = types.ModuleType("numpyro.distributions.util")
    dist_mod.Distribution = Distribution
    dist_mod.constraints = constraints
    util_mod.lazy_property = lazy_property
    dist_mod.util = util_mod
    numpyro_mod.distributions = dist_mod
    sys.modules["numpyro"] = numpyro_mod
    sys.modules["numpyro.distributions"] = dist_mod
    sys.modules["numpyro.distributions.util"] = util_mod


if not HAVE_NUMPYRO:
    _install_numpyro_stub()

from tinygp_tpu.numpyro_support import TinyDistribution  # noqa: E402


@pytest.fixture
def gp_and_data():
    rng = np.random.default_rng(0)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, 40)))
    y = jnp.asarray(np.sin(np.asarray(X)) + 0.1 * rng.normal(size=40))
    gp = GaussianProcess(1.2 * kernels.Matern32(scale=1.5), X, diag=0.1)
    return gp, y


def test_log_prob_matches_gp(gp_and_data):
    gp, y = gp_and_data
    d = TinyDistribution(gp)
    assert_allclose(d.log_prob(y), gp.log_probability(y))
    assert d.event_shape == (40,)


def test_sample_shapes(gp_and_data):
    gp, _ = gp_and_data
    d = TinyDistribution(gp)
    assert d.sample(jax.random.PRNGKey(0), (3,)).shape == (3, 40)
    assert d.sample(jax.random.PRNGKey(0)).shape == (40,)


def test_moments_and_precision(gp_and_data):
    gp, _ = gp_and_data
    d = TinyDistribution(gp)
    assert_allclose(np.asarray(d.mean), np.asarray(gp.loc))
    assert_allclose(np.asarray(d.variance), np.asarray(gp.variance))
    # Lazy covariance/precision must be mutual inverses.
    P = np.asarray(d.precision_matrix)
    C = np.asarray(d.covariance_matrix)
    atol = 1e-6 if P.dtype == np.float64 else 2e-4
    np.testing.assert_allclose(P @ C, np.eye(40), atol=atol)


@pytest.mark.skipif(not HAVE_NUMPYRO, reason="requires real numpyro")
def test_model_site_with_real_numpyro(gp_and_data):
    gp, y = gp_and_data

    def model():
        numpyro.sample("obs", TinyDistribution(gp), obs=y)

    tr = numpyro.handlers.trace(numpyro.handlers.seed(model, 0)).get_trace()
    lp = float(tr["obs"]["fn"].log_prob(tr["obs"]["value"]))
    assert np.isfinite(lp)
