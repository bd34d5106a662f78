"""The numpyro bridge (skipped when numpyro is absent).

Mirrors the reference's ecosystem role: a GP is a numpyro sample site
(``/root/reference/src/tinygp/numpyro_support.py``).
"""

import numpy as np
import pytest

numpyro = pytest.importorskip("numpyro")

import jax
import jax.numpy as jnp

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.numpyro_support import TinyDistribution
from tinygp_tpu.test_utils import assert_allclose


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


def test_sample_shape_and_site(gp_and_data):
    gp, y = gp_and_data
    d = TinyDistribution(gp)
    s = d.sample(jax.random.PRNGKey(0), (3,))
    assert s.shape == (3, 40)

    def model():
        numpyro.sample("obs", TinyDistribution(gp), obs=y)

    # Trace the model: the site must carry the GP log density.
    tr = numpyro.handlers.trace(numpyro.handlers.seed(model, 0)).get_trace()
    lp = float(tr["obs"]["fn"].log_prob(tr["obs"]["value"]))
    assert np.isfinite(lp)
