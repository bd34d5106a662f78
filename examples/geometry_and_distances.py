"""Custom distance metrics and 2-D geometry.

Capability parity with ``/root/reference/docs/tutorials/geometry.ipynb``:
stationary kernels are parameterized by a pluggable ``Distance``; L1/L2
ship built-in and a custom metric is a tiny subclass (here great-circle
distance on the sphere).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.kernels.distance import Distance, L1Distance, L2Distance

rng = np.random.default_rng(12)
N = 80
X = jnp.asarray(rng.normal(size=(N, 2)))
y = jnp.asarray(rng.normal(size=N))

# Built-in metrics. Note the pairing: the exponential kernel stays
# positive-definite under L1 in any dimension (it factorizes), while
# Matern kernels need the Euclidean metric beyond 1-D.
for kern in (
    kernels.Exp(scale=1.0, distance=L1Distance()),
    kernels.Matern32(scale=1.0, distance=L2Distance()),
):
    gp = GaussianProcess(kern, X, diag=0.1)
    assert np.isfinite(float(gp.log_probability(y)))


class GreatCircle(Distance):
    """Distance on the unit sphere; inputs are (lon, lat) in radians."""

    def distance(self, X1, X2):
        lon1, lat1 = X1
        lon2, lat2 = X2
        dlon = lon2 - lon1
        dlat = lat2 - lat1
        a = (
            jnp.sin(dlat / 2) ** 2
            + jnp.cos(lat1) * jnp.cos(lat2) * jnp.sin(dlon / 2) ** 2
        )
        # Guarded sqrt keeps the gradient finite at zero separation.
        a = jnp.clip(a, 1e-12, 1.0)
        return 2 * jnp.arcsin(jnp.sqrt(a))


lonlat = jnp.asarray(
    np.stack([rng.uniform(-np.pi, np.pi, N), rng.uniform(-1.2, 1.2, N)], 1)
)
sphere_gp = GaussianProcess(
    kernels.ExpSquared(scale=0.5, distance=GreatCircle()), lonlat, diag=0.1
)
ll = float(sphere_gp.log_probability(y))
assert np.isfinite(ll)

# Identical points must give zero distance and maximal covariance.
k = kernels.ExpSquared(scale=0.5, distance=GreatCircle())
v_same = float(k.evaluate(lonlat[0], lonlat[0]))
v_diff = float(k.evaluate(lonlat[0], lonlat[1]))
assert v_same > v_diff
print("geometry OK")
