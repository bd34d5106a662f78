"""Float32-mode sanity pass, always on.

The suite defaults to x64 (set ``TINYGP_TPU_X64=0`` to run all of it in
f32), but f32 is the TPU production default — so this module always
exercises the critical paths at f32 in a subprocess (the x64 flag is
process-global in JAX) and asserts at the f32 tolerance policy
(``tinygp_tpu/test_utils.py``). Mirrors the reference CI's two-mode matrix
(``/root/reference/.github/workflows/tests.yml:14-34``) at smoke scale.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
assert not jax.config.read("jax_enable_x64")

import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess, kernels
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.ops.dense import blocked_cholesky

rng = np.random.default_rng(77)
X = jnp.asarray(np.sort(rng.uniform(0, 10, 128)), jnp.float32)
y = jnp.asarray(np.sin(np.asarray(X)) + 0.1 * rng.normal(size=128), jnp.float32)

# Dense vs O(N) agreement at the f32 tolerance.
gp_d = GaussianProcess(1.2 * kernels.Matern32(scale=1.4), X, diag=0.1)
gp_q = GaussianProcess(
    quasisep.Matern32(scale=1.4, sigma=np.sqrt(1.2)), X, diag=0.1
)
ll_d, ll_q = float(gp_d.log_probability(y)), float(gp_q.log_probability(y))
assert gp_d.dtype == jnp.float32 and gp_q.dtype == jnp.float32
assert abs(ll_d - ll_q) < 5e-4 * abs(ll_d), (ll_d, ll_q)

# Gradients stay finite and close across solvers in f32.
g_d = jax.grad(
    lambda s: GaussianProcess(
        kernels.Matern32(scale=s), X, diag=0.1
    ).log_probability(y)
)(jnp.float32(1.4))
g_q = jax.grad(
    lambda s: GaussianProcess(
        quasisep.Matern32(scale=s), X, diag=0.1
    ).log_probability(y)
)(jnp.float32(1.4))
assert np.isfinite(float(g_d)) and np.isfinite(float(g_q))
assert abs(float(g_d) - float(g_q)) < 5e-3 * max(1.0, abs(float(g_d)))

# Conditioning produces f32 outputs with finite variance.
_, cond = gp_q.condition(y, jnp.linspace(0.0, 10.0, 40, dtype=jnp.float32))
var = np.asarray(cond.variance)
assert var.dtype == np.float32 and np.all(np.isfinite(var)) and np.all(var > -1e-5)

# The split-precision blocked Cholesky path (f32-only) round-trips.
A = jnp.asarray(rng.normal(size=(512, 512)), jnp.float32) / 16.0
K = A @ A.T + jnp.eye(512)
L = blocked_cholesky(K, block=256, min_size=0)
err = float(jnp.max(jnp.abs(L @ L.T - K)))
assert err < 5e-4, err

print("f32-mode OK")
"""


def test_float32_critical_paths():
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["TINYGP_TPU_X64"] = "0"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "f32-mode OK" in out.stdout
