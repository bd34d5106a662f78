"""Multi-device parallelism: sharded chains and a sharded time axis.

No reference counterpart (the reference is strictly single-device —
SURVEY.md §2.4). Two orthogonal mesh axes are demonstrated on CPU virtual
devices (the same code runs unchanged on a TPU pod slice; set
``--xla_force_host_platform_device_count`` only off-TPU):

1. **Chain parallelism**: NUTS chains sharded over the mesh; the only
   cross-device traffic is the ``pmean`` of warmup adaptation statistics.
2. **Sequence parallelism**: ONE likelihood whose time axis is sharded —
   per-shard on-chip scans composed via an ``all_gather`` of O(m^2) shard
   summaries (communication independent of N).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.parallel.mesh import make_mesh
from tinygp_tpu.parallel.scan import sharded_loglik
from tinygp_tpu.parallel.sharded import run_mcmc_sharded

n_dev = len(jax.devices())
print(f"devices: {n_dev}")

rng = np.random.default_rng(0)

# CI knob: TINYGP_TPU_EXAMPLE_SCALE in (0, 1] shrinks the workload so the
# full example suite can execute on the single-core CPU test host; 1 (the
# default) is the full-size run whose printed numbers the docs quote.
_S = float(os.environ.get("TINYGP_TPU_EXAMPLE_SCALE", "1"))
N = 2048
t = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
y = jnp.asarray(np.sin(2 * np.asarray(t)) + 0.3 * rng.normal(size=N),
                jnp.float32)


def log_prob(params):
    kernel = jnp.exp(params["log_amp"]) * quasisep.Matern32(
        scale=jnp.exp(params["log_scale"])
    )
    gp = GaussianProcess(kernel, t, diag=0.09, assume_sorted=True)
    return gp.log_probability(y) - 0.5 * sum(
        jnp.sum(jnp.square(v)) for v in params.values()
    )


init = {"log_amp": jnp.zeros(()), "log_scale": jnp.zeros(())}

# --- 1. chains sharded over the mesh ---------------------------------------
mesh = make_mesh()
samples, info = run_mcmc_sharded(
    jax.random.PRNGKey(0),
    log_prob,
    init,
    mesh=mesh,
    num_chains=4 * n_dev,
    num_warmup=max(int(100 * _S), 20),
    num_samples=max(int(100 * _S), 20),
    max_tree_depth=6,
    jitter_init=0.1,
)
scale = float(jnp.mean(jnp.exp(samples["log_scale"])))
print(f"chain-parallel NUTS: scale={scale:.2f}, "
      f"accept={float(jnp.mean(info['accept_prob'])):.2f}")
assert np.isfinite(scale)

# --- 2. the time axis sharded over the mesh ---------------------------------
data_mesh = Mesh(np.asarray(jax.devices()), ("data",))
kernel = 1.0 * quasisep.Matern32(scale=0.5)
v_sharded = float(
    jax.jit(lambda: sharded_loglik(kernel, t, y, diag=0.09, mesh=data_mesh))()
)
v_single = float(
    GaussianProcess(kernel, t, diag=0.09, assume_sorted=True).log_probability(y)
)
print(f"sequence-parallel loglik: {v_sharded:.3f} vs single-device "
      f"{v_single:.3f}")
np.testing.assert_allclose(v_sharded, v_single, rtol=5e-4, atol=5e-3)
print("multichip sharding OK")
