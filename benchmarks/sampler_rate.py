"""Sampling-phase samples/s for HMC and NUTS vs the leapfrog ceiling.

Times K=10 transitions per chained-in-jit program on the 1024-chain SHO
GP posterior (N=512) at a fixed, well-tuned step size — isolating the
transition kernels from warmup and host dispatch. The HMC number divided
into (chains / (num_leapfrog x batched-gradient-time)) is the
speed-of-light check; NUTS pays the vmap straggler tax on top
(docs/rooflines.md §3).

Run from /root/repo: python benchmarks/sampler_rate.py
"""

import json
import sys

sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from bench import device_seconds_per_eval
from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.samplers.hmc import hmc, nuts, _ravel_spec

rng = np.random.default_rng(0)
N, B = 512, 1024
t = np.sort(rng.uniform(0, 10, N))
yv = np.sin(3 * t) * np.exp(-0.1 * t) + 0.3 * rng.normal(size=N)
X, Y = jnp.asarray(t, jnp.float32), jnp.asarray(yv, jnp.float32)

def log_prob_p(p):
    kernel = jnp.exp(p["log_amp"]) * quasisep.SHO(
        omega=jnp.exp(p["log_omega"]), quality=jnp.exp(p["log_q"]))
    gp = GaussianProcess(kernel, X, diag=jnp.exp(p["log_jitter"]) + 0.09,
                         assume_sorted=True)
    return gp.log_probability(Y) - 0.5 * sum(
        jnp.sum(jnp.square(v)) for v in p.values())

init = {"log_amp": jnp.float32(0.0), "log_omega": jnp.float32(1.0),
        "log_q": jnp.float32(1.0), "log_jitter": jnp.float32(-2.0)}
ravel, unravel, dim = _ravel_spec(init)
flat_lp = lambda z: log_prob_p(unravel(z))

out = {}
for name, build, kw in [
    ("hmc32", hmc, dict(num_leapfrog=32)),
    ("nuts6", nuts, dict(max_tree_depth=6)),
]:
    init_fn, step_fn = build(flat_lp, **kw)
    z0 = ravel(init)[None, :] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (B, dim), jnp.float32)
    states0 = jax.vmap(init_fn)(z0)

    K = 10  # transitions per timed eval

    def run_chunk(params, states_z):
        # params perturbs step size via the chain trick
        step_size = jnp.float32(0.05) * params["s"]
        inv_mass = jnp.ones(dim, jnp.float32)
        states = jax.vmap(init_fn)(states_z)
        def body(i, carry):
            states = carry
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), i), B)
            states, _ = jax.vmap(
                lambda k, s: step_fn(k, s, step_size, inv_mass))(keys, states)
            return states
        states = jax.lax.fori_loop(0, K, body, states)
        return jnp.sum(states.z)

    tsec = device_seconds_per_eval(
        run_chunk, {"s": jnp.float32(1.0)}, z0, iters=4)
    rate = B * K / tsec
    out[name] = {"s_per_chunk": tsec, "samples_per_s": rate}
    print(name, f"{rate:.0f} samples/s", flush=True)

print(json.dumps(out))
with open("benchmarks/sampler_rate.json", "w") as f:
    json.dump(out, f, indent=2)
