"""SMC and ADVI wall-clock rates on the SHO GP posterior (config #4 data).

Completes the sampler throughput record (rooflines section 3 holds the
HMC/NUTS rows): adaptive tempered SMC in particles x stages x mutations
per second, and ADVI in ELBO-gradient steps per second, both on the same
1024-way-parallel SHO hyperparameter posterior the NUTS bench uses.

Usage: python benchmarks/smc_vi_rate.py   (writes smc_vi_rate.json)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tinygp_tpu import GaussianProcess
from tinygp_tpu.kernels import quasisep
from tinygp_tpu.samplers import fit_advi, run_smc

N = 512
PARTICLES = 1024


def main():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 10, N))
    yv = np.sin(3 * t) * np.exp(-0.1 * t) + 0.3 * rng.normal(size=N)
    X = jnp.asarray(t, jnp.float32)
    Y = jnp.asarray(yv, jnp.float32)

    def log_like(params):
        amp = jnp.exp(params["log_amp"])
        omega = jnp.exp(params["log_omega"])
        q = jnp.exp(params["log_q"])
        kernel = amp * quasisep.SHO(omega=omega, quality=q)
        gp = GaussianProcess(kernel, X, diag=0.09, assume_sorted=True)
        return gp.log_probability(Y)

    def log_prior(params):
        return -0.5 * sum(jnp.sum(jnp.square(v)) for v in params.values())

    def log_post(params):
        return log_like(params) + log_prior(params)

    init = {
        "log_amp": jnp.float32(0.0),
        "log_omega": jnp.float32(1.0),
        "log_q": jnp.float32(1.0),
    }
    out = {"device": str(jax.devices()[0]), "n": N, "particles": PARTICLES}

    # --- SMC ---------------------------------------------------------------
    key = jax.random.PRNGKey(0)
    parts = {
        k: v + jax.random.normal(jax.random.fold_in(key, i), (PARTICLES,))
        for i, (k, v) in enumerate(init.items())
    }

    def smc_run(seed):
        res = run_smc(
            jax.random.PRNGKey(seed), log_prior, log_like, parts,
            num_mutations=5,
        )
        jax.block_until_ready(res.particles)
        return res

    t0 = time.time(); res = smc_run(0); cold = time.time() - t0
    t0 = time.time(); res = smc_run(1); warm = time.time() - t0
    stages = int(res.num_stages)
    out["smc"] = {
        "cold_s": cold,
        "warm_s": warm,
        "stages": stages,
        "log_evidence": float(res.log_evidence),
        "particle_stage_mutations_per_s": PARTICLES * stages * 5 / warm,
    }
    print("smc", out["smc"], flush=True)

    # --- ADVI (mean-field and full-rank) ------------------------------------
    for full_rank in (False, True):
        def advi_run(seed):
            res = fit_advi(
                jax.random.PRNGKey(seed), log_post, init,
                num_steps=1000, full_rank=full_rank,
            )
            jax.block_until_ready(res.mean)
            return res

        t0 = time.time(); advi_run(0); cold = time.time() - t0
        t0 = time.time(); res = advi_run(1); warm = time.time() - t0
        name = "advi_fullrank" if full_rank else "advi_meanfield"
        out[name] = {
            "cold_s": cold,
            "warm_s": warm,
            "elbo_steps_per_s": 1000 / warm,
            "final_elbo": float(res.elbo_trace[-1]),
        }
        print(name, out[name], flush=True)

    path = os.path.join(os.path.dirname(__file__), "smc_vi_rate.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
