"""Isolate the per-step collective overhead of the sharded samplers.

The north-star scaling claim (>= 80% samples/s efficiency across hosts)
cannot be demonstrated by wall time on this host: every virtual device
shares one CPU core, so an 8-device run is ~8x slower regardless of the
sharding quality. What CAN be measured honestly is the *added cost of the
collectives*: run the identical sharded program twice — once with the real
cross-device reductions, once with them ablated (shard_map without the
reduction) — and difference the step times. The collective traffic is what
scaling efficiency loses on real ICI; everything else is embarrassingly
parallel.

Per-step collectives in the chain-parallel NUTS warmup: ONE scalar pmean
(the accept statistic) + one dim-sized pmean pair (position moments).
Per-stage collectives in sharded SMC: one all_gather of (weights,
particles).

Writes collective_overhead.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

CHAINS = 64
DIM = 4
STEPS = 30


def main():
    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("chains",))

    from tinygp_tpu.samplers.hmc import hmc

    def log_prob(z):
        return -0.5 * jnp.sum(jnp.square(z))

    init_fn, step_fn = hmc(log_prob, num_leapfrog=8)

    def body(states, keys, step_size, inv_mass, reduce_collective):
        """One warmup-shaped step: transition + cross-device accept pmean."""
        states, infos = jax.vmap(
            lambda k, s: step_fn(k, s, step_size, inv_mass)
        )(keys, states)
        acc = jnp.mean(infos.accept_prob)
        if reduce_collective:
            acc = jax.lax.pmean(acc, "chains")
            mom = jax.lax.pmean(jnp.mean(states.z, axis=0), "chains")
        else:
            mom = jnp.mean(states.z, axis=0)
        return states, acc, mom

    def program(reduce_collective):
        def device_fn(z_local, keys_local):
            states = jax.vmap(init_fn)(z_local)

            def scan_body(carry, step):
                states, acc_sum = carry
                keys = jax.vmap(
                    lambda k: jax.random.fold_in(k, step)
                )(keys_local)
                states, acc, mom = body(
                    states, keys, 0.25, jnp.ones(DIM), reduce_collective
                )
                return (states, acc_sum + acc + jnp.sum(mom)), None

            (states, acc_sum), _ = jax.lax.scan(
                scan_body,
                (states, jnp.zeros(())),
                jnp.arange(STEPS),
            )
            return acc_sum + jnp.sum(states.z) * 1e-12

        return jax.jit(
            shard_map(
                device_fn,
                mesh=mesh,
                in_specs=(P("chains"), P("chains")),
                out_specs=P(),
                check_vma=False,
            )
        )

    z0 = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (CHAINS, DIM)),
        NamedSharding(mesh, P("chains")),
    )
    keys = jax.device_put(
        jax.random.split(jax.random.PRNGKey(1), CHAINS),
        NamedSharding(mesh, P("chains")),
    )

    def timed(fn):
        float(fn(z0, keys))  # compile
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(z0, keys))
            best = min(best, time.perf_counter() - t0)
        return best

    t_real = timed(program(True))
    t_ablated = timed(program(False))
    overhead_per_step = max(t_real - t_ablated, 0.0) / STEPS
    frac = overhead_per_step * STEPS / t_real

    out = {
        "devices": len(devices),
        "chains": CHAINS,
        "steps": STEPS,
        "t_real_s": t_real,
        "t_ablated_s": t_ablated,
        "collective_overhead_per_step_s": overhead_per_step,
        "collective_fraction_of_step": frac,
        "note": (
            "8 virtual CPU devices on one core: compute is serialized, so "
            "the real-minus-ablated difference isolates the collective + "
            "synchronization cost that real multi-chip scaling would pay "
            "per warmup step (one scalar pmean + one dim-sized pmean). "
            "Scaling efficiency on hardware ~ 1 - this fraction."
        ),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "collective_overhead.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
