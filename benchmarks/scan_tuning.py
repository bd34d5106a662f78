"""Sweep the blocked-scan knobs (_BLOCK, _UNROLL) on the real TPU.

The monoid scan's phase-1 runs _BLOCK sequential steps (unrolled by
_UNROLL) with N/_BLOCK lanes each; bigger blocks cut per-step dispatch
latency share but narrow the lane batch. This sweep grounds the choice.

Run from /root/repo: python benchmarks/scan_tuning.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import device_seconds_per_eval  # noqa: E402

import tinygp_tpu.solvers.quasisep.scan as scan_mod  # noqa: E402
from tinygp_tpu import GaussianProcess  # noqa: E402
from tinygp_tpu.kernels import quasisep  # noqa: E402

N = 1_000_000


def main():
    rng = np.random.default_rng(42)
    X = jnp.asarray(np.sort(rng.uniform(0, 10, N)), jnp.float32)
    y = jnp.asarray(rng.normal(size=N), jnp.float32)

    def loglik(params, X, y):
        kernel = params["amp"] * quasisep.Matern32(scale=params["scale"])
        gp = GaussianProcess(kernel, X, diag=0.1, assume_sorted=True)
        return gp.log_probability(y)

    params = {"amp": jnp.float32(1.5), "scale": jnp.float32(2.5)}
    out = {}
    for block, unroll in [(64, 8), (128, 8), (128, 16), (256, 16), (512, 32)]:
        scan_mod._BLOCK = block
        scan_mod._UNROLL = unroll
        t = device_seconds_per_eval(loglik, params, X, y, iters=20)
        out[f"block{block}_unroll{unroll}"] = t
        print(f"block={block} unroll={unroll}: {t * 1e3:.3f} ms", flush=True)

    print(json.dumps(out, indent=2))
    with open("benchmarks/scan_tuning.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
