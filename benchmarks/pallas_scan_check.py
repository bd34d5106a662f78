"""Parity + timing check for the single-pass Pallas monoid scan.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/pallas_scan_check.py --interpret
  python benchmarks/pallas_scan_check.py            # real TPU
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--timing", action="store_true")
    args = p.parse_args()

    import jax

    if args.interpret:
        # The axon TPU plugin ignores JAX_PLATFORMS; force CPU through the
        # config knob before any computation triggers backend init.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tinygp_tpu.solvers.quasisep import pallas_scan, scan

    if args.interpret:
        pallas_scan.INTERPRET = True

    rng = np.random.default_rng(0)
    n = args.n
    m = 2

    # Affine-style monoid on stacked (m*m, N) + (m, N) leaves:
    # (A, b) with compose (A_l @ A_e, A_l b_e + b_l) in stacked layout.
    A = jnp.asarray(
        rng.normal(size=(m * m, n)) * 0.3
        + np.eye(m).reshape(m * m, 1) * 0.7,
        jnp.float32,
    )
    b = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)

    def combine(earlier, later):
        A_e, b_e = earlier
        A_l, b_l = later
        return (
            scan._smm(A_l, A_e, m, m, m),
            scan._smv(A_l, b_e, m, m) + b_l,
        )

    identity = (
        jnp.asarray(np.eye(m).reshape(m * m, 1), jnp.float32),
        jnp.zeros((m, 1), jnp.float32),
    )

    for reverse in (False, True):
        ref = scan.monoid_scan(
            combine, identity, (A, b), reverse=reverse, pallas_ok=False
        )
        got = pallas_scan.pallas_monoid_scan(
            combine, identity, (A, b), reverse=reverse
        )
        for r, g, name in zip(ref, got, ("A", "b")):
            err = float(
                jnp.max(jnp.abs(r - g))
                / (1.0 + jnp.max(jnp.abs(r)))
            )
            print(f"reverse={reverse} leaf={name} rel-err={err:.3e}")
            assert err < 1e-4, (reverse, name, err)
    print("PARITY OK")

    if args.timing:
        from bench import device_seconds_per_eval

        def run_pallas(ab):
            out = pallas_scan.pallas_monoid_scan(
                combine, identity, ab, reverse=False
            )
            return jnp.sum(out[1][:, -1]) + jnp.sum(out[0][:, -1])

        def run_xla(ab):
            out = scan.monoid_scan(
                combine, identity, ab, reverse=False, pallas_ok=False
            )
            return jnp.sum(out[1][:, -1]) + jnp.sum(out[0][:, -1])

        for name, fn in (("pallas", run_pallas), ("xla", run_xla)):
            t = device_seconds_per_eval(fn, (A, b))
            print(f"{name}: {t * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
