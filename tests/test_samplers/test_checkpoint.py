"""Chunked dispatch + checkpoint/resume for the MCMC driver.

The chunked path must be bit-identical to the single-program path (per-step
RNG streams are derived from step indices), and a run interrupted at any
dispatch boundary must resume from its checkpoint to the same result.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinygp_tpu.samplers.hmc import run_mcmc
from tinygp_tpu.utils.checkpoint import load_pytree, save_pytree


def _target(params):
    return -0.5 * jnp.sum(jnp.square(params["x"] - 1.5)) - 0.5 * jnp.sum(
        jnp.square(params["y"] + 0.5) / 0.25
    )


INIT = {"x": jnp.zeros(2), "y": jnp.zeros(3)}
# The chunk/checkpoint driver is sampler-agnostic; HMC with a short
# trajectory compiles an order of magnitude faster than NUTS on the
# single-core CPU CI, and this file is about the driver, not the kernel.
KW = dict(
    num_chains=4,
    num_warmup=27,
    num_samples=18,
    sampler="hmc",
    num_leapfrog=4,
    initial_step_size=0.5,
)


def test_chunked_matches_single_dispatch():
    key = jax.random.PRNGKey(0)
    s_one, i_one = run_mcmc(key, _target, INIT, steps_per_dispatch=None, **KW)
    s_chk, i_chk = run_mcmc(key, _target, INIT, steps_per_dispatch=7, **KW)
    for k in s_one:
        np.testing.assert_array_equal(np.asarray(s_one[k]), np.asarray(s_chk[k]))
    np.testing.assert_array_equal(
        np.asarray(i_one.accept_prob), np.asarray(i_chk.accept_prob)
    )


def test_checkpoint_resume(tmp_path):
    key = jax.random.PRNGKey(1)
    path = str(tmp_path / "mcmc.npz")

    # Full uninterrupted run.
    s_full, _ = run_mcmc(key, _target, INIT, steps_per_dispatch=9, **KW)

    # Interrupted run: monkey-patch save to raise partway through sampling.
    calls = {"n": 0}
    import tinygp_tpu.samplers.hmc as hmc_mod

    real_save = save_pytree

    def exploding_save(p, tree):
        real_save(p, tree)
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated preemption")

    import tinygp_tpu.utils.checkpoint as ck_mod

    orig = ck_mod.save_pytree
    ck_mod.save_pytree = exploding_save
    try:
        with pytest.raises(RuntimeError, match="preemption"):
            run_mcmc(
                key,
                _target,
                INIT,
                steps_per_dispatch=9,
                checkpoint_path=path,
                **KW,
            )
    finally:
        ck_mod.save_pytree = orig

    # Resume from the checkpoint: must reproduce the uninterrupted result.
    s_res, _ = run_mcmc(
        key, _target, INIT, steps_per_dispatch=9, checkpoint_path=path, **KW
    )
    for k in s_full:
        np.testing.assert_array_equal(np.asarray(s_full[k]), np.asarray(s_res[k]))


def test_pytree_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "b": (np.int32(3), jnp.ones(4, bool)),
    }
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    back = load_pytree(path, jax.tree_util.tree_map(jnp.zeros_like, tree))
    for l1, l2 in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_load_shape_mismatch(tmp_path):
    path = str(tmp_path / "t.npz")
    save_pytree(path, {"a": jnp.ones(3)})
    with pytest.raises(ValueError, match="shape"):
        load_pytree(path, {"a": jnp.ones(4)})
