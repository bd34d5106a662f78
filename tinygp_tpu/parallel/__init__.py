"""Multi-device / multi-host parallelism.

Chains and particles shard over a :class:`jax.sharding.Mesh`; all
communication is XLA collectives (``psum``/``pmean``/``all_gather``)
emitted by ``shard_map``. For multi-host pods, call
:func:`tinygp_tpu.parallel.mesh.initialize_distributed` first and build
the mesh over ``jax.devices()`` as usual — the same code paths scale from
one chip to a pod slice (smoke-tested on a two-process local cluster).
"""

__all__ = [
    "make_mesh",
    "chain_axis",
    "data_axis",
    "local_chunk",
    "initialize_distributed",
    "run_mcmc_sharded",
    "run_smc_sharded",
    "cholesky_tp",
]

from tinygp_tpu.parallel.dense import cholesky_tp
from tinygp_tpu.parallel.mesh import (
    chain_axis,
    data_axis,
    initialize_distributed,
    local_chunk,
    make_mesh,
)
from tinygp_tpu.parallel.sharded import run_mcmc_sharded, run_smc_sharded
