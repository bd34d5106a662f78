"""Multi-device / multi-host parallelism.

Chains and particles shard over a :class:`jax.sharding.Mesh`; all
communication is XLA collectives (``psum``/``pmean``/``all_gather``)
emitted by ``shard_map``. For multi-host pods, call
``jax.distributed.initialize()`` first and build the mesh over
``jax.devices()`` as usual — the same code paths scale from one chip to a
pod slice.
"""

__all__ = [
    "make_mesh",
    "chain_axis",
    "local_chunk",
    "run_mcmc_sharded",
    "run_smc_sharded",
]

from tinygp_tpu.parallel.mesh import chain_axis, local_chunk, make_mesh
from tinygp_tpu.parallel.sharded import run_mcmc_sharded, run_smc_sharded
