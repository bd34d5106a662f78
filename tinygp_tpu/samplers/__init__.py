"""Built-in inference algorithms over GP hyperparameters.

The reference deliberately ships no samplers (tinygp composes with external
PPLs); this subpackage provides the TPU-native equivalents promised by the
build's north star: vectorized NUTS/HMC, mean-field ADVI, and adaptive
tempered SMC — all written to ``vmap`` over chains/particles and to shard
over device meshes via :mod:`tinygp_tpu.parallel`.
"""

__all__ = [
    "hmc",
    "nuts",
    "run_mcmc",
    "window_adaptation",
    "find_initial_step_size",
    "potential_scale_reduction",
    "effective_sample_size",
    "summary",
    "fit_advi",
    "sample_advi",
    "run_smc",
    "HMCState",
    "HMCInfo",
    "WarmupInfo",
    "ADVIResult",
    "ADVIFullRankResult",
    "SMCResult",
]

from tinygp_tpu.samplers.hmc import (
    HMCInfo,
    HMCState,
    WarmupInfo,
    find_initial_step_size,
    hmc,
    nuts,
    run_mcmc,
    window_adaptation,
)
from tinygp_tpu.samplers.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
    summary,
)
from tinygp_tpu.samplers.smc import SMCResult, run_smc
from tinygp_tpu.samplers.vi import (
    ADVIFullRankResult,
    ADVIResult,
    fit_advi,
    sample_advi,
)
