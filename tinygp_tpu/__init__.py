"""tinygp-tpu: a TPU-native Gaussian process inference engine.

Built from scratch in JAX/XLA/Pallas with the capability surface of
`tinygp <https://github.com/dfm/tinygp>`_ — a composable kernel DSL, an exact
dense solver, and a celerite-style O(N) quasiseparable solver — plus built-in
vectorized NUTS/HMC, VI, and SMC samplers designed to shard over TPU meshes.
"""

__version__ = "0.1.0"

from tinygp_tpu import (
    kernels as kernels,
    means as means,
    noise as noise,
    solvers as solvers,
    transforms as transforms,
)
from tinygp_tpu.fit import (
    FitResult as FitResult,
    fit_map as fit_map,
)
from tinygp_tpu.gp import (
    ConditionResult as ConditionResult,
    GaussianProcess as GaussianProcess,
)
