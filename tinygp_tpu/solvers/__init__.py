"""Swappable linear-algebra backends for GP computations.

- :class:`DirectSolver`: exact dense Cholesky (any kernel); the O(N^2)/O(N^3)
  hot path lowers onto the MXU.
- :class:`QuasisepSolver`: O(N) solver for quasiseparable (celerite-style)
  kernels; associative-scan execution by default on TPU.
- :class:`KalmanSolver`: an O(N) likelihood-only oracle via Kalman filtering.
- :class:`LowRankSolver`: FITC/Nystrom inducing-point approximation for
  dense kernels at large N — O(N M^2), exact within the approximate prior.
"""

__all__ = [
    "DirectSolver",
    "QuasisepSolver",
    "KalmanSolver",
    "LowRankSolver",
]

from tinygp_tpu.solvers.direct import DirectSolver
from tinygp_tpu.solvers.kalman import KalmanSolver
from tinygp_tpu.solvers.lowrank import LowRankSolver
from tinygp_tpu.solvers.quasisep import QuasisepSolver
