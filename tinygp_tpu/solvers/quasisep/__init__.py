r"""Quasiseparable linear algebra.

An order-``m`` (square) quasiseparable matrix is defined here, following
Eidelman & Gohberg (1999) with a symmetric-friendly relabeling, as::

    M[i, j] = d_i                                   if i == j
    M[i, j] = p_i^T (a_{i-1} ... a_{j+1}) q_j        if i > j
    M[i, j] = q_i^T (a_{i+1}^T ... a_{j-1}^T) p_j    if i < j  (transposed
                                                     convention for symmetry)

These matrices admit O(N) algorithms for products, solves, Cholesky
factorizations, and inverses — implemented in :mod:`.ops` through the scan
primitives of :mod:`.scan` with both sequential and associative-scan
(TPU-parallel) strategies.
"""

__all__ = ["QuasisepSolver"]

from tinygp_tpu.solvers.quasisep.solver import QuasisepSolver
