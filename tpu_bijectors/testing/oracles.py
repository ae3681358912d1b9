"""Hand-derived Jacobian oracles ported from the reference.

The reference ships dense simplex Jacobians used both as ReverseDiff
adjoints and as test oracles (src/bijectors/simplex.jl:217-352; the
`J_link @ J_invlink = I` golden test is test/legacy_interface.jl:299-312).
Here they serve the oracle role only — JAX AD differentiates the actual
kernels — so they are plain float64 numpy, loop-form on purpose (independent
of the vectorized implementations they check).
"""

from __future__ import annotations

import numpy as np

_EPS = np.finfo(np.float64).eps


def _logistic(v):
    return 1.0 / (1.0 + np.exp(-v))


def simplex_link_jacobian(x: np.ndarray) -> np.ndarray:
    """d y / d x of the stick-breaking link, shape (K-1, K)
    (reference simplex_link_jacobian, simplex.jl:217-239)."""
    x = np.asarray(x, np.float64)
    K = x.shape[0]
    assert K > 1
    J = np.zeros((K, K - 1))
    eps = _EPS
    z = x[0] * (1 - 2 * eps) + eps
    J[0, 0] = (1 / z + 1 / (1 - z)) * (1 - 2 * eps)
    sum_tmp = 0.0
    for k in range(1, K - 1):
        sum_tmp += x[k - 1]
        z = (x[k] + eps) * (1 - 2 * eps) / ((1 + eps) - sum_tmp)
        J[k, k] = (1 / z + 1 / (1 - z)) * (1 - 2 * eps) / ((1 + eps) - sum_tmp)
        for i in range(k):
            J[i, k] = (
                (1 / z + 1 / (1 - z))
                * (x[k] + eps)
                * (1 - 2 * eps)
                / ((1 + eps) - sum_tmp) ** 2
            )
    return J.T  # (K-1, K): row = y index, column = x index


def simplex_invlink_jacobian(y: np.ndarray) -> np.ndarray:
    """d x / d y of the stick-breaking inverse, shape (K, K-1), with the
    clamp gating of the reference (simplex_invlink_jacobian,
    simplex.jl:311-352)."""
    y = np.asarray(y, np.float64)
    K = y.shape[0] + 1
    J = np.zeros((K, K - 1))
    eps = _EPS
    z = _logistic(y[0] - np.log(K - 1.0))
    unclamped = (z - eps) / (1 - 2 * eps)
    clamped = min(max(unclamped, 0.0), 1.0)
    if unclamped == clamped:
        J[0, 0] = z * (1 - z) / (1 - 2 * eps)
    sum_tmp = 0.0
    for k in range(1, K - 1):
        z = _logistic(y[k] - np.log(K - 1.0 - k))
        sum_tmp += clamped
        unclamped = ((1 + eps) - sum_tmp) / (1 - 2 * eps) * z - eps
        clamped = min(max(unclamped, 0.0), 1.0)
        if unclamped == clamped:
            J[k, k] = z * (1 - z) * ((1 + eps) - sum_tmp) / (1 - 2 * eps)
            for i in range(k):
                for j in range(i, k):
                    J[k, i] += -J[j, i] * z / (1 - 2 * eps)
    sum_tmp += clamped
    unclamped = 1.0 - sum_tmp
    clamped = min(max(unclamped, 0.0), 1.0)
    if unclamped == clamped:
        for i in range(K - 1):
            for j in range(i, K - 1):
                J[K - 1, i] += -J[j, i]
    return J
