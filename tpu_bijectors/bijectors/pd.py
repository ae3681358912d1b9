"""Positive-definite matrix bijectors.

TPU-native counterpart of /root/reference/src/bijectors/pd.jl.

  PDBijector:    SPD X -> lower-triangular L = chol(X) with log-diagonal.
  PDVecBijector: PDBijector + pack the triangle (incl. diagonal) into a
                 length n(n+1)/2 vector, column-major over the transpose
                 (pd.jl:36-43), i.e. the same element order as the
                 reference's `triu_to_vec(transpose(pd_link(X)))`.

  logdetJ (pd.jl:23-27, 0-based i):
      -( sum_i (n+1-i) * log L_ii  +  n*log 2 )
"""

from __future__ import annotations

import math
from functools import partial as _partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tree import pytree_dataclass
from ..utils import (
    cholesky_lower,
    pd_from_lower,
    set_diag,
    tril_to_vec,
    triu_dim_from_length,
    vec_to_tril,
)
from .base import Bijector


def _pd_logdet_from_chol(L):
    """-(sum_i (n+1-i) log L_ii + n log 2), reference pd.jl:23-27."""
    n = L.shape[-1]
    coeff = jnp.asarray(np.arange(n + 1, 1, -1), dtype=L.dtype)  # n+1, n, ..., 2
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    z = jnp.sum(coeff * jnp.log(d), axis=-1)
    return -(z + n * math.log(2.0))


@pytree_dataclass
class PDBijector(Bijector):
    """SPD matrix -> lower triangular with log-diagonal (reference PDBijector)."""

    event_ndims_in = 2
    event_ndims_out = 2

    def forward_and_log_det(self, X):
        L = cholesky_lower(X)
        Y = set_diag(jnp.tril(L), jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
        return Y, _pd_logdet_from_chol(L)

    def forward(self, X):
        return self.forward_and_log_det(X)[0]

    def inverse(self, Y):
        L = set_diag(jnp.tril(Y), jnp.exp(jnp.diagonal(Y, axis1=-2, axis2=-1)))
        return pd_from_lower(L)

    def inverse_and_log_det(self, Y):
        L = set_diag(jnp.tril(Y), jnp.exp(jnp.diagonal(Y, axis1=-2, axis2=-1)))
        return pd_from_lower(L), -_pd_logdet_from_chol(L)


@pytree_dataclass
class PDVecBijector(Bijector):
    """SPD matrix -> packed vector of length n(n+1)/2 (reference PDVecBijector)."""

    event_ndims_in = 2
    event_ndims_out = 1

    def forward_event_shape(self, shape):
        n = shape[-1]
        return shape[:-2] + (n * (n + 1) // 2,)

    def inverse_event_shape(self, shape):
        n = triu_dim_from_length(shape[-1])
        return shape[:-1] + (n, n)

    def forward_and_log_det(self, X):
        L = cholesky_lower(X)
        Y = set_diag(jnp.tril(L), jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
        return tril_to_vec(Y), _pd_logdet_from_chol(L)

    def forward(self, X):
        return self.forward_and_log_det(X)[0]

    def inverse(self, y):
        Y = vec_to_tril(y)
        L = set_diag(Y, jnp.exp(jnp.diagonal(Y, axis1=-2, axis2=-1)))
        return pd_from_lower(L)

    def inverse_and_log_det(self, y):
        return self.inverse_and_log_det_with_factor(y)[:2]

    def inverse_and_log_det_with_factor(self, y):
        """(X, logJ, L): also exposes the lower Cholesky factor L of X —
        Wishart-family densities fuse on it (logdet X = 2 sum log L_ii,
        trace terms via triangular solves) instead of re-decomposing X."""
        if _pd_pallas_profitable(y):
            K = triu_dim_from_length(y.shape[-1])
            return _pd_inverse_all_pallas(y, K)
        return _pd_inverse_all_jnp(y)


def _pd_inverse_all_jnp(y):
    Y = vec_to_tril(y)
    L = set_diag(Y, jnp.exp(jnp.diagonal(Y, axis1=-2, axis2=-1)))
    return pd_from_lower(L), -_pd_logdet_from_chol(L), L


def _pd_pallas_profitable(y) -> bool:
    """Trace-time dispatch — same rules as the LKJ kernel (kernels/pd.py)."""
    try:
        from .. import kernels

        K = triu_dim_from_length(y.shape[-1])
        return kernels.profitable(
            "pd", batch=y.shape[0], k=K, ndim=y.ndim, dtype=y.dtype
        )
    except Exception:
        return False


@_partial(jax.custom_jvp, nondiff_argnums=(1,))
def _pd_inverse_all_pallas(y, K):
    """Pallas primal; derivatives route through the jnp path (identical math)."""
    from ..kernels.pd import pd_inverse_pallas

    return pd_inverse_pallas(y, K)


@_pd_inverse_all_pallas.defjvp
def _pd_inverse_all_pallas_jvp(K, primals, tangents):
    (y,) = primals
    (dy,) = tangents
    return jax.jvp(_pd_inverse_all_jnp, (y,), (dy,))


@pytree_dataclass
class CholeskyVecBijector(Bijector):
    """Pack/unpack a *lower* Cholesky factor's triangle (incl. diagonal, with
    log-diagonal) into a length n(n+1)/2 vector.

    Counterpart of the vectorize-layer PosDef link in the reference
    (src/vector/matrix/posdef.jl:27-51), exposed as a standalone bijector:
    factor L (lower, positive diagonal) <-> unconstrained vector.
    logdetJ = -sum_i log L_ii (only the diagonal log is non-volume-preserving).
    """

    event_ndims_in = 2
    event_ndims_out = 1

    def forward_event_shape(self, shape):
        n = shape[-1]
        return shape[:-2] + (n * (n + 1) // 2,)

    def inverse_event_shape(self, shape):
        n = triu_dim_from_length(shape[-1])
        return shape[:-1] + (n, n)

    def forward_and_log_det(self, L):
        d = jnp.diagonal(L, axis1=-2, axis2=-1)
        Y = set_diag(jnp.tril(L), jnp.log(d))
        return tril_to_vec(Y), -jnp.sum(jnp.log(d), axis=-1)

    def inverse_and_log_det(self, y):
        Y = vec_to_tril(y)
        d = jnp.diagonal(Y, axis1=-2, axis2=-1)
        L = set_diag(Y, jnp.exp(d))
        return L, jnp.sum(d, axis=-1)


@_partial(jax.custom_jvp, nondiff_argnums=(1, 3))
def _pd_logdensity_pallas_diffable(y, K, C, mode):
    """Fused (logJ, sum_ydiag, trace) Pallas primal (kernels/pd.py
    pd_logdensity_pallas); tangents via the jnp composition below."""
    from ..kernels.pd import pd_logdensity_pallas

    return pd_logdensity_pallas(y, K, C, mode)


def _pd_logdensity_jnp(y, C, mode):
    X, ld, L = _pd_inverse_all_jnp(y)
    sumd = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    C = jnp.asarray(C, y.dtype)
    if mode == "dot":
        tr = jnp.sum(C * X, axis=(-2, -1))
    else:
        Cb = jnp.broadcast_to(C, L.shape[:-2] + C.shape)
        A = jax.scipy.linalg.solve_triangular(L, Cb, lower=True)
        tr = jnp.sum(A * A, axis=(-2, -1))
    return ld, sumd, tr


@_pd_logdensity_pallas_diffable.defjvp
def _pd_logdensity_pallas_jvp(K, mode, primals, tangents):
    y, C = primals
    dy, dC = tangents
    return jax.jvp(lambda y, C: _pd_logdensity_jnp(y, C, mode), (y, C), (dy, dC))
