"""Numeric utilities (layer L0).

TPU-native counterparts of /root/reference/src/utils.jl and the helpers in
/root/reference/src/Bijectors.jl:88-126: clamping with the reference's epsilon
semantics, triangular pack/unpack (column-major, matching the reference's
``triu_to_vec``/``vec_to_triu(1)`` at src/utils.jl:67-155), Cholesky wrappers,
and numerically-stable special functions.

All pack/unpack index sets are computed with **numpy at trace time** so the
jitted program contains only static gathers/scatters (XLA fuses them into the
surrounding computation; no dynamic shapes anywhere).
"""

from __future__ import annotations

import math
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Mirror of the DEBUG_BIJECTORS env flag (/root/reference/src/Bijectors.jl:88).
DEBUG = os.environ.get("DEBUG_TPU_BIJECTORS", "0") not in ("0", "", "false")


def _eps(dtype) -> float:
    """Machine epsilon for a dtype (reference: `_eps`, src/Bijectors.jl:91-93)."""
    return float(jnp.finfo(jnp.dtype(dtype)).eps)


def clamp(x, lo, hi):
    """Clamp to [lo, hi] (reference `_clamp`, src/Bijectors.jl:95-100).

    Branch-free on TPU. NaNs propagate (jnp.clip keeps NaN).
    """
    return jnp.clip(x, lo, hi)


# ---------------------------------------------------------------------------
# Stable special functions
# ---------------------------------------------------------------------------


def logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def logistic(x):
    return jax.nn.sigmoid(x)


def log1pexp(x):
    return jax.nn.softplus(x)


def logcosh(x):
    """log(cosh(x)) computed stably: |x| + log1p(exp(-2|x|)) - log 2."""
    a = jnp.abs(x)
    return a + jax.nn.softplus(-2.0 * a) - math.log(2.0)


def softplus_inv(y):
    """Inverse of softplus: log(expm1(y)) = y + log1p(-exp(-y))."""
    return y + jnp.log(-jnp.expm1(-y))


# ---------------------------------------------------------------------------
# Triangular packing (column-major upper-triangle order, matching the
# reference's update_triu_from_vec loop order: src/utils.jl:77-85)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _triu_index_arrays(n: int, k: int):
    rows, cols = [], []
    for j in range(n):
        for i in range(0, min(j + 1 - k, n)):
            rows.append(i)
            cols.append(j)
    return np.asarray(rows, dtype=np.int32), np.asarray(cols, dtype=np.int32)


def triu_len(n: int, k: int = 0) -> int:
    """Number of packed entries of the upper triangle with offset k."""
    m = n - k
    return m * (m + 1) // 2


def triu_dim_from_length(d: int) -> int:
    """n such that n(n+1)/2 == d (reference `_triu_dim_from_length`, src/utils.jl:135)."""
    n = (-1 + math.isqrt(1 + 8 * d)) // 2
    if n * (n + 1) // 2 != d:
        raise ValueError(f"{d} is not a triangular number")
    return n


def triu1_dim_from_length(d: int) -> int:
    """n such that n(n-1)/2 == d (reference `_triu1_dim_from_length`, src/utils.jl:99)."""
    n = (1 + math.isqrt(1 + 8 * d)) // 2
    if n * (n - 1) // 2 != d:
        raise ValueError(f"{d} is not of the form n(n-1)/2")
    return n


def triu_to_vec(X, k: int = 0):
    """Pack the upper triangle (offset k) of trailing (n, n) dims, column-major.

    Matches reference ``_triu_to_vec`` order (src/utils.jl:67-87). Supports
    arbitrary leading batch dims.
    """
    n = X.shape[-1]
    rows, cols = _triu_index_arrays(n, k)
    return X[..., rows, cols]


def vec_to_triu(v, k: int = 0, n: int | None = None):
    """Unpack a column-major packed vector into an upper-triangular matrix.

    Inverse of :func:`triu_to_vec`; zeros elsewhere (src/utils.jl:89-94).
    """
    d = v.shape[-1]
    if n is None:
        n = triu_dim_from_length(d) if k == 0 else triu1_dim_from_length(d)
    rows, cols = _triu_index_arrays(n, k)
    out_shape = v.shape[:-1] + (n, n)
    X = jnp.zeros(out_shape, dtype=v.dtype)
    return X.at[..., rows, cols].set(v)


def tril_to_vec(X, k: int = 0):
    """Pack lower triangle; defined as triu packing of the transpose so the
    element order matches the reference's `pd_vec_link` (src/bijectors/pd.jl:38)."""
    return triu_to_vec(jnp.swapaxes(X, -1, -2), k=k)


def vec_to_tril(v, k: int = 0, n: int | None = None):
    return jnp.swapaxes(vec_to_triu(v, k=k, n=n), -1, -2)


# ---------------------------------------------------------------------------
# Triangular masks / PD helpers
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _np_triu_mask(n: int, k: int):
    return np.triu(np.ones((n, n), dtype=bool), k=k)


def triu_mask(n: int, k: int = 0):
    """Boolean mask of the upper triangle (reference `triu_mask`, src/utils.jl:58-65)."""
    return jnp.asarray(_np_triu_mask(n, k))


def tril_mask(n: int, k: int = 0):
    return jnp.asarray(_np_triu_mask(n, -k).T)


def lower_triangular(A):
    return jnp.tril(A)


def upper_triangular(A):
    return jnp.triu(A)


def pd_from_lower(L):
    """L @ L^T with L forced lower-triangular (src/utils.jl:14-17).

    precision=HIGHEST: TPU f32 matmuls default to bf16-precision inputs,
    which injects ~1e-3 relative error into the reconstructed matrix and
    breaks logdet round-trips (measured on-device); these products are
    load-bearing for the transform math."""
    L = jnp.tril(L)
    return jax.lax.dot_general(
        L, jnp.swapaxes(L, -1, -2),
        ((( L.ndim - 1,), (L.ndim - 2,)), (tuple(range(L.ndim - 2)),) * 2),
        precision=jax.lax.Precision.HIGHEST,
    )


def pd_from_upper(U):
    """U^T @ U with U forced upper-triangular (src/utils.jl:18-21);
    HIGHEST precision (see pd_from_lower)."""
    U = jnp.triu(U)
    Ut = jnp.swapaxes(U, -1, -2)
    return jax.lax.dot_general(
        Ut, U,
        (((Ut.ndim - 1,), (U.ndim - 2,)), (tuple(range(U.ndim - 2)),) * 2),
        precision=jax.lax.Precision.HIGHEST,
    )


def cholesky_lower(X):
    """Lower Cholesky factor of a (batched) symmetric PD matrix.

    Reference `cholesky_lower` (src/utils.jl:37) symmetrizes via Hermitian;
    we symmetrize explicitly so gradients are symmetric too. The blocked
    TPU cholesky's inner dots run at HIGHEST precision (f32 default is
    bf16-precision on the MXU — ~1e-3 error otherwise)."""
    Xs = 0.5 * (X + jnp.swapaxes(X, -1, -2))
    with jax.default_matmul_precision("highest"):
        return jnp.linalg.cholesky(Xs)


def cholesky_upper(X):
    """Upper Cholesky factor (src/utils.jl:50)."""
    return jnp.swapaxes(cholesky_lower(X), -1, -2)


def replace_diag(f, X):
    """Apply f to the diagonal of X, leave off-diagonals (src/bijectors/pd.jl:6-9)."""
    n = X.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    d = jnp.diagonal(X, axis1=-2, axis2=-1)
    fd = f(d)
    return jnp.where(eye, _set_diag_like(X, fd), X)


def _set_diag_like(X, d):
    n = X.shape[-1]
    return d[..., :, None] * jnp.eye(n, dtype=X.dtype)


def set_diag(X, d):
    """Return X with its diagonal replaced by d (batched)."""
    n = X.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, d[..., :, None] * jnp.ones((n, n), dtype=X.dtype), X)


def sum_last(x, ndims: int):
    """Sum over the trailing `ndims` axes (0 -> identity)."""
    if ndims == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-ndims, 0)))
