"""Correlation-matrix and Cholesky-factor bijectors (LKJ links).

TPU-native counterpart of /root/reference/src/bijectors/corr.jl (Stan's
correlation-matrix transform). The reference computes the link/inverse with
per-column sequential loops (corr.jl:293-399); here every recurrence is a
masked cumulative sum along the row axis — fully parallel on the VPU, no scan:

  forward link (corr.jl:293-335): W = chol_upper(X);
      remainder_sq[i,j] = sum_{k>i} W[k,j]^2   (reverse cumsum of W^2)
      z = W / sqrt(remainder_sq) ;  y = asinh(z) on the strict upper triangle
      (vector variant uses atanh(W[0,j]) for the first row, corr.jl:322 —
       identical value since columns are unit vectors)

  inverse link (corr.jl:344-399): z = tanh(y), lc = logcosh(y);
      lr_incl[i,j] = -sum_{k<=i} lc[k,j]       (cumsum along rows)
      lr_excl[i,j] = lr_incl[i,j] + lc[i,j]
      W[i,j] = z[i,j] * exp(lr_excl[i,j]) for i<j ;  W[j,j] = exp(lr at j-1)
      logJ = sum_{i<j} lr_incl[i,j] + sum_j lr_incl[j-1,j]

  closed-form inverse log-dets: corr.jl:464-501.

Packing order for the Vec variants is column-major over the strict upper
triangle (matching `update_triu_from_vec`, src/utils.jl:77-85).
"""

from __future__ import annotations

from functools import partial as _partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tree import pytree_dataclass
from ..utils import (
    cholesky_upper,
    logcosh,
    pd_from_upper,
    triu1_dim_from_length,
    triu_mask,
    triu_to_vec,
    vec_to_triu,
)
from .base import Bijector


# ---------------------------------------------------------------------------
# Shared masked-cumsum kernels (strict-upper-triangular, batched)
# ---------------------------------------------------------------------------


def _link_chol_lkj(W, first_row_atanh: bool):
    """Upper-tri Cholesky factor W -> strict-upper unconstrained matrix y.

    Parallel form of corr.jl:293-335. `first_row_atanh` selects the vector
    variant's atanh first row (corr.jl:322).
    """
    K = W.shape[-1]
    dtype = W.dtype
    up = triu_mask(K, 1)
    W = jnp.triu(W)
    W2 = W * W
    # remainder_sq[i,j] = sum_{k>i} W[k,j]^2 (within the column; zeros below
    # the diagonal contribute nothing).
    rev_incl = jnp.flip(jnp.cumsum(jnp.flip(W2, -2), axis=-2), -2)
    remainder_sq = rev_incl - W2
    safe_rem = jnp.where(up, remainder_sq, jnp.ones_like(remainder_sq))
    z = W / jnp.sqrt(safe_rem)
    y = jnp.arcsinh(z)
    if first_row_atanh:
        row0 = jnp.arange(K)[:, None] == 0
        y = jnp.where(row0, jnp.arctanh(jnp.clip(W, -1.0, 1.0)), y)
    return jnp.where(up, y, jnp.zeros([], dtype))


def _inv_link_chol_lkj(Y):
    """Strict-upper y-matrix -> (upper-tri Cholesky factor W, logJ).

    Parallel form of corr.jl:344-368 / 370-399.
    """
    W, logJ, _ = _inv_link_chol_lkj_with_logdiag(Y)
    return W, logJ


def _inv_link_chol_lkj_with_logdiag(Y):
    """(W, logJ, log diag W) — the log-diagonal comes STRAIGHT from the
    running sums (log W_jj = lr_incl at the last row of column j), never via
    log(exp(lr)): at |y| ~ 1e10 the factor diagonal underflows to exactly 0
    and log(diag W) would be -inf, which turns the zero-coefficient terms of
    the vec-corr correction into 0 * inf = NaN (caught by the 1e10-jump
    robustness drive on the linked_logdensity path)."""
    K = Y.shape[-1]
    dtype = Y.dtype
    up = triu_mask(K, 1)
    Yu = jnp.where(up, Y, jnp.zeros([], dtype))
    z = jnp.where(up, jnp.tanh(Yu), jnp.zeros([], dtype))
    lc = jnp.where(up, logcosh(Yu), jnp.zeros([], dtype))
    lr_incl = -jnp.cumsum(lc, axis=-2)  # lr after processing row i in column j
    lr_excl = lr_incl + lc  # lr before processing row i
    W_off = z * jnp.exp(lr_excl)
    # Diagonal: W[j,j] = exp(lr_incl[j-1, j]) for j>=1; W[0,0] = 1.
    diag_lr = jnp.concatenate(
        [
            jnp.zeros(Y.shape[:-2] + (1,), dtype),
            jnp.diagonal(lr_incl[..., :-1, 1:], axis1=-2, axis2=-1),
        ],
        axis=-1,
    )
    W = jnp.where(up, W_off, jnp.zeros([], dtype))
    W = W + jnp.exp(diag_lr)[..., None, :] * jnp.eye(K, dtype=dtype)
    # logJ = sum over strict-upper of lr_incl + per-column final lr.
    logJ = jnp.sum(jnp.where(up, lr_incl, jnp.zeros([], dtype)), axis=(-2, -1))
    logJ = logJ + jnp.sum(diag_lr, axis=-1)
    return W, logJ, diag_lr


def _logabsdetjac_inv_corr_mat(Y):
    """Closed-form logJ of the inverse corr link, strict-upper matrix input:
    -sum_{i<j} (K - i) * logcosh(Y[i,j]) with 0-based row i (corr.jl:464-472)."""
    K = Y.shape[-1]
    up = triu_mask(K, 1)
    coeff = (K - jnp.arange(K, dtype=Y.dtype))[:, None]
    val = coeff * logcosh(jnp.where(up, Y, jnp.zeros([], Y.dtype)))
    return -jnp.sum(jnp.where(up, val, jnp.zeros([], Y.dtype)), axis=(-2, -1))


def _logabsdetjac_inv_corr_vec(y):
    """Vector-packed variant (corr.jl:474-483)."""
    K = triu1_dim_from_length(y.shape[-1])
    rows = _triu1_rows(K)
    coeff = jnp.asarray(K - rows, dtype=y.dtype)
    return -jnp.sum(coeff * logcosh(y), axis=-1)


def _logabsdetjac_inv_chol(y):
    """Closed-form logJ of the inverse Cholesky link (corr.jl:485-501).

    Per column: result += lr_incl[i] - lc[i] over the column's entries.
    """
    K = triu1_dim_from_length(y.shape[-1])
    # STATIC numpy layout — jnp constants become tracers under jit and the
    # segment-start computation below must stay concrete (caught by /verify
    # driving linked_logdensity(LKJCholesky) jitted on the TPU)
    cols = _triu1_cols_np(K)
    lc = logcosh(y)
    # Segmented prefix sums per column (static segment layout).
    lr_incl = -_segmented_cumsum(lc, cols, K)
    return jnp.sum(lr_incl - lc, axis=-1)


from functools import lru_cache


@lru_cache(maxsize=None)
def _triu1_rows_np(K: int):
    return np.asarray([i for j in range(K) for i in range(j)], dtype=np.int32)


@lru_cache(maxsize=None)
def _triu1_cols_np(K: int):
    return np.asarray([j for j in range(K) for i in range(j)], dtype=np.int32)


def _triu1_rows(K: int):
    return jnp.asarray(_triu1_rows_np(K))


def _triu1_cols(K: int):
    return jnp.asarray(_triu1_cols_np(K))


def _segmented_cumsum(v, segment_ids, K: int):
    """Inclusive cumsum within contiguous segments (STATIC numpy layout —
    callers must pass concrete numpy segment ids, never jnp arrays, so the
    start-index computation stays trace-free under jit).

    v: (..., N) packed column-major; segments are the triangle columns.
    cumsum(v) - cumsum_at_segment_start gives the within-segment prefix.
    """
    if not isinstance(segment_ids, np.ndarray):
        raise TypeError("_segmented_cumsum needs a concrete numpy layout")
    c = jnp.cumsum(v, axis=-1)
    # start index of each element's segment (static numpy computation)
    cols = segment_ids
    starts = np.zeros_like(cols)
    seg_start = {}
    for idx, s in enumerate(cols):
        if int(s) not in seg_start:
            seg_start[int(s)] = idx
        starts[idx] = seg_start[int(s)]
    starts = jnp.asarray(starts)
    # prefix before segment start
    c_before = jnp.where(
        starts > 0, jnp.take(c, jnp.maximum(starts - 1, 0), axis=-1), 0.0
    )
    return c - c_before


# ---------------------------------------------------------------------------
# Bijectors
# ---------------------------------------------------------------------------


@pytree_dataclass
class CorrBijector(Bijector):
    """Correlation matrix -> strict-upper-tri unconstrained matrix
    (reference CorrBijector, corr.jl:64-92)."""

    event_ndims_in = 2
    event_ndims_out = 2

    def forward_and_log_det(self, X):
        y = self.forward(X)
        return y, -_logabsdetjac_inv_corr_mat(y)

    def forward(self, X):
        return _link_chol_lkj(cholesky_upper(X), first_row_atanh=False)

    def inverse(self, Y):
        return self.inverse_and_log_det(Y)[0]

    def inverse_and_log_det(self, Y):
        W, logJ, log_diag = _inv_link_chol_lkj_with_logdiag(Y)
        K = W.shape[-1]
        # corr.jl:74-81: logJ += sum_{j=1..K-2 (0-based)} (K-1-j) log W[j,j]
        coeff = jnp.concatenate(
            [
                jnp.zeros((1,), W.dtype),
                jnp.asarray(
                    np.maximum(np.arange(K - 2, -1, -1), 0), dtype=W.dtype
                ),
            ]
        )
        logJ = logJ + jnp.sum(coeff * log_diag, axis=-1)
        return pd_from_upper(W), logJ

    def inverse_log_det_jacobian(self, Y):
        return _logabsdetjac_inv_corr_mat(Y)


@pytree_dataclass
class VecCorrBijector(Bijector):
    """Correlation matrix -> packed vector of length K(K-1)/2
    (reference VecCorrBijector, corr.jl:95-162)."""

    event_ndims_in = 2
    event_ndims_out = 1

    def forward_event_shape(self, shape):
        n = shape[-1]
        return shape[:-2] + (n * (n - 1) // 2,)

    def inverse_event_shape(self, shape):
        n = triu1_dim_from_length(shape[-1])
        return shape[:-1] + (n, n)

    def forward_and_log_det(self, X):
        y = self.forward(X)
        return y, -_logabsdetjac_inv_corr_vec(y)

    def forward(self, X):
        Ymat = _link_chol_lkj(cholesky_upper(X), first_row_atanh=True)
        return triu_to_vec(Ymat, k=1)

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]

    def inverse_and_log_det(self, y):
        return self.inverse_and_log_det_with_factor(y)[:2]

    def inverse_and_log_det_with_factor(self, y):
        """(X, logJ, log_diag_W): also exposes the log-diagonal of the upper
        Cholesky factor W of X that the inverse computes anyway —
        distributions whose density is a function of the factor (LKJ:
        logdet X = 2 sum log W_jj) fuse on it instead of re-decomposing X
        (the NUTS hot-path optimization)."""
        if _lkj_pallas_profitable(y):
            K = triu1_dim_from_length(y.shape[-1])
            return _vec_corr_inverse_all_pallas(y, K)
        return _vec_corr_inverse_all_jnp(y)

    def inverse_log_det_jacobian(self, y):
        return _logabsdetjac_inv_corr_vec(y)

    def inverse_log_det_and_factor_only(self, y):
        """(logJ, log_diag_W) without materializing X — the logdensity-only
        hot path (Model with no likelihood over the corr block, ADVI ELBOs):
        skips the X = W'W triple product entirely."""
        if _lkj_pallas_profitable(y):
            K = triu1_dim_from_length(y.shape[-1])
            return _vec_corr_logdet_pallas(y, K)
        return _vec_corr_logdet_jnp(y)

    def inverse_log_det_and_factor_only_t(self, yT):
        """Transposed-layout (P, B) variant of inverse_log_det_and_factor_only
        (the linked_logdensity_t serving path); log_diag returns (B, K)."""
        K = triu1_dim_from_length(yT.shape[0])
        if _lkj_pallas_profitable_t(yT):
            return _lkj_logdet_pallas_t(yT, K, False)
        return _vec_corr_logdet_jnp(jnp.swapaxes(yT, 0, 1))


def _vec_corr_logdet_jnp(y):
    """(logJ, log_diag_W) — X never formed (XLA DCEs the unused W entries);
    log_diag from the running sums, never log(exp(.)) (see
    _inv_link_chol_lkj_with_logdiag)."""
    K = triu1_dim_from_length(y.shape[-1])
    Y = vec_to_triu(y, k=1, n=K)
    _, logJ, log_diag = _inv_link_chol_lkj_with_logdiag(Y)
    coeff = jnp.concatenate(
        [
            jnp.zeros((1,), log_diag.dtype),
            jnp.asarray(
                np.maximum(np.arange(K - 2, -1, -1), 0), dtype=log_diag.dtype
            ),
        ]
    )
    return logJ + jnp.sum(coeff * log_diag, axis=-1), log_diag


@_partial(jax.custom_jvp, nondiff_argnums=(1,))
def _vec_corr_logdet_pallas(y, K):
    from ..kernels.lkj import lkj_logdet_pallas

    return lkj_logdet_pallas(y, K)


@_partial(jax.custom_jvp, nondiff_argnums=(1,))
def _chol_logdet_pallas(y, K):
    """Chol-variant (logJ, log_diag) Pallas primal; tangents via the jnp
    closed forms (identical math)."""
    from ..kernels.lkj import lkj_logdet_pallas

    return lkj_logdet_pallas(y, K, chol=True)


def _chol_logdet_jnp(y):
    K = triu1_dim_from_length(y.shape[-1])
    dtype = jnp.result_type(y, float)
    lc = logcosh(y.astype(dtype))
    onehot = jnp.asarray(np.eye(K)[_triu1_cols_np(K)], dtype)
    log_diag = -jnp.matmul(lc, onehot, precision=jax.lax.Precision.HIGHEST)
    return _logabsdetjac_inv_chol(y), log_diag


def _lkj_logdet_tangent(y, dy, K: int, chol: bool):
    """Closed-form LINEAR tangent of the fused (logJ, log_diag) maps.

    logcosh(y) appears in logJ with a per-slot static multiplicity — slot
    (row i, col j) enters lr_incl[i'] for i' = i..j-1 plus its standalone
    term, so d logJ = -sum_s c_s tanh(y_s) dy_s with c_s = j-i+1 (chol
    variant, corr.jl:485-501) or c_s = K-i (vec-corr variant — the same
    telescoping that gives the closed form corr.jl:474-483). log_diag[:, j]
    = -sum_{s in col j} logcosh(y_s), so its tangent is the same per-column
    one-hot matmul as the primal. Everything here is LINEAR in dy (mul by
    primal-dependent constants + reductions), so XLA transposes it for
    reverse mode — `grad` through the Pallas dispatch never falls back to
    the O(K^2)-intermediate jnp path."""
    dtype = jnp.result_type(y, float)
    t = jnp.tanh(y.astype(dtype)) * dy.astype(dtype)
    rows = _triu1_rows_np(K)
    cols = _triu1_cols_np(K)
    coef = (cols - rows + 1) if chol else (K - rows)
    dlogJ = -jnp.sum(jnp.asarray(coef, dtype) * t, axis=-1)
    onehot = jnp.asarray(np.eye(K)[cols], dtype)
    dlog_diag = -jnp.matmul(t, onehot, precision=jax.lax.Precision.HIGHEST)
    return dlogJ, dlog_diag


@_chol_logdet_pallas.defjvp
def _chol_logdet_pallas_jvp(K, primals, tangents):
    (y,) = primals
    (dy,) = tangents
    # Pallas PRIMAL even under differentiation on TPU (value_and_grad is the
    # NUTS hot path) + closed-form linear tangent; jnp primal elsewhere
    # (direct callers may differentiate on CPU, where Pallas can't lower).
    if jax.default_backend() == "tpu":
        from ..kernels.lkj import lkj_logdet_pallas

        primal = lkj_logdet_pallas(y, K, chol=True)
    else:
        primal = _chol_logdet_jnp(y)
    return primal, _lkj_logdet_tangent(y, dy, K, chol=True)


@_vec_corr_logdet_pallas.defjvp
def _vec_corr_logdet_pallas_jvp(K, primals, tangents):
    (y,) = primals
    (dy,) = tangents
    if jax.default_backend() == "tpu":
        from ..kernels.lkj import lkj_logdet_pallas

        primal = lkj_logdet_pallas(y, K)
    else:
        primal = _vec_corr_logdet_jnp(y)
    return primal, _lkj_logdet_tangent(y, dy, K, chol=False)


@_partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _lkj_logdet_pallas_t(yT, K, chol):
    """Transposed-layout (P, B) fused (logJ, log_diag) — the kernel's native
    orientation, so the (B, P) -> (P, B) HBM relayout is skipped (the
    linked_logdensity_t serving path). log_diag comes back (B, K)."""
    from ..kernels.lkj import lkj_logdet_pallas

    return lkj_logdet_pallas(yT, K, chol=chol, pre_t=True)


@_lkj_logdet_pallas_t.defjvp
def _lkj_logdet_pallas_t_jvp(K, chol, primals, tangents):
    (yT,) = primals
    (dyT,) = tangents
    if jax.default_backend() == "tpu":
        from ..kernels.lkj import lkj_logdet_pallas

        primal = lkj_logdet_pallas(yT, K, chol=chol, pre_t=True)
    else:
        primal = (_chol_logdet_jnp if chol else _vec_corr_logdet_jnp)(
            jnp.swapaxes(yT, 0, 1)
        )
    # closed-form linear tangent, natively transposed: per-slot coefficient
    # contraction over axis 0; dlog_diag via the per-column one-hot matmul
    # expressed batch-major (einsum handles the orientation without an
    # explicit relayout)
    dtype = jnp.result_type(yT, float)
    t = jnp.tanh(yT.astype(dtype)) * dyT.astype(dtype)  # (P, B)
    rows = _triu1_rows_np(K)
    cols = _triu1_cols_np(K)
    coef = (cols - rows + 1) if chol else (K - rows)
    dlogJ = -jnp.sum(jnp.asarray(coef, dtype)[:, None] * t, axis=0)
    onehot = jnp.asarray(np.eye(K)[cols], dtype)  # (P, K)
    dlog_diag = -jnp.einsum(
        "pk,pb->bk", onehot, t, precision=jax.lax.Precision.HIGHEST
    )
    return primal, (dlogJ, dlog_diag)


def _lkj_pallas_profitable_t(yT) -> bool:
    """Transposed-layout dispatch: yT is (P, B)."""
    try:
        from .. import kernels

        K = triu1_dim_from_length(yT.shape[0])
        return kernels.profitable(
            "lkj", batch=yT.shape[-1], k=K, ndim=yT.ndim, dtype=yT.dtype
        )
    except Exception:
        return False


def _vec_corr_inverse_all_jnp(y):
    """(X, logJ, log_diag_W) via the masked-cumsum jnp path; log_diag from
    the running sums, never log(exp(.))."""
    K = triu1_dim_from_length(y.shape[-1])
    Y = vec_to_triu(y, k=1, n=K)
    W, logJ, log_diag = _inv_link_chol_lkj_with_logdiag(Y)
    coeff = jnp.concatenate(
        [
            jnp.zeros((1,), W.dtype),
            jnp.asarray(np.maximum(np.arange(K - 2, -1, -1), 0), dtype=W.dtype),
        ]
    )
    logJ = logJ + jnp.sum(coeff * log_diag, axis=-1)
    return pd_from_upper(W), logJ, log_diag


def _lkj_pallas_profitable(y) -> bool:
    """Trace-time dispatch (static shape/dtype/backend only): the fused
    lane-batch kernel wins for 2D f32 batches of small K (see kernels/lkj.py)."""
    import jax

    try:
        from .. import kernels

        K = triu1_dim_from_length(y.shape[-1])
        return kernels.profitable(
            "lkj", batch=y.shape[0], k=K, ndim=y.ndim, dtype=y.dtype
        )
    except Exception:
        return False


@_partial(jax.custom_jvp, nondiff_argnums=(1,))
def _vec_corr_inverse_all_pallas(y, K):
    """Pallas primal; derivatives route through the jnp path (identical math)."""
    from ..kernels.lkj import lkj_inverse_pallas

    return lkj_inverse_pallas(y, K)


@_vec_corr_inverse_all_pallas.defjvp
def _vec_corr_inverse_all_pallas_jvp(K, primals, tangents):
    (y,) = primals
    (dy,) = tangents
    return jax.jvp(_vec_corr_inverse_all_jnp, (y,), (dy,))


@pytree_dataclass(meta_fields=("mode",))
class VecCholeskyBijector(Bijector):
    """Cholesky factor of a correlation matrix -> packed vector
    (reference VecCholeskyBijector, corr.jl:164-259).

    mode='U': input/output factor is upper-triangular; mode='L': lower.
    """

    mode: str = "U"

    event_ndims_in = 2
    event_ndims_out = 1

    def __post_init__(self):
        if self.mode not in ("U", "L"):
            raise ValueError("mode must be 'U' or 'L'")

    def forward_event_shape(self, shape):
        n = shape[-1]
        return shape[:-2] + (n * (n - 1) // 2,)

    def inverse_event_shape(self, shape):
        n = triu1_dim_from_length(shape[-1])
        return shape[:-1] + (n, n)

    def forward_and_log_det(self, X):
        y = self.forward(X)
        return y, -_logabsdetjac_inv_chol(y)

    def forward(self, X):
        U = X if self.mode == "U" else jnp.swapaxes(X, -1, -2)
        Ymat = _link_chol_lkj(jnp.triu(U), first_row_atanh=True)
        return triu_to_vec(Ymat, k=1)

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]

    def inverse_and_log_det(self, y):
        K = triu1_dim_from_length(y.shape[-1])
        Y = vec_to_triu(y, k=1, n=K)
        W, logJ = _inv_link_chol_lkj(Y)
        out = W if self.mode == "U" else jnp.swapaxes(W, -1, -2)
        return out, logJ

    def inverse_log_det_jacobian(self, y):
        return _logabsdetjac_inv_chol(y)

    def inverse_and_log_det_with_factor(self, y):
        """(X, logJ, log_diag): the sample IS the factor, so this just also
        exposes its log-diagonal for LKJCholesky.logpdf_from_factor —
        straight from the running sums, never log(exp(.)) (finite at the
        1e10-jump extremes where the diagonal underflows to 0)."""
        K = triu1_dim_from_length(y.shape[-1])
        Y = vec_to_triu(y, k=1, n=K)
        W, logJ, log_diag = _inv_link_chol_lkj_with_logdiag(Y)
        X = W if self.mode == "U" else jnp.swapaxes(W, -1, -2)
        return X, logJ, log_diag

    def inverse_log_det_and_factor_only(self, y):
        """(logJ, log_diag of the factor) WITHOUT materializing the (K, K)
        factor: log W_jj = -sum_{i<j} logcosh(y_ij), a per-column sum over
        the packed vector (one small matmul), and the closed-form log-det
        (corr.jl:488-501). The LKJCholesky density needs nothing else
        (matrix.py LKJCholesky.logpdf_from_factor) — this is the
        serving-batch fast path that skips the W materialization.
        Pallas-eligible batches take the fused chol-variant kernel
        (slope-timed ~20x at B=131072, K=16)."""
        if _lkj_pallas_profitable(y):
            K = triu1_dim_from_length(y.shape[-1])
            return _chol_logdet_pallas(y, K)
        return _chol_logdet_jnp(y)

    def inverse_log_det_and_factor_only_t(self, yT):
        """Transposed-layout (P, B) variant (the linked_logdensity_t serving
        path); log_diag returns (B, K)."""
        K = triu1_dim_from_length(yT.shape[0])
        if _lkj_pallas_profitable_t(yT):
            return _lkj_logdet_pallas_t(yT, K, True)
        return _chol_logdet_jnp(jnp.swapaxes(yT, 0, 1))
