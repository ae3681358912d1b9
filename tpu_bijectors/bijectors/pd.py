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


from functools import lru_cache


@lru_cache(maxsize=None)
def _tril_rc_np(K: int):
    """(rows, cols) of the row-major lower-triangle pack (pd.jl:36-43 order:
    slot r(r+1)/2 + c for c <= r)."""
    rows = np.asarray([r for r in range(K) for c in range(r + 1)], np.int32)
    cols = np.asarray([c for r in range(K) for c in range(r + 1)], np.int32)
    return rows, cols


@lru_cache(maxsize=None)
def _colmix_idx_np(K: int):
    """Static indices for the packed column-mixing map: for every column c
    and pair (a, r) with a, r >= c, map source slot (a, c) -> dest slot
    (r, c) weighted by C[r, a]. Lets (C L) be computed as ONE (B, P) @ (P, P)
    matmul on packed triangles — no (B, K, K) materialization (the jnp
    fallback's (B, K, K) intermediates pad K -> 128 lanes, the 8x HBM waste
    the kernels exist to avoid)."""
    src, dst, cr, ca = [], [], [], []
    slot = lambda r, c: r * (r + 1) // 2 + c
    for c in range(K):
        for a in range(c, K):
            for r in range(c, K):
                src.append(slot(a, c))
                dst.append(slot(r, c))
                cr.append(r)
                ca.append(a)
    return (
        np.asarray(src, np.int32),
        np.asarray(dst, np.int32),
        np.asarray(cr, np.int32),
        np.asarray(ca, np.int32),
    )


def _packed_colmix(Lp, C, K):
    """packed(C @ L) from packed L (lower-tri, row-major) and a full (K, K)
    matrix C, via a static scatter of C into a (P, P) mixing matrix."""
    P = K * (K + 1) // 2
    src, dst, cr, ca = _colmix_idx_np(K)
    M = jnp.zeros((P, P), Lp.dtype).at[src, dst].add(C[cr, ca])
    return jnp.matmul(Lp, M, precision=jax.lax.Precision.HIGHEST)


def _pd_logdensity_tangent(y, C, dy, dC, K, mode):
    """Closed-form LINEAR tangent of (logJ, sum_ydiag, tr) in packed (B, P)
    algebra. With L = unpack(y) (exp diagonal):

      d logJ = sum_r (K+1-r) dy_rr ;  d sumd = sum_r dy_rr
      dot:   d tr = <dC, X> + 2 <C L, dL>          (C symmetric)
             <dC, X> = sum_slots L . packed(dC L)   (X = L L')
      solve: d tr = 2 <At, dC> - 2 <At A', dL>,  A = L^-1 C, At = L^-T A
             (forward/back substitution unrolled over K rows of (B, K)).

    Everything is linear in (dy, dC) => XLA transposes it for reverse mode."""
    dtype = jnp.result_type(y, float)
    y = y.astype(dtype)
    dy = dy.astype(dtype)
    C = jnp.asarray(C, dtype)
    dC = jnp.asarray(dC, dtype)
    rows, cols = _tril_rc_np(K)
    diag = rows == cols
    ed = jnp.exp(jnp.where(diag, y, 0.0))
    Lp = jnp.where(diag, ed, y)  # packed L
    dLp = jnp.where(diag, ed * dy, dy)  # packed dL
    # the affine dlogJ/dsumd coefficient algebra lives ONCE, in
    # _pd_affine_tangents (shared with the backward-kernel fast path)
    dlogJ, dsumd = _pd_affine_tangents(dy, K, -1)
    if mode == "dot":
        dtr = jnp.sum(Lp * _packed_colmix(Lp, dC, K), axis=-1) + 2.0 * jnp.sum(
            _packed_colmix(Lp, C, K) * dLp, axis=-1
        )
        return dlogJ, dsumd, dtr
    # solve mode: unrolled packed forward/back substitution (rows of (B, K))
    slot = lambda r, c: r * (r + 1) // 2 + c
    inv_d = [1.0 / Lp[..., slot(i, i)] for i in range(K)]
    Cb = jnp.broadcast_to(C, y.shape[:-1] + (K, K))
    A = []
    for i in range(K):
        acc = Cb[..., i, :]
        for k in range(i):
            acc = acc - Lp[..., slot(i, k), None] * A[k]
        A.append(acc * inv_d[i][..., None])
    At = [None] * K
    for i in range(K - 1, -1, -1):
        acc = A[i]
        for k in range(i + 1, K):
            acc = acc - Lp[..., slot(k, i), None] * At[k]
        At[i] = acc * inv_d[i][..., None]
    dtr = 2.0 * sum(jnp.sum(At[i] * dC[i, :], axis=-1) for i in range(K))
    # <At A', dL> over lower slots: (At A')_{r,c} = sum_j At[r]_j A[c]_j
    ata = jnp.stack(
        [jnp.sum(At[int(r)] * A[int(c)], axis=-1) for r, c in zip(rows, cols)],
        axis=-1,
    )
    dtr = dtr - 2.0 * jnp.sum(ata * dLp, axis=-1)
    return dlogJ, dsumd, dtr


def _tr_grad_jnp(y, C, mode):
    """d(trace)/d(y) via AD of the jnp composition (batchwise independent,
    so grad-of-sum is the per-row partial map). Exists so the Pallas
    trace-grad primal below stays differentiable at higher order."""
    return jax.grad(lambda yy: jnp.sum(_pd_logdensity_jnp(yy, C, mode)[2]))(y)


@_partial(jax.custom_jvp, nondiff_argnums=(1, 3, 4))
def _pd_tr_grad(y, K, C, mode, pre_t):
    """Dedicated PD backward kernel: d(trace)/d(y) in one Pallas pass
    (kernels/pd.py::pd_trace_grad_pallas). The jnp solve-mode tangent
    materializes K^2 (B, K) substitution rows in HBM; this keeps the
    forward/back substitution in registers."""
    from ..kernels.pd import pd_trace_grad_pallas

    return pd_trace_grad_pallas(y, K, C, mode, pre_t=pre_t)


@_pd_tr_grad.defjvp
def _pd_tr_grad_jvp(K, mode, pre_t, primals, tangents):
    # only reached under SECOND-order differentiation of the logdensity;
    # the pre_t primal stays on the kernel's native (P, B) layout (no HBM
    # relayout) — only the jnp tangent reference swaps axes.
    y, C = primals
    dy, dC = tangents
    if jax.default_backend() == "tpu":
        from ..kernels.pd import pd_trace_grad_pallas

        primal = pd_trace_grad_pallas(y, K, C, mode, pre_t=pre_t)
    else:
        primal = _tr_grad_jnp(jnp.swapaxes(y, 0, 1) if pre_t else y, C, mode)
        if pre_t:
            primal = jnp.swapaxes(primal, 0, 1)
    yb, dyb = (jnp.swapaxes(y, 0, 1), jnp.swapaxes(dy, 0, 1)) if pre_t else (y, dy)
    tangent = jax.jvp(
        lambda yy, CC: _tr_grad_jnp(yy, CC, mode), (yb, C), (dyb, jnp.asarray(dC))
    )[1]
    if pre_t:
        tangent = jnp.swapaxes(tangent, 0, 1)
    return primal, tangent


def _pd_affine_tangents(dy, K, axis):
    """Tangents of the two affine-in-y outputs: d logJ = sum (K+1-r) dy_rr,
    d sumd = sum_r dy_rr (diagonal slots only; the exp chain cancels
    nowhere here — logJ/sumd are written in y, not L)."""
    dtype = dy.dtype
    rows, cols = _tril_rc_np(K)
    diag = rows == cols
    coeff = jnp.asarray(np.where(diag, K + 1.0 - rows, 0.0), dtype)
    dmask = jnp.asarray(diag, dtype)
    if axis == 0:  # transposed (P, B) layout
        coeff, dmask = coeff[:, None], dmask[:, None]
    return jnp.sum(coeff * dy, axis=axis), jnp.sum(dmask * dy, axis=axis)


def _pd_logdensity_pallas_jvp(K, mode, primals, tangents):
    from jax.custom_derivatives import SymbolicZero

    y, C = primals
    dy, dC = tangents
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from ..kernels.pd import pd_logdensity_pallas

        primal = pd_logdensity_pallas(y, K, C, mode)
    else:
        primal = _pd_logdensity_jnp(y, C, mode)
    dC_zero = isinstance(dC, SymbolicZero)
    dy_zero = isinstance(dy, SymbolicZero)
    if dy_zero and dC_zero:
        z = jnp.zeros_like(primal[0])
        return primal, (z, z, z)
    if on_tpu and dC_zero and mode == "solve" and not dy_zero:
        # backward kernel path: the only sampler-hot case (C constant,
        # solve-mode trace); dot mode's jnp tangent is already two packed
        # MXU matmuls — see _pd_logdensity_tangent.
        gtr = _pd_tr_grad(y, K, C, mode, False)
        dlogJ, dsumd = _pd_affine_tangents(dy, K, -1)
        return primal, (dlogJ, dsumd, jnp.sum(gtr * dy, axis=-1))
    dy = jnp.zeros_like(y) if dy_zero else dy
    dC = jnp.zeros_like(jnp.asarray(C, y.dtype)) if dC_zero else dC
    return primal, _pd_logdensity_tangent(y, C, dy, dC, K, mode)


_pd_logdensity_pallas_diffable.defjvp(
    _pd_logdensity_pallas_jvp, symbolic_zeros=True
)


@_partial(jax.custom_jvp, nondiff_argnums=(1, 3))
def _pd_logdensity_pallas_t(yT, K, C, mode):
    """Transposed-layout (P, B) fused PD logdensity — the kernel's native
    orientation, no HBM relayout (the linked_logdensity_t serving path)."""
    from ..kernels.pd import pd_logdensity_pallas

    return pd_logdensity_pallas(yT, K, C, mode, pre_t=True)


def _pd_logdensity_pallas_t_jvp(K, mode, primals, tangents):
    from jax.custom_derivatives import SymbolicZero

    yT, C = primals
    dyT, dC = tangents
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from ..kernels.pd import pd_logdensity_pallas

        primal = pd_logdensity_pallas(yT, K, C, mode, pre_t=True)
    else:
        primal = _pd_logdensity_jnp(jnp.swapaxes(yT, 0, 1), C, mode)
    dC_zero = isinstance(dC, SymbolicZero)
    dyT_zero = isinstance(dyT, SymbolicZero)
    if dyT_zero and dC_zero:
        z = jnp.zeros_like(primal[0])
        return primal, (z, z, z)
    if on_tpu and dC_zero and mode == "solve" and not dyT_zero:
        gtrT = _pd_tr_grad(yT, K, C, mode, True)
        dlogJ, dsumd = _pd_affine_tangents(dyT, K, 0)
        return primal, (dlogJ, dsumd, jnp.sum(gtrT * dyT, axis=0))
    dyT = jnp.zeros_like(yT) if dyT_zero else dyT
    dC = jnp.zeros_like(jnp.asarray(C, yT.dtype)) if dC_zero else dC
    tangent = _pd_logdensity_tangent(
        jnp.swapaxes(yT, 0, 1), C, jnp.swapaxes(dyT, 0, 1), dC, K, mode
    )
    return primal, tangent


_pd_logdensity_pallas_t.defjvp(_pd_logdensity_pallas_t_jvp, symbolic_zeros=True)


def _pd_pallas_profitable_t(yT) -> bool:
    """Transposed-layout dispatch: yT is (P, B)."""
    try:
        from .. import kernels

        K = triu_dim_from_length(yT.shape[0])
        return kernels.profitable(
            "pd", batch=yT.shape[-1], k=K, ndim=yT.ndim, dtype=yT.dtype
        )
    except Exception:
        return False
