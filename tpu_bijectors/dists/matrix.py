"""Matrix-variate distributions: LKJ, LKJCholesky, Wishart, InverseWishart.

These are what the reference's PD / (Vec)Corr bijectors are registered
against (src/transformed_distribution.jl:138-142). Sampling is fully
vectorized: LKJ uses the onion method (Lewandowski-Kurowicka-Joe 2009)
expressed as one masked column-normalized Gaussian + per-column Beta radii;
Wishart uses the Bartlett decomposition (chi-square diagonal + Gaussian
strict lower triangle) — no loops, everything batches on the VPU/MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

from ..tree import pytree_dataclass
from ..utils import cholesky_lower, triu_mask
from .base import (
    CHOLESKY_CORRELATION,
    CORRELATION,
    POSITIVE_DEFINITE,
    Distribution,
)

LOG2 = math.log(2.0)
LOGPI = math.log(math.pi)


def _lkj_log_normalizer(K: int, eta, dtype):
    """log c_K(eta) for density det(R)^(eta-1) / c_K(eta).

    c_K(eta) = prod_{k=1}^{K-1} 2^{(2 eta - 2 + K - k)(K - k)}
               * B(eta + (K-k-1)/2, eta + (K-k-1)/2)^{K-k}
    (Lewandowski-Kurowicka-Joe 2009; verified against the K=2 integral and
    the K=3, eta=1 elliptope volume pi^2/2.)
    """
    eta = jnp.asarray(eta, dtype)
    k = jnp.asarray(np.arange(1, K), dtype)
    km = jnp.asarray(K, dtype) - k  # K - k
    a = eta + (km - 1.0) / 2.0
    lbeta = 2.0 * jsp.gammaln(a) - jsp.gammaln(2.0 * a)
    return jnp.sum((2.0 * eta - 2.0 + km) * km * LOG2 + km * lbeta)


def _sample_lkj_chol_upper(key, K: int, eta, shape, dtype):
    """Onion method: upper-triangular Cholesky factor U (columns unit-norm)
    of an LKJ(eta) correlation matrix, batched over `shape`."""
    kg, kb = jax.random.split(key)
    eta = jnp.asarray(eta, dtype)
    g = jax.random.normal(kg, tuple(shape) + (K, K), dtype)
    up = triu_mask(K, 1)
    g = jnp.where(up, g, jnp.zeros([], dtype))
    norm = jnp.sqrt(jnp.sum(g * g, axis=-2, keepdims=True))
    u = jnp.where(up, g / jnp.where(norm == 0, 1.0, norm), jnp.zeros([], dtype))
    # y_j ~ Beta(j/2, eta + (K-1-j)/2) for column j = 1..K-1 (0-based).
    j = jnp.asarray(np.arange(1, K), dtype)
    a = j / 2.0
    b = eta + (jnp.asarray(K, dtype) - 1.0 - j) / 2.0
    y = jax.random.beta(kb, a, b, tuple(shape) + (K - 1,), dtype)
    sqrt_y = jnp.concatenate(
        [jnp.zeros(tuple(shape) + (1,), dtype), jnp.sqrt(y)], axis=-1
    )
    diag = jnp.concatenate(
        [jnp.ones(tuple(shape) + (1,), dtype), jnp.sqrt(1.0 - y)], axis=-1
    )
    U = u * sqrt_y[..., None, :] + diag[..., None, :] * jnp.eye(K, dtype=dtype)
    return U


@pytree_dataclass(meta_fields=("dim",))
class LKJ(Distribution):
    """LKJ(dim, eta) over correlation matrices; density det(R)^(eta-1)/c."""

    dim: int
    eta: jax.Array | float = 1.0

    event_ndims = 2

    @property
    def event_shape(self):
        return (self.dim, self.dim)

    @property
    def batch_shape(self):
        return jnp.shape(self.eta)

    def logpdf(self, X):
        # logdet via Cholesky (SPD): cheaper than LU slogdet and f64-safe on TPU
        dtype = jnp.result_type(X, float)
        L = cholesky_lower(X)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        eta = jnp.asarray(self.eta, dtype)
        return (eta - 1.0) * logdet - _lkj_log_normalizer(self.dim, eta, dtype)

    def logpdf_from_factor(self, log_diag_w, x=None):
        """Density from the log-diagonal of the upper Cholesky factor W of
        X = W'W (which the VecCorrBijector inverse computes anyway):
        logdet X = 2 sum log W_jj. Fuses the NUTS hot path — no
        re-decomposition of X."""
        dtype = jnp.result_type(log_diag_w, float)
        eta = jnp.asarray(self.eta, dtype)
        logdet = 2.0 * jnp.sum(log_diag_w, -1)
        return (eta - 1.0) * logdet - _lkj_log_normalizer(self.dim, eta, dtype)

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.eta, float)
        shape = tuple(sample_shape) + self.batch_shape
        U = _sample_lkj_chol_upper(key, self.dim, self.eta, shape, dtype)
        # HIGHEST precision: bf16-default matmul would leave the diagonal
        # ~1e-3 off 1.0, outside the correlation support tolerance
        return jnp.matmul(jnp.swapaxes(U, -1, -2), U, precision=jax.lax.Precision.HIGHEST)

    @property
    def support(self):
        return CORRELATION


@pytree_dataclass(meta_fields=("dim", "mode"))
class LKJCholesky(Distribution):
    """LKJCholesky(dim, eta, mode): distribution over Cholesky factors of
    LKJ correlation matrices. mode='L' (lower, default like Distributions.jl)
    or 'U'. Event is the (dim, dim) triangular factor matrix.

    log p(L) = sum_{j=2}^{K} (2 eta - 2 + K - j) log L_jj - log c_K(eta)
    (1-based j; derived from det Jacobian of R -> L = prod_j L_jj^{K-j}).
    """

    dim: int
    eta: jax.Array | float = 1.0
    mode: str = "L"

    event_ndims = 2

    def __post_init__(self):
        if self.mode not in ("L", "U"):
            raise ValueError("mode must be 'L' or 'U'")

    @property
    def event_shape(self):
        return (self.dim, self.dim)

    @property
    def batch_shape(self):
        return jnp.shape(self.eta)

    def logpdf(self, X):
        dtype = jnp.result_type(X, float)
        d = jnp.diagonal(X, axis1=-2, axis2=-1)
        K = self.dim
        eta = jnp.asarray(self.eta, dtype)
        jj = jnp.asarray(np.arange(1, K + 1), dtype)
        coeff = 2.0 * eta[..., None] - 2.0 + jnp.asarray(K, dtype) - jj if jnp.ndim(eta) else (
            2.0 * eta - 2.0 + jnp.asarray(K, dtype) - jj
        )
        lp = jnp.sum(coeff * jnp.log(jnp.where(jnp.arange(K) == 0, 1.0, d)), -1)
        return lp - _lkj_log_normalizer(K, eta, dtype)

    def logpdf_from_factor(self, log_diag, x=None):
        """Density from the factor's log-diagonal (what the VecCholesky
        inverse link computes without materializing the matrix —
        corr.py VecCholeskyBijector.inverse_log_det_and_factor_only)."""
        dtype = jnp.result_type(log_diag, float)
        K = self.dim
        eta = jnp.asarray(self.eta, dtype)
        jj = jnp.asarray(np.arange(1, K + 1), dtype)
        coeff = (
            2.0 * eta[..., None] - 2.0 + jnp.asarray(K, dtype) - jj
            if jnp.ndim(eta)
            else (2.0 * eta - 2.0 + jnp.asarray(K, dtype) - jj)
        )
        return jnp.sum(coeff * log_diag, -1) - _lkj_log_normalizer(K, eta, dtype)

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.eta, float)
        shape = tuple(sample_shape) + self.batch_shape
        U = _sample_lkj_chol_upper(key, self.dim, self.eta, shape, dtype)
        return jnp.swapaxes(U, -1, -2) if self.mode == "L" else U

    @property
    def support(self):
        return CHOLESKY_CORRELATION


def _mv_lgamma(a, p: int):
    """Multivariate log-gamma."""
    i = jnp.asarray(np.arange(1, p + 1), jnp.result_type(a, float))
    return 0.25 * p * (p - 1) * LOGPI + jnp.sum(
        jsp.gammaln(a[..., None] + 0.5 * (1.0 - i)), -1
    )


def _bartlett_chol(key, df, S_chol, K: int, shape, dtype):
    """Cholesky factor of a Wishart(df, S) draw via Bartlett decomposition:
    W = L A A^T L^T with A lower: diag A_ii^2 ~ chi2(df-i+1), offdiag ~ N(0,1)."""
    kc, kn = jax.random.split(key)
    i = jnp.asarray(np.arange(K), dtype)
    chi_df = jnp.asarray(df, dtype)[..., None] - i if jnp.ndim(df) else jnp.asarray(df, dtype) - i
    c = jnp.sqrt(2.0 * jax.random.gamma(kc, 0.5 * chi_df, tuple(shape) + (K,), dtype))
    n = jax.random.normal(kn, tuple(shape) + (K, K), dtype)
    low = jnp.asarray(np.tril(np.ones((K, K)), -1), dtype)
    A = n * low + c[..., None] * jnp.eye(K, dtype=dtype)
    return jnp.einsum("...ij,...jk->...ik", S_chol, A, precision=jax.lax.Precision.HIGHEST)


@pytree_dataclass(meta_fields=())
class Wishart(Distribution):
    """Wishart(df, S) over SPD matrices (S = scale matrix)."""

    df: jax.Array | float
    scale: jax.Array

    event_ndims = 2

    @property
    def event_shape(self):
        return jnp.shape(self.scale)[-2:]

    @property
    def batch_shape(self):
        return jnp.shape(self.scale)[:-2]

    def logpdf(self, X):
        dtype = jnp.result_type(X, float)
        K = jnp.shape(self.scale)[-1]
        v = jnp.asarray(self.df, dtype)
        S = jnp.asarray(self.scale, dtype)
        _, logdetX = jnp.linalg.slogdet(X)
        _, logdetS = jnp.linalg.slogdet(S)
        tr = jnp.trace(jnp.linalg.solve(S, X), axis1=-2, axis2=-1)
        return (
            0.5 * (v - K - 1.0) * logdetX
            - 0.5 * tr
            - 0.5 * v * K * LOG2
            - 0.5 * v * logdetS
            - _mv_lgamma(0.5 * v, K)
        )

    def logpdf_from_factor(self, L, x=None):
        """Density from the lower Cholesky factor L of X = LL' (the factor the
        PDVecBijector inverse computes anyway): logdet X = 2 sum log L_ii.
        The trace term uses the caller-provided X when available:
        tr(S^-1 X) = sum(S^-1 * X) with ONE unbatched K x K solve for S^-1
        (S is a distribution parameter) — no per-sample triangular solve."""
        dtype = jnp.result_type(L, float)
        K = jnp.shape(self.scale)[-1]
        v = jnp.asarray(self.df, dtype)
        S = jnp.asarray(self.scale, dtype)
        Sc = cholesky_lower(S)
        logdetX = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        logdetS = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Sc, axis1=-2, axis2=-1)), -1)
        if x is not None:
            Sinv = jax.scipy.linalg.cho_solve((Sc, True), jnp.eye(K, dtype=dtype))
            tr = jnp.sum(Sinv * x, axis=(-2, -1))
        else:
            Sc_b = jnp.broadcast_to(Sc, jnp.shape(L)[:-2] + jnp.shape(Sc)[-2:])
            A = jax.scipy.linalg.solve_triangular(Sc_b, L, lower=True)
            tr = jnp.sum(A * A, axis=(-2, -1))
        return (
            0.5 * (v - K - 1.0) * logdetX
            - 0.5 * tr
            - 0.5 * v * K * LOG2
            - 0.5 * v * logdetS
            - _mv_lgamma(0.5 * v, K)
        )

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Logdensity-only fusion (vectorize.core hook): the PD logdensity
        kernel evaluates the inverse link + tr(S^-1 X) in one pass without
        materializing X or L (kernels/pd.py mode="dot"). Only fires on the
        linked_logdensity path (want_x=False) with an unbatched scale."""
        from ..bijectors.pd import (
            PDVecBijector,
            _pd_logdensity_pallas_diffable,
            _pd_pallas_profitable,
        )
        from ..utils import cholesky_lower

        if want_x or type(bijector) is not PDVecBijector:
            return None
        if not _pd_pallas_profitable(y):
            return None
        if jnp.ndim(self.scale) != 2 or jnp.ndim(self.df) != 0:
            return None
        dtype = jnp.result_type(y, float)
        K = jnp.shape(self.scale)[-1]
        v = jnp.asarray(self.df, dtype)
        Sc = cholesky_lower(jnp.asarray(self.scale, dtype))
        Sinv = jax.scipy.linalg.cho_solve((Sc, True), jnp.eye(K, dtype=dtype))
        logJ, sumd, tr = _pd_logdensity_pallas_diffable(y, K, Sinv, "dot")
        logdetX = 2.0 * sumd
        logdetS = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Sc, axis1=-2, axis2=-1)), -1)
        lp = (
            0.5 * (v - K - 1.0) * logdetX
            - 0.5 * tr
            - 0.5 * v * K * LOG2
            - 0.5 * v * logdetS
            - _mv_lgamma(0.5 * v, K)
        )
        return None, lp + logJ

    def fused_linked_logdensity_t(self, bijector, yT):
        """Transposed-layout (P, B) fusion hook (linked_logdensity_t): same
        assembly as fused_linked_logdensity, kernel fed in its native
        orientation (no HBM relayout)."""
        from ..bijectors.pd import (
            PDVecBijector,
            _pd_logdensity_pallas_t,
            _pd_pallas_profitable_t,
        )
        from ..utils import cholesky_lower

        if type(bijector) is not PDVecBijector:
            return None
        if not _pd_pallas_profitable_t(yT):
            return None
        if jnp.ndim(self.scale) != 2 or jnp.ndim(self.df) != 0:
            return None
        dtype = jnp.result_type(yT, float)
        K = jnp.shape(self.scale)[-1]
        v = jnp.asarray(self.df, dtype)
        Sc = cholesky_lower(jnp.asarray(self.scale, dtype))
        Sinv = jax.scipy.linalg.cho_solve((Sc, True), jnp.eye(K, dtype=dtype))
        logJ, sumd, tr = _pd_logdensity_pallas_t(yT, K, Sinv, "dot")
        logdetX = 2.0 * sumd
        logdetS = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Sc, axis1=-2, axis2=-1)), -1)
        lp = (
            0.5 * (v - K - 1.0) * logdetX
            - 0.5 * tr
            - 0.5 * v * K * LOG2
            - 0.5 * v * logdetS
            - _mv_lgamma(0.5 * v, K)
        )
        return lp + logJ

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.df, self.scale, float)
        K = jnp.shape(self.scale)[-1]
        shape = tuple(sample_shape) + self.batch_shape
        Sc = cholesky_lower(jnp.asarray(self.scale, dtype))
        L = _bartlett_chol(key, self.df, Sc, K, shape, dtype)
        return jnp.matmul(L, jnp.swapaxes(L, -1, -2), precision=jax.lax.Precision.HIGHEST)

    @property
    def support(self):
        return POSITIVE_DEFINITE


@pytree_dataclass(meta_fields=())
class InverseWishart(Distribution):
    """InverseWishart(df, Psi) over SPD matrices."""

    df: jax.Array | float
    psi: jax.Array

    event_ndims = 2

    @property
    def event_shape(self):
        return jnp.shape(self.psi)[-2:]

    @property
    def batch_shape(self):
        return jnp.shape(self.psi)[:-2]

    def logpdf(self, X):
        dtype = jnp.result_type(X, float)
        K = jnp.shape(self.psi)[-1]
        v = jnp.asarray(self.df, dtype)
        P = jnp.asarray(self.psi, dtype)
        _, logdetX = jnp.linalg.slogdet(X)
        _, logdetP = jnp.linalg.slogdet(P)
        tr = jnp.trace(jnp.linalg.solve(X, P), axis1=-2, axis2=-1)
        return (
            0.5 * v * logdetP
            - 0.5 * (v + K + 1.0) * logdetX
            - 0.5 * tr
            - 0.5 * v * K * LOG2
            - _mv_lgamma(0.5 * v, K)
        )

    def logpdf_from_factor(self, L, x=None):
        """Density from the lower Cholesky factor L of X = LL':
        tr(Psi X^-1) = ||solve_tri(L, chol(Psi))||_F^2."""
        dtype = jnp.result_type(L, float)
        K = jnp.shape(self.psi)[-1]
        v = jnp.asarray(self.df, dtype)
        P = jnp.asarray(self.psi, dtype)
        Pc = cholesky_lower(P)
        logdetX = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        logdetP = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Pc, axis1=-2, axis2=-1)), -1)
        Pc_b = jnp.broadcast_to(Pc, jnp.shape(L)[:-2] + jnp.shape(Pc)[-2:])
        B = jax.scipy.linalg.solve_triangular(L, Pc_b, lower=True)
        tr = jnp.sum(B * B, axis=(-2, -1))
        return (
            0.5 * v * logdetP
            - 0.5 * (v + K + 1.0) * logdetX
            - 0.5 * tr
            - 0.5 * v * K * LOG2
            - _mv_lgamma(0.5 * v, K)
        )

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Logdensity-only fusion: in-kernel forward substitution computes
        tr(Psi X^-1) = ||L^-1 chol(Psi)||_F^2 (kernels/pd.py mode="solve"),
        replacing the ~10 ms batched XLA triangular solve at B=131072, K=16
        (slope-timed) without materializing X or L."""
        from ..bijectors.pd import (
            PDVecBijector,
            _pd_logdensity_pallas_diffable,
            _pd_pallas_profitable,
        )
        from ..utils import cholesky_lower

        if want_x or type(bijector) is not PDVecBijector:
            return None
        if not _pd_pallas_profitable(y):
            return None
        if jnp.ndim(self.psi) != 2 or jnp.ndim(self.df) != 0:
            return None
        dtype = jnp.result_type(y, float)
        K = jnp.shape(self.psi)[-1]
        v = jnp.asarray(self.df, dtype)
        Pc = cholesky_lower(jnp.asarray(self.psi, dtype))
        logJ, sumd, tr = _pd_logdensity_pallas_diffable(y, K, Pc, "solve")
        logdetX = 2.0 * sumd
        logdetP = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Pc, axis1=-2, axis2=-1)), -1)
        lp = (
            0.5 * v * logdetP
            - 0.5 * (v + K + 1.0) * logdetX
            - 0.5 * tr
            - 0.5 * v * K * LOG2
            - _mv_lgamma(0.5 * v, K)
        )
        return None, lp + logJ

    def fused_linked_logdensity_t(self, bijector, yT):
        """Transposed-layout (P, B) fusion hook (linked_logdensity_t)."""
        from ..bijectors.pd import (
            PDVecBijector,
            _pd_logdensity_pallas_t,
            _pd_pallas_profitable_t,
        )
        from ..utils import cholesky_lower

        if type(bijector) is not PDVecBijector:
            return None
        if not _pd_pallas_profitable_t(yT):
            return None
        if jnp.ndim(self.psi) != 2 or jnp.ndim(self.df) != 0:
            return None
        dtype = jnp.result_type(yT, float)
        K = jnp.shape(self.psi)[-1]
        v = jnp.asarray(self.df, dtype)
        Pc = cholesky_lower(jnp.asarray(self.psi, dtype))
        logJ, sumd, tr = _pd_logdensity_pallas_t(yT, K, Pc, "solve")
        logdetX = 2.0 * sumd
        logdetP = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Pc, axis1=-2, axis2=-1)), -1)
        lp = (
            0.5 * v * logdetP
            - 0.5 * (v + K + 1.0) * logdetX
            - 0.5 * tr
            - 0.5 * v * K * LOG2
            - _mv_lgamma(0.5 * v, K)
        )
        return lp + logJ

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.df, self.psi, float)
        K = jnp.shape(self.psi)[-1]
        shape = tuple(sample_shape) + self.batch_shape
        Pinv_chol = cholesky_lower(jnp.linalg.inv(jnp.asarray(self.psi, dtype)))
        L = _bartlett_chol(key, self.df, Pinv_chol, K, shape, dtype)
        W = jnp.matmul(L, jnp.swapaxes(L, -1, -2), precision=jax.lax.Precision.HIGHEST)
        return jnp.linalg.inv(W)

    @property
    def support(self):
        return POSITIVE_DEFINITE


@pytree_dataclass(meta_fields=("p",))
class MatrixBeta(Distribution):
    """Matrix Beta distribution MatrixBeta(p, n1, n2) over p x p SPD matrices
    U with I - U also SPD (Gupta & Nagar ch. 5).

    Reference maps it to the PD link (src/transformed_distribution.jl:138-139
    `bijector(::MatrixBeta) = PDVecBijector()`); our structural `pd` support
    kind routes it identically. Like the reference, the link enforces only
    U ≻ 0 — the density's logdet(I - U) term goes NaN/-Inf outside U ≺ I.

      logpdf(U) = ((n1-p-1)/2) logdet U + ((n2-p-1)/2) logdet(I-U)
                  - log B_p(n1/2, n2/2),
      log B_p(a, b) = Γ_p(a) + Γ_p(b) - Γ_p(a+b)  (multivariate log-beta)

    Sampling: S1 ~ Wishart(n1, I), S2 ~ Wishart(n2, I), S = S1 + S2,
    L = chol(S), U = L^-1 S1 L^-T.
    """

    p: int
    n1: jax.Array | float
    n2: jax.Array | float

    event_ndims = 2

    @property
    def event_shape(self):
        return (self.p, self.p)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.n1), jnp.shape(self.n2))

    def _log_norm(self, dtype):
        a = 0.5 * jnp.asarray(self.n1, dtype)
        b = 0.5 * jnp.asarray(self.n2, dtype)
        return _mv_lgamma(a, self.p) + _mv_lgamma(b, self.p) - _mv_lgamma(a + b, self.p)

    def logpdf(self, U):
        dtype = jnp.result_type(U, float)
        p = self.p
        n1 = jnp.asarray(self.n1, dtype)
        n2 = jnp.asarray(self.n2, dtype)
        eye = jnp.eye(p, dtype=dtype)
        # Cholesky-based logdets (f32-TPU friendly; no LU)
        logdetU = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(cholesky_lower(U), axis1=-2, axis2=-1)), -1
        )
        logdetImU = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(cholesky_lower(eye - U), axis1=-2, axis2=-1)), -1
        )
        return (
            0.5 * (n1 - p - 1.0) * logdetU
            + 0.5 * (n2 - p - 1.0) * logdetImU
            - self._log_norm(dtype)
        )

    def logpdf_from_factor(self, L, x=None):
        """Density from the lower Cholesky factor L of U = LL' (the factor
        the PD inverse link computes anyway): logdet U is free; the
        logdet(I-U) term reconstructs U from L when `x` is unavailable."""
        dtype = jnp.result_type(L, float)
        p = self.p
        n1 = jnp.asarray(self.n1, dtype)
        n2 = jnp.asarray(self.n2, dtype)
        eye = jnp.eye(p, dtype=dtype)
        logdetU = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        U = x if x is not None else jnp.matmul(
            L, jnp.swapaxes(L, -1, -2), precision=jax.lax.Precision.HIGHEST
        )
        logdetImU = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(cholesky_lower(eye - U), axis1=-2, axis2=-1)), -1
        )
        return (
            0.5 * (n1 - p - 1.0) * logdetU
            + 0.5 * (n2 - p - 1.0) * logdetImU
            - self._log_norm(dtype)
        )

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.n1, self.n2, float)
        p = self.p
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        eye = jnp.eye(p, dtype=dtype)
        L1 = _bartlett_chol(k1, self.n1, eye, p, shape, dtype)
        L2 = _bartlett_chol(k2, self.n2, eye, p, shape, dtype)
        S1 = jnp.matmul(L1, jnp.swapaxes(L1, -1, -2), precision=jax.lax.Precision.HIGHEST)
        S2 = jnp.matmul(L2, jnp.swapaxes(L2, -1, -2), precision=jax.lax.Precision.HIGHEST)
        L = cholesky_lower(S1 + S2)
        A = jax.scipy.linalg.solve_triangular(L, S1, lower=True)
        U = jax.scipy.linalg.solve_triangular(
            L, jnp.swapaxes(A, -1, -2), lower=True
        )
        # symmetrize against fp drift
        return 0.5 * (U + jnp.swapaxes(U, -1, -2))

    @property
    def support(self):
        return POSITIVE_DEFINITE


@pytree_dataclass(meta_fields=())
class MatrixTDist(Distribution):
    """Matrix t-distribution MT(nu, M, Sigma, Omega) (Gupta & Nagar thm 4.2.1;
    reference test matrix row test/vector/matrix.jl:9). M: (n, p); Sigma:
    (n, n) row scale; Omega: (p, p) column scale. Arises as X | S ~
    MN(M, S, Omega) with S ~ InverseWishart(nu + n - 1, Sigma); identity/ravel
    link (real-matrix support).
    """

    df: jax.Array | float
    loc: jax.Array  # (n, p)
    row_scale: jax.Array  # (n, n) SPD
    col_scale: jax.Array  # (p, p) SPD

    event_ndims = 2

    @property
    def event_shape(self):
        return jnp.shape(self.loc)[-2:]

    @property
    def batch_shape(self):
        return jnp.shape(self.loc)[:-2]

    def logpdf(self, X):
        dtype = jnp.result_type(X, float)
        n, p = (int(s) for s in self.event_shape)
        v = jnp.asarray(self.df, dtype)
        Ls = cholesky_lower(jnp.asarray(self.row_scale, dtype))
        Lo = cholesky_lower(jnp.asarray(self.col_scale, dtype))
        D = X - self.loc
        # A = Ls^{-1} D Lo^{-T}: |I + Sigma^{-1} D Omega^{-1} D'| = |I + A A'|
        batch = jnp.shape(D)[:-2]
        Ls_b = jnp.broadcast_to(Ls, batch + (n, n))
        Lo_b = jnp.broadcast_to(Lo, batch + (p, p))
        A = jax.scipy.linalg.solve_triangular(Ls_b, D, lower=True)
        A = jnp.swapaxes(
            jax.scipy.linalg.solve_triangular(Lo_b, jnp.swapaxes(A, -1, -2), lower=True),
            -1,
            -2,
        )
        G = jnp.eye(n, dtype=dtype) + jnp.matmul(A, jnp.swapaxes(A, -1, -2), precision=jax.lax.Precision.HIGHEST)
        Lg = cholesky_lower(G)
        logdet_G = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lg, axis1=-2, axis2=-1)), -1)
        logdet_S = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ls, axis1=-2, axis2=-1)), -1)
        logdet_O = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lo, axis1=-2, axis2=-1)), -1)
        a = 0.5 * (v + n + p - 1.0)
        b = 0.5 * (v + n - 1.0)
        return (
            _mv_lgamma(a, n)
            - _mv_lgamma(b, n)
            - 0.5 * n * p * LOGPI
            - 0.5 * p * logdet_S
            - 0.5 * n * logdet_O
            - a * logdet_G
        )

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.df, self.loc, float)
        n, p = (int(s) for s in self.event_shape)
        ks, kz = jax.random.split(key)
        v = jnp.asarray(self.df, dtype)
        S = InverseWishart(v + n - 1.0, jnp.asarray(self.row_scale, dtype)).sample(
            ks, sample_shape
        )
        Lsamp = cholesky_lower(S)
        Lo = cholesky_lower(jnp.asarray(self.col_scale, dtype))
        Z = jax.random.normal(kz, tuple(sample_shape) + self.batch_shape + (n, p), dtype)
        with jax.default_matmul_precision("highest"):
            return self.loc + Lsamp @ Z @ jnp.swapaxes(Lo, -1, -2)

    @property
    def support(self):
        from .base import Support

        return Support("real_matrix")
