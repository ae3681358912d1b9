"""Distribution wrappers: Reshaped, Censored, Mixture, order statistics,
MatrixNormal — the remaining families the reference's registry/test matrix
covers (SURVEY.md §2.7, test/vector/univariate.jl's censored/affine/mixture
rows, src/vector/reshaped/, src/vector/order/)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

from ..tree import pytree_dataclass
from .base import Distribution, Support
from .multivariate import MvNormalDiag

LOG2PI = math.log(2.0 * math.pi)


@pytree_dataclass(meta_fields=("shape",))
class Reshaped(Distribution):
    """Reshape a distribution's event (reference ReshapedDistribution;
    registry composes inverse(Reshape) ∘ b ∘ Reshape,
    src/transformed_distribution.jl:144-149)."""

    base: Distribution
    shape: tuple

    def __post_init__(self):
        base_n = int(np.prod([int(s) for s in self.base.event_shape]))
        new_n = int(np.prod(self.shape))
        if base_n != new_n:
            raise ValueError(f"cannot reshape event {self.base.event_shape} -> {self.shape}")

    @property
    def event_ndims(self):  # type: ignore[override]
        return len(self.shape)

    @property
    def event_shape(self):
        return tuple(self.shape)

    @property
    def batch_shape(self):
        return self.base.batch_shape

    def _to_base(self, x):
        batch = x.shape[: x.ndim - len(self.shape)]
        return jnp.reshape(x, batch + tuple(int(s) for s in self.base.event_shape))

    def logpdf(self, x):
        return self.base.logpdf(self._to_base(x))

    def sample(self, key, sample_shape=()):
        x = self.base.sample(key, sample_shape)
        batch = x.shape[: x.ndim - self.base.event_ndims]
        return jnp.reshape(x, batch + tuple(self.shape))

    @property
    def support(self):
        return Support("reshaped")


@pytree_dataclass(meta_fields=("lower", "upper"))
class Censored(Distribution):
    """censored(base; lower, upper): values outside the bounds collapse to
    point masses at the bounds. logpdf is the mixed density: the base pdf in
    the interior, log CDF mass at the bounds."""

    base: Distribution
    lower: float = -math.inf
    upper: float = math.inf

    def logpdf(self, x):
        lp = self.base.logpdf(x)
        if math.isfinite(self.lower):
            at_lo = x <= self.lower
            lp = jnp.where(at_lo, jnp.log(self.base.cdf(jnp.asarray(self.lower))), lp)
        if math.isfinite(self.upper):
            at_hi = x >= self.upper
            lp = jnp.where(
                at_hi, jnp.log1p(-self.base.cdf(jnp.asarray(self.upper))), lp
            )
        return lp

    def sample(self, key, sample_shape=()):
        x = self.base.sample(key, sample_shape)
        return jnp.clip(x, self.lower, self.upper)

    def cdf(self, x):
        F = self.base.cdf(jnp.clip(x, self.lower, self.upper))
        if math.isfinite(self.lower):
            F = jnp.where(x < self.lower, 0.0, F)
        if math.isfinite(self.upper):
            F = jnp.where(x >= self.upper, 1.0, F)
        return F

    @property
    def support(self):
        base_s = self.base.support
        lo = self.lower if math.isfinite(self.lower) else base_s.lower
        hi = self.upper if math.isfinite(self.upper) else base_s.upper

        def _fin(v):
            return isinstance(v, (int, float)) and math.isfinite(v)

        return Support("interval", lo, hi, _fin(lo) or base_s.lower_finite,
                       _fin(hi) or base_s.upper_finite)


@pytree_dataclass
class Mixture(Distribution):
    """Finite mixture of a batched component family: `components` carries the
    K parameter sets in its leading parameter axis; `log_weights` (K,).

    logpdf = logsumexp_k [ log w_k + logpdf_k(x) ] — one fused VPU reduction.
    """

    components: Distribution  # batched: batch_shape == (K,)
    log_weights: jax.Array

    @property
    def event_ndims(self):  # type: ignore[override]
        return self.components.event_ndims

    @property
    def event_shape(self):
        return self.components.event_shape

    def logpdf(self, x):
        lw = jax.nn.log_softmax(self.log_weights)
        lp = self.components.logpdf(jnp.asarray(x)[..., None])  # (..., K)
        return jsp.logsumexp(lw + lp, axis=-1)

    def sample(self, key, sample_shape=()):
        kc, ks = jax.random.split(key)
        shape = tuple(sample_shape)
        comp = jax.random.categorical(kc, self.log_weights, shape=shape)
        all_draws = self.components.sample(ks, shape)  # shape + (K,)
        return jnp.take_along_axis(all_draws, comp[..., None], axis=-1)[..., 0]

    def cdf(self, x):
        w = jax.nn.softmax(self.log_weights)
        F = self.components.cdf(jnp.asarray(x)[..., None])  # (..., K)
        return jnp.sum(w * F, axis=-1)

    @property
    def support(self):
        return self.components.support


@pytree_dataclass(meta_fields=("n", "rank"))
class OrderStatistic(Distribution):
    """rank-th order statistic of n iid draws from a scalar base
    (reference src/vector/order/order.jl:3-8: bijector delegates to base)."""

    base: Distribution
    n: int
    rank: int  # 1-based

    def logpdf(self, x):
        n, r = self.n, self.rank
        F = jnp.clip(self.base.cdf(x), 1e-300, 1.0)
        logc = (
            jsp.gammaln(n + 1.0) - jsp.gammaln(float(r)) - jsp.gammaln(n - r + 1.0)
        )
        return (
            logc
            + (r - 1.0) * jnp.log(F)
            + (n - r) * jnp.log1p(-F)
            + self.base.logpdf(x)
        )

    def sample(self, key, sample_shape=()):
        draws = self.base.sample(key, tuple(sample_shape) + (self.n,))
        s = jnp.sort(draws, axis=-1)
        return s[..., self.rank - 1]

    def cdf(self, x):
        # F_(r)(x) = I_{F(x)}(r, n - r + 1) (regularized incomplete beta)
        F = self.base.cdf(x)
        r = float(self.rank)
        return jsp.betainc(r, self.n - r + 1.0, F)

    @property
    def support(self):
        return self.base.support


@pytree_dataclass(meta_fields=("n",))
class JointOrderStatistics(Distribution):
    """All n order statistics jointly: support = sorted vectors in base
    support; logpdf = log n! + sum logpdf (on the sorted set)
    (reference src/vector/order/order.jl:14-76)."""

    base: Distribution
    n: int

    event_ndims = 1

    @property
    def event_shape(self):
        return (self.n,)

    def logpdf(self, x):
        lp = jsp.gammaln(self.n + 1.0) + jnp.sum(self.base.logpdf(x), axis=-1)
        is_sorted = jnp.all(x[..., 1:] >= x[..., :-1], axis=-1)
        return jnp.where(is_sorted, lp, -jnp.inf)

    def sample(self, key, sample_shape=()):
        draws = self.base.sample(key, tuple(sample_shape) + (self.n,))
        return jnp.sort(draws, axis=-1)

    @property
    def support(self):
        return Support("joint_order")  # handled in the registry


@pytree_dataclass
class MatrixNormal(Distribution):
    """Matrix normal MN(M, U, V) with U, V given as cholesky factors
    (identity/ravel link in the registry, reference src/vector/matrix/normal.jl)."""

    loc: jax.Array  # (n, p)
    row_chol: jax.Array  # (n, n) lower
    col_chol: jax.Array  # (p, p) lower

    event_ndims = 2

    @property
    def event_shape(self):
        return jnp.shape(self.loc)[-2:]

    @property
    def batch_shape(self):
        return jnp.shape(self.loc)[:-2]

    def logpdf(self, X):
        n, p = self.event_shape
        Lu = jnp.tril(self.row_chol)
        Lv = jnp.tril(self.col_chol)
        D = X - self.loc
        Lu_b = jnp.broadcast_to(Lu, D.shape[:-2] + Lu.shape[-2:])
        A = jax.scipy.linalg.solve_triangular(Lu_b, D, lower=True)
        At = jnp.swapaxes(A, -1, -2)
        Lv_b = jnp.broadcast_to(Lv, At.shape[:-2] + Lv.shape[-2:])
        B = jax.scipy.linalg.solve_triangular(Lv_b, At, lower=True)
        quad = jnp.sum(B * B, axis=(-2, -1))
        logdet_u = jnp.sum(jnp.log(jnp.diagonal(Lu, axis1=-2, axis2=-1)), -1)
        logdet_v = jnp.sum(jnp.log(jnp.diagonal(Lv, axis1=-2, axis2=-1)), -1)
        return -0.5 * (quad + n * p * LOG2PI) - p * logdet_u - n * logdet_v

    def sample(self, key, sample_shape=()):
        n, p = self.event_shape
        shape = tuple(sample_shape) + self.batch_shape + (n, p)
        dtype = jnp.result_type(self.loc, float)
        Z = jax.random.normal(key, shape, dtype)
        with jax.default_matmul_precision("highest"):
            return self.loc + jnp.tril(self.row_chol) @ Z @ jnp.tril(self.col_chol).T

    @property
    def support(self):
        return Support("real_matrix")


@pytree_dataclass
class HeterogeneousMixture(Distribution):
    """Finite mixture of DIFFERENT scalar families (the reference's
    heterogeneous MixtureModel rows, test/vector/univariate.jl:96-99):
    components is a tuple of scalar-event distributions, log_weights (K,).

    logpdf = logsumexp_k [log w_k + logpdf_k(x)] with the component loop
    unrolled at trace time (K is structural)."""

    components: tuple
    log_weights: jax.Array

    def __post_init__(self):
        for c in self.components:
            if c.event_ndims != 0:
                raise ValueError("HeterogeneousMixture needs scalar-event components")

    @staticmethod
    def _interior_point(s):
        if s.lower_finite and s.upper_finite:
            return 0.5 * (s.lower + s.upper)
        if s.lower_finite:
            return s.lower + 1.0
        if s.upper_finite:
            return s.upper - 1.0
        return 0.0

    def logpdf(self, x):
        lw = jax.nn.log_softmax(jnp.asarray(self.log_weights))
        # components contribute ZERO density outside their own support — the
        # mixture's support hull is wider than each component's, so an
        # unmasked Exponential.logpdf at x<0 would contribute garbage.
        # Double-where: evaluate each component at an interior point where
        # masked so out-of-support NaNs never reach forward OR backward pass.
        parts = []
        for c in self.components:
            ok = c.in_support(x)
            x_safe = jnp.where(ok, x, self._interior_point(c.support))
            parts.append(jnp.where(ok, c.logpdf(x_safe), -jnp.inf))
        return jsp.logsumexp(lw + jnp.stack(parts, axis=-1), axis=-1)

    def sample(self, key, sample_shape=()):
        kc, ks = jax.random.split(key)
        shape = tuple(sample_shape)
        comp = jax.random.categorical(kc, jnp.asarray(self.log_weights), shape=shape)
        draws = jnp.stack(
            [c.sample(k, shape) for c, k in zip(self.components, jax.random.split(ks, len(self.components)))],
            axis=-1,
        )
        return jnp.take_along_axis(draws, comp[..., None], axis=-1)[..., 0]

    def cdf(self, x):
        w = jax.nn.softmax(self.log_weights)
        Fs = [c.cdf(x) for c in self.components]
        return sum(wi * Fi for wi, Fi in zip(w, Fs))

    @property
    def support(self):
        # hull of the component supports (reference: minimum/maximum of the
        # mixture = extrema over components)
        import math as _math

        los, his, lfs, ufs = [], [], [], []
        for c in self.components:
            s = c.support
            if s.kind != "interval":
                raise ValueError("mixture components must have interval support")
            los.append(s.lower if s.lower_finite else -_math.inf)
            his.append(s.upper if s.upper_finite else _math.inf)
            lfs.append(s.lower_finite)
            ufs.append(s.upper_finite)
        lo = min(los) if all(lfs) else -_math.inf
        hi = max(his) if all(ufs) else _math.inf
        return Support(
            "interval", lo, hi, all(lfs) and _math.isfinite(lo), all(ufs) and _math.isfinite(hi)
        )
