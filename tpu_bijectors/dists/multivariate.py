"""Multivariate (vector-event) distributions.

Counterparts of the Distributions.jl families the reference's registry and
vectorize layers dispatch on (SURVEY.md §2.7): Dirichlet, MvNormal (+diag),
MvLogNormal, MvLogitNormal, MvTDist.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from ..tree import pytree_dataclass
from .base import REAL_VECTOR, SIMPLEX, Distribution, Support

LOG2PI = math.log(2.0 * math.pi)
LOGPI = math.log(math.pi)


@pytree_dataclass
class Dirichlet(Distribution):
    """Dirichlet(alpha); support = interior of the simplex."""

    alpha: jax.Array

    event_ndims = 1

    @property
    def event_shape(self):
        return (jnp.shape(self.alpha)[-1],)

    @property
    def batch_shape(self):
        return jnp.shape(self.alpha)[:-1]

    def logpdf(self, x):
        a = jnp.asarray(self.alpha, jnp.result_type(x, float))
        lognorm = jnp.sum(jsp.gammaln(a), -1) - jsp.gammaln(jnp.sum(a, -1))
        return jnp.sum((a - 1.0) * jnp.log(x), -1) - lognorm

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Leaf-fusion hook (vectorize.core): when the link is the simplex
        bijector on a Pallas-eligible batch, the density's weighted log term
        is accumulated inside the single-pass inverse kernel. alpha may be
        concrete OR a jit argument (it rides into the kernel as an operand —
        the params-as-jit-arguments style docs/vector.md recommends keeps
        the fusion). want_x=False (the linked_logdensity path) skips the
        kernel's x output write entirely. Returns (x_or_None,
        logpdf + logdetJ) or None to decline."""
        from ..bijectors.simplex import (
            SimplexBijector,
            _pallas_profitable,
            _simplex_inverse_logdet_wlog_jnp,
            simplex_inverse_logdet_wlog,
            simplex_logdet_wlog_nox,
        )

        if type(bijector) is not SimplexBijector:
            return None
        if jnp.ndim(self.alpha) != 1:
            return None  # batched alpha: generic broadcasting path
        dtype = jnp.result_type(y, float)
        a = jnp.asarray(self.alpha, dtype)
        lognorm = jnp.sum(jsp.gammaln(a)) - jsp.gammaln(jnp.sum(a))
        if not _pallas_profitable(y):
            # jnp composition with the same eps-nudged weighted-log term
            # (the reference's logpdf_with_trans Dirichlet nudge,
            # src/Bijectors.jl:253): the linked density stays finite at
            # 1e10 jumps on EVERY configuration, not just kernel shapes
            x, ld, wlog = _simplex_inverse_logdet_wlog_jnp(y, a - 1.0)
            return (x if want_x else None), wlog - lognorm + ld
        if want_x:
            x, ld, wlog = simplex_inverse_logdet_wlog(y, a - 1.0)
            return x, wlog - lognorm + ld
        ld, wlog = simplex_logdet_wlog_nox(y, a - 1.0)
        return None, wlog - lognorm + ld

    def fused_linked_logdensity_t(self, bijector, yT):
        """Transposed-layout fusion hook (vectorize.core linked_logdensity_t):
        yT is (K-1, B) — the kernel's native orientation, no HBM relayout."""
        from ..bijectors.simplex import (
            SimplexBijector,
            _pallas_profitable_t,
            simplex_logdet_wlog_nox_t,
        )

        if type(bijector) is not SimplexBijector or not _pallas_profitable_t(yT):
            return None
        if jnp.ndim(self.alpha) != 1:
            return None
        dtype = jnp.result_type(yT, float)
        a = jnp.asarray(self.alpha, dtype)
        lognorm = jnp.sum(jsp.gammaln(a)) - jsp.gammaln(jnp.sum(a))
        ld, wlog = simplex_logdet_wlog_nox_t(yT, a - 1.0)
        return wlog - lognorm + ld

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.alpha, float)
        return jax.random.dirichlet(key, self.alpha, shape, dtype)

    @property
    def support(self):
        return SIMPLEX


@pytree_dataclass
class MvLogitNormal(Distribution):
    """softmax([y; 0]) of a MvNormal y — simplex-supported
    (reference: src/vector/multivariate/simplex.jl maps it to SimplexBijector)."""

    loc: jax.Array
    scale_tril: jax.Array

    event_ndims = 1

    @property
    def event_shape(self):
        return (jnp.shape(self.loc)[-1] + 1,)

    @property
    def batch_shape(self):
        return jnp.shape(self.loc)[:-1]

    def logpdf(self, x):
        # y_i = log(x_i / x_K), i = 1..K-1
        y = jnp.log(x[..., :-1]) - jnp.log(x[..., -1:])
        base = MvNormalTril(self.loc, self.scale_tril)
        return base.logpdf(y) - jnp.sum(jnp.log(x), -1)

    def sample(self, key, sample_shape=()):
        y = MvNormalTril(self.loc, self.scale_tril).sample(key, sample_shape)
        z = jnp.concatenate([y, jnp.zeros_like(y[..., :1])], -1)
        return jax.nn.softmax(z, axis=-1)

    @property
    def support(self):
        return SIMPLEX


@pytree_dataclass
class MvNormalDiag(Distribution):
    loc: jax.Array
    scale_diag: jax.Array

    event_ndims = 1

    @property
    def event_shape(self):
        return (jnp.shape(self.loc)[-1],)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.loc)[:-1], jnp.shape(self.scale_diag)[:-1]
        )

    def logpdf(self, x):
        z = (x - self.loc) / self.scale_diag
        d = jnp.shape(self.loc)[-1]
        return (
            -0.5 * jnp.sum(z * z, -1)
            - 0.5 * d * LOG2PI
            - jnp.sum(jnp.log(jnp.asarray(self.scale_diag, z.dtype)), -1)
        )

    def fused_linked_logdensity_t(self, bijector, yT):
        """Transposed-layout identity-link density (vectorize.core hook):
        the linked density IS the logpdf; evaluating it on (K, B) directly
        avoids the generic fallback's swapaxes HBM relayout."""
        from ..bijectors.base import Block, Identity

        if not (
            type(bijector) is Block
            and bijector.ndims == 1
            and type(bijector.bijector) is Identity
        ):
            return None
        return _mvdiag_logpdf_t(self.loc, self.scale_diag, yT)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        dtype = jnp.result_type(self.loc, self.scale_diag, float)
        return self.loc + self.scale_diag * jax.random.normal(key, shape, dtype)

    @property
    def support(self):
        return REAL_VECTOR


def _mvdiag_logpdf_t(loc, scale_diag, yT):
    """Diagonal-normal density of transposed (K, B) state; None if loc is
    batched (the caller falls back to the broadcasting path)."""
    if jnp.ndim(loc) != 1:
        return None
    dtype = jnp.result_type(yT, float)
    K = jnp.shape(loc)[-1]
    mu = jnp.asarray(loc, dtype)[:, None]
    sig = jnp.broadcast_to(jnp.asarray(scale_diag, dtype), (K,))[:, None]
    z = (yT - mu) / sig
    return -0.5 * jnp.sum(z * z, 0) - 0.5 * K * LOG2PI - jnp.sum(jnp.log(sig))


@pytree_dataclass
class MvNormalTril(Distribution):
    """MvNormal parameterized by lower-triangular scale (cholesky of cov)."""

    loc: jax.Array
    scale_tril: jax.Array

    event_ndims = 1

    @property
    def event_shape(self):
        return (jnp.shape(self.loc)[-1],)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.loc)[:-1], jnp.shape(self.scale_tril)[:-2]
        )

    def logpdf(self, x):
        L = jnp.tril(self.scale_tril)
        d = jnp.shape(self.loc)[-1]
        r = (x - self.loc)[..., None]
        Lb = jnp.broadcast_to(L, r.shape[:-2] + L.shape[-2:])
        z = jax.scipy.linalg.solve_triangular(Lb, r, lower=True)[..., 0]
        halflogdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        return -0.5 * (jnp.sum(z * z, -1) + d * LOG2PI) - halflogdet

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        dtype = jnp.result_type(self.loc, self.scale_tril, float)
        eps = jax.random.normal(key, shape, dtype)
        return self.loc + jnp.einsum("...ij,...j->...i", jnp.tril(self.scale_tril), eps)

    @property
    def support(self):
        return REAL_VECTOR


def MvNormal(loc, cov=None, *, scale_tril=None, scale_diag=None):
    """Convenience constructor mirroring Distributions.jl's MvNormal arities."""
    if scale_tril is not None:
        return MvNormalTril(loc, scale_tril)
    if scale_diag is not None:
        return MvNormalDiag(loc, scale_diag)
    if cov is None:
        return MvNormalDiag(loc, jnp.ones_like(loc))
    cov = jnp.asarray(cov)
    if cov.ndim >= 2:
        return MvNormalTril(loc, jnp.linalg.cholesky(cov))
    return MvNormalDiag(loc, jnp.sqrt(cov))


@pytree_dataclass
class MvLogNormal(Distribution):
    """exp() of an MvNormal; positive-orthant support -> elementwise Log link
    (reference src/vector/multivariate/mvlognormal.jl)."""

    loc: jax.Array
    scale_diag: jax.Array

    event_ndims = 1

    @property
    def event_shape(self):
        return (jnp.shape(self.loc)[-1],)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(
            jnp.shape(self.loc)[:-1], jnp.shape(self.scale_diag)[:-1]
        )

    def logpdf(self, x):
        lx = jnp.log(x)
        base = MvNormalDiag(self.loc, self.scale_diag)
        return base.logpdf(lx) - jnp.sum(lx, -1)

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped linked density (vectorize.core hook): under the
        elementwise log link, logpdf(e^v) + sum v cancels the base's
        -sum log x Jacobian exactly — the linked density IS the underlying
        MvNormalDiag density of v. Finite at |v| ~ 1e10 where exp(v)
        over/underflows and the generic composition returns NaN (see
        LogNormal.fused_linked_logdensity)."""
        from ..bijectors.base import Block
        from .univariate import _is_log_link

        if not (
            type(bijector) is Block
            and bijector.ndims == 1
            and _is_log_link(bijector.bijector)
        ):
            return None
        lp = MvNormalDiag(self.loc, self.scale_diag).logpdf(y)
        return (jnp.exp(y) if want_x else None), lp

    def fused_linked_logdensity_t(self, bijector, yT):
        """Transposed-layout variant: yT is (K, B); telescopes to the base
        diagonal normal (shared `_mvdiag_logpdf_t` closed form)."""
        from ..bijectors.base import Block
        from .univariate import _is_log_link

        if not (
            type(bijector) is Block
            and bijector.ndims == 1
            and _is_log_link(bijector.bijector)
        ):
            return None
        return _mvdiag_logpdf_t(self.loc, self.scale_diag, yT)

    def sample(self, key, sample_shape=()):
        return jnp.exp(MvNormalDiag(self.loc, self.scale_diag).sample(key, sample_shape))

    @property
    def support(self):
        return Support("interval", 0.0, math.inf, True, False)


@pytree_dataclass
class MvStudentT(Distribution):
    """Multivariate t (identity link, like MvTDist in the reference registry)."""

    df: jax.Array | float
    loc: jax.Array
    scale_tril: jax.Array

    event_ndims = 1

    @property
    def event_shape(self):
        return (jnp.shape(self.loc)[-1],)

    @property
    def batch_shape(self):
        return jnp.shape(self.loc)[:-1]

    def logpdf(self, x):
        d = jnp.shape(self.loc)[-1]
        v = jnp.asarray(self.df, jnp.result_type(x, float))
        L = jnp.tril(self.scale_tril)
        r = (x - self.loc)[..., None]
        Lb = jnp.broadcast_to(L, r.shape[:-2] + L.shape[-2:])
        z = jax.scipy.linalg.solve_triangular(Lb, r, lower=True)[..., 0]
        q = jnp.sum(z * z, -1)
        halflogdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        return (
            jsp.gammaln(0.5 * (v + d))
            - jsp.gammaln(0.5 * v)
            - 0.5 * d * (jnp.log(v) + LOGPI)
            - halflogdet
            - 0.5 * (v + d) * jnp.log1p(q / v)
        )

    def sample(self, key, sample_shape=()):
        kn, kg = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.df, self.loc, float)
        eps = jax.random.normal(kn, shape + self.event_shape, dtype)
        g = jax.random.gamma(kg, 0.5 * jnp.asarray(self.df, dtype), shape, dtype)
        w = jnp.sqrt(0.5 * jnp.asarray(self.df, dtype) / g)[..., None]
        return self.loc + w * jnp.einsum(
            "...ij,...j->...i", jnp.tril(self.scale_tril), eps
        )

    @property
    def support(self):
        return REAL_VECTOR


@pytree_dataclass
class MvNormalCanon(Distribution):
    """Canonical (precision) parametrization: potential h, precision J;
    mean = J^{-1} h (reference test matrix row, test/vector/multivariate.jl:4)."""

    h: jax.Array  # (d,)
    prec: jax.Array  # (d, d) SPD

    event_ndims = 1

    @property
    def event_shape(self):
        return (jnp.shape(self.h)[-1],)

    @property
    def batch_shape(self):
        return jnp.shape(self.h)[:-1]

    def _chol(self):
        from ..utils import cholesky_lower

        return cholesky_lower(jnp.asarray(self.prec))

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        d = jnp.shape(self.h)[-1]
        L = self._chol().astype(dtype)  # J = L L'
        mu = jax.scipy.linalg.cho_solve((L, True), jnp.asarray(self.h, dtype))
        r = x - mu
        # r' J r = ||L' r||^2
        z = jnp.einsum("...ji,...j->...i", L, r)
        halflogdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        return -0.5 * (jnp.sum(z * z, -1) + d * LOG2PI) + halflogdet

    def sample(self, key, sample_shape=()):
        dtype = jnp.result_type(self.h, self.prec, float)
        d = jnp.shape(self.h)[-1]
        L = self._chol().astype(dtype)
        mu = jax.scipy.linalg.cho_solve((L, True), jnp.asarray(self.h, dtype))
        shape = tuple(sample_shape) + self.batch_shape + (d,)
        eps = jax.random.normal(key, shape, dtype)
        # x = mu + L'^{-1} eps  has covariance J^{-1}
        Lt = jnp.broadcast_to(jnp.swapaxes(L, -1, -2), shape[:-1] + (d, d))
        z = jax.scipy.linalg.solve_triangular(Lt, eps[..., None], lower=False)[..., 0]
        return mu + z

    @property
    def support(self):
        return REAL_VECTOR


@pytree_dataclass(meta_fields=("n",))
class Multinomial(Distribution):
    """Multinomial(n, p) — discrete simplex counts; identity link
    (reference test/vector/multivariate.jl:2)."""

    n: int
    p: jax.Array  # (K,)

    event_ndims = 1

    @property
    def event_shape(self):
        return (jnp.shape(self.p)[-1],)

    @property
    def batch_shape(self):
        return jnp.shape(self.p)[:-1]

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        x = jnp.asarray(x, dtype)
        p = jnp.asarray(self.p, dtype)
        lp = (
            jsp.gammaln(self.n + 1.0)
            - jnp.sum(jsp.gammaln(x + 1.0), -1)
            + jnp.sum(jsp.xlogy(x, p), -1)  # 0*log(0) = 0 for empty categories
        )
        valid = jnp.sum(x, -1) == self.n
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key, sample_shape=()):
        # sequential conditional binomials over the (static) K categories
        K = int(jnp.shape(self.p)[-1])
        shape = tuple(sample_shape) + self.batch_shape
        p = jnp.asarray(self.p)
        rest = jnp.cumsum(p[..., ::-1], -1)[..., ::-1]  # tail sums
        keys = jax.random.split(key, K - 1)
        counts = []
        remaining = jnp.full(shape, self.n, jnp.int32)
        for k in range(K - 1):
            frac = jnp.clip(p[..., k] / jnp.maximum(rest[..., k], 1e-30), 0.0, 1.0)
            c = jax.random.binomial(keys[k], remaining, frac).astype(jnp.int32)
            counts.append(c)
            remaining = remaining - c
        counts.append(remaining)
        return jnp.stack(counts, axis=-1)

    @property
    def support(self):
        from .base import DISCRETE

        return DISCRETE
