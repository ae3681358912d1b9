"""Univariate distribution families.

Replaces the slice of Distributions.jl that the reference's registry and test
matrix exercise (see SURVEY.md §2.7 and /root/reference/test/vector/
univariate.jl's family list). All are scalar-event (event_ndims 0) pytree
dataclasses; parameters broadcast; everything is jit/vmap/grad-friendly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from ..tree import pytree_dataclass
from .base import (
    DISCRETE,
    Distribution,
    Support,
    interval,
    lower_bounded,
    positive,
    real_line,
    unit_interval,
    upper_bounded,
)

LOG2PI = math.log(2.0 * math.pi)
LOG2 = math.log(2.0)
LOGPI = math.log(math.pi)


def _f(d, *xs):
    dtype = jnp.result_type(*xs, *jax.tree_util.tree_leaves(d), float)
    return [jnp.asarray(x, dtype) for x in xs] + [dtype]



def _is_log_link(b) -> bool:
    """True when the registry link is mathematically x -> log(x): either the
    Log bijector or the lower-only Truncated(0, inf) branch the positive
    Support resolves to (y = log(x - 0), truncated.jl:35).

    Callers type-match the DISTRIBUTION first (LogNormal/Gamma/...), whose
    support lower bound is 0 by construction, so when the bound rides as a
    traced jit argument (params-as-jit-args style, or inside a custom_jvp
    trace) the meta flags alone are trusted — declining there would
    silently disable the telescoped hooks exactly in the recommended
    calling style."""
    from ..bijectors.scalar import Log, Truncated

    if type(b) is Log:
        return True
    if type(b) is Truncated and b.lower_finite and not b.upper_finite:
        try:
            return float(b.lb) == 0.0
        except Exception:  # traced bound (see docstring)
            return True
    return False


def _is_interval_logit_link(b, lo, hi) -> bool:
    """True when the registry link is the logit-rescale over (lo, hi): the
    Logit(lo, hi) bijector or the both-finite Truncated(lo, hi) branch
    (y = logit((x-lo)/(hi-lo)), reference truncated.jl:20-31). Same
    traced-bound trust rule as _is_log_link: callers type-match the
    distribution first, whose support IS (lo, hi) by construction."""
    from ..bijectors.scalar import Logit, Truncated

    if type(b) is Logit:
        a, c = b.a, b.b
    elif type(b) is Truncated and b.lower_finite and b.upper_finite:
        a, c = b.lb, b.ub
    else:
        return False
    try:
        return float(a) == float(lo) and float(c) == float(hi)
    except Exception:  # traced bounds (see _is_log_link docstring)
        return True


def _is_shifted_log_link(b, lo) -> bool:
    """True when the registry link is y = log(x - lo) (the lower-only
    Truncated branch, reference truncated.jl:35, for lower-bounded supports
    like Pareto/Levy — reference src/transformed_distribution.jl:135). Same
    traced-bound trust rule as _is_log_link."""
    from ..bijectors.scalar import Truncated

    if not (type(b) is Truncated and b.lower_finite and not b.upper_finite):
        return False
    try:
        return float(b.lb) == float(lo)
    except Exception:  # traced bound (see _is_log_link docstring)
        return True


# ---------------------------------------------------------------------------
# Real line
# ---------------------------------------------------------------------------


@pytree_dataclass
class Normal(Distribution):
    loc: jax.Array | float = 0.0
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return -0.5 * (z * z + LOG2PI) - jnp.log(jnp.asarray(self.scale, z.dtype))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, float)
        return self.loc + self.scale * jax.random.normal(key, shape, dtype)

    def cdf(self, x):
        return jsp.ndtr((x - self.loc) / self.scale)

    def quantile(self, q):
        return self.loc + self.scale * jsp.ndtri(q)

    @property
    def support(self):
        return real_line()


@pytree_dataclass
class Cauchy(Distribution):
    loc: jax.Array | float = 0.0
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return -LOGPI - jnp.log(jnp.asarray(self.scale, z.dtype)) - jnp.log1p(z * z)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, float)
        return self.loc + self.scale * jax.random.cauchy(key, shape, dtype)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        return jnp.arctan(z) / math.pi + 0.5

    def quantile(self, q):
        return self.loc + self.scale * jnp.tan(math.pi * (q - 0.5))


@pytree_dataclass
class Laplace(Distribution):
    loc: jax.Array | float = 0.0
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        z = jnp.abs(x - self.loc) / self.scale
        return -z - LOG2 - jnp.log(jnp.asarray(self.scale, z.dtype))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, float)
        return self.loc + self.scale * jax.random.laplace(key, shape, dtype)

    def cdf(self, x):
        z = (x - self.loc) / self.scale
        return jnp.where(z < 0, 0.5 * jnp.exp(z), 1.0 - 0.5 * jnp.exp(-z))

    def quantile(self, q):
        # branch via where (not sign/abs) so AD at q = 0.5 gets the correct
        # one-sided derivative 2·scale instead of a kink-zero
        lo = jnp.log(2.0 * q)
        hi = -jnp.log(2.0 * (1.0 - q))
        return self.loc + self.scale * jnp.where(q < 0.5, lo, hi)


@pytree_dataclass
class Logistic(Distribution):
    loc: jax.Array | float = 0.0
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return -z - 2.0 * jax.nn.softplus(-z) - jnp.log(jnp.asarray(self.scale, z.dtype))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, float)
        return self.loc + self.scale * jax.random.logistic(key, shape, dtype)

    def cdf(self, x):
        return jax.nn.sigmoid((x - self.loc) / self.scale)

    def quantile(self, q):
        return self.loc + self.scale * (jnp.log(q) - jnp.log1p(-q))


@pytree_dataclass
class StudentT(Distribution):
    """TDist(ν) with optional loc/scale; registry maps it to identity
    (reference src/transformed_distribution.jl:117-121)."""

    df: jax.Array | float = 1.0
    loc: jax.Array | float = 0.0
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        v = jnp.asarray(self.df, jnp.result_type(x, float))
        z = (x - self.loc) / self.scale
        lognorm = (
            jsp.gammaln(0.5 * (v + 1.0))
            - jsp.gammaln(0.5 * v)
            - 0.5 * (jnp.log(v) + LOGPI)
        )
        return (
            lognorm
            - 0.5 * (v + 1.0) * jnp.log1p(z * z / v)
            - jnp.log(jnp.asarray(self.scale, z.dtype))
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.df, self.loc, self.scale, float)
        return self.loc + self.scale * jax.random.t(key, self.df, shape, dtype)

    def cdf(self, x):
        v = jnp.asarray(self.df, jnp.result_type(x, float))
        z = (x - self.loc) / self.scale
        ib = jsp.betainc(0.5 * v, 0.5, v / (v + z * z))
        return jnp.where(z >= 0, 1.0 - 0.5 * ib, 0.5 * ib)


@pytree_dataclass
class Gumbel(Distribution):
    loc: jax.Array | float = 0.0
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return -(z + jnp.exp(-z)) - jnp.log(jnp.asarray(self.scale, z.dtype))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, float)
        return self.loc + self.scale * jax.random.gumbel(key, shape, dtype)

    def cdf(self, x):
        return jnp.exp(-jnp.exp(-(x - self.loc) / self.scale))

    def quantile(self, q):
        return self.loc - self.scale * jnp.log(-jnp.log(q))


@pytree_dataclass
class SkewNormal(Distribution):
    loc: jax.Array | float = 0.0
    scale: jax.Array | float = 1.0
    shape_: jax.Array | float = 0.0

    def logpdf(self, x):
        z = (x - self.loc) / self.scale
        return (
            LOG2
            - 0.5 * (z * z + LOG2PI)
            + jsp.log_ndtr(self.shape_ * z)
            - jnp.log(jnp.asarray(self.scale, z.dtype))
        )

    def sample(self, key, sample_shape=()):
        # Azzalini representation: X = δ|Z0| + sqrt(1-δ²) Z1
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, self.shape_, float)
        k0, k1 = jax.random.split(key)
        a = jnp.asarray(self.shape_, dtype)
        delta = a / jnp.sqrt(1.0 + a * a)
        z0 = jnp.abs(jax.random.normal(k0, shape, dtype))
        z1 = jax.random.normal(k1, shape, dtype)
        return self.loc + self.scale * (delta * z0 + jnp.sqrt(1.0 - delta * delta) * z1)


# ---------------------------------------------------------------------------
# Positive half-line
# ---------------------------------------------------------------------------


@pytree_dataclass
class LogNormal(Distribution):
    mu: jax.Array | float = 0.0
    sigma: jax.Array | float = 1.0

    def logpdf(self, x):
        lx = jnp.log(x)
        z = (lx - self.mu) / self.sigma
        return -0.5 * (z * z + LOG2PI) - jnp.log(jnp.asarray(self.sigma, z.dtype)) - lx

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped linked density (vectorize.core hook): with the Log
        link, logpdf(exp(v)) + v cancels the log/exp round-trip exactly —
        it is just the Normal density of v. Finite at |v| ~ 1e10 where
        exp(v) over/underflows and the generic composition returns
        inf - inf = NaN (the 1e10-jump robustness regime,
        /root/reference/test/legacy_interface.jl:160-172 spirit), and
        cheaper: no exp/log in the leapfrog hot loop."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        mu = jnp.asarray(self.mu, dtype)
        sig = jnp.asarray(self.sigma, dtype)
        z = (y - mu) / sig
        lp = -0.5 * (z * z + LOG2PI) - jnp.log(sig)
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.sigma, float)
        return jnp.exp(self.mu + self.sigma * jax.random.normal(key, shape, dtype))

    def cdf(self, x):
        return jsp.ndtr((jnp.log(x) - self.mu) / self.sigma)

    def quantile(self, q):
        return jnp.exp(self.mu + self.sigma * jsp.ndtri(q))

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Exponential(Distribution):
    rate: jax.Array | float = 1.0

    def logpdf(self, x):
        r = jnp.asarray(self.rate, jnp.result_type(x, float))
        return jnp.log(r) - r * x

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped linked density: log r + v - r e^v — -inf (never NaN)
        when e^v overflows (see LogNormal.fused_linked_logdensity)."""
        if not _is_log_link(bijector):
            return None
        r = jnp.asarray(self.rate, jnp.result_type(y, float))
        lp = jnp.log(r) + y - r * jnp.exp(y)
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.rate, float)
        return jax.random.exponential(key, shape, dtype) / self.rate

    def cdf(self, x):
        return -jnp.expm1(-self.rate * x)

    def quantile(self, q):
        return -jnp.log1p(-q) / self.rate

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Gamma(Distribution):
    concentration: jax.Array | float = 1.0
    rate: jax.Array | float = 1.0

    def logpdf(self, x):
        a = jnp.asarray(self.concentration, jnp.result_type(x, float))
        r = jnp.asarray(self.rate, jnp.result_type(x, float))
        return a * jnp.log(r) + (a - 1.0) * jnp.log(x) - r * x - jsp.gammaln(a)

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped linked density: a log r + a v - r e^v - lgamma(a) —
        finite/-inf (never NaN) at |v| ~ 1e10 where the generic composition
        hits (a-1) log(exp(v)) - r exp(v) = inf - inf."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        a = jnp.asarray(self.concentration, dtype)
        r = jnp.asarray(self.rate, dtype)
        lp = a * jnp.log(r) + a * y - r * jnp.exp(y) - jsp.gammaln(a)
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.concentration, self.rate, float)
        return jax.random.gamma(key, self.concentration, shape, dtype) / self.rate

    def cdf(self, x):
        return jsp.gammainc(self.concentration, self.rate * x)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class InverseGamma(Distribution):
    concentration: jax.Array | float = 1.0
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        a = jnp.asarray(self.concentration, jnp.result_type(x, float))
        b = jnp.asarray(self.scale, jnp.result_type(x, float))
        return a * jnp.log(b) - (a + 1.0) * jnp.log(x) - b / x - jsp.gammaln(a)

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped linked density: a log b - a v - b e^{-v} - lgamma(a)
        (see LogNormal.fused_linked_logdensity)."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        a = jnp.asarray(self.concentration, dtype)
        b = jnp.asarray(self.scale, dtype)
        lp = a * jnp.log(b) - a * y - b * jnp.exp(-y) - jsp.gammaln(a)
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.concentration, self.scale, float)
        return self.scale / jax.random.gamma(key, self.concentration, shape, dtype)

    def cdf(self, x):
        a = jnp.asarray(self.concentration, jnp.result_type(x, float))
        b = jnp.asarray(self.scale, jnp.result_type(x, float))
        xs = jnp.maximum(x, jnp.finfo(jnp.result_type(x, float)).tiny)
        return jnp.where(x > 0, jsp.gammaincc(a, b / xs), 0.0)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Chisq(Distribution):
    df: jax.Array | float = 1.0

    def logpdf(self, x):
        k2 = 0.5 * jnp.asarray(self.df, jnp.result_type(x, float))
        return (k2 - 1.0) * jnp.log(x) - 0.5 * x - k2 * LOG2 - jsp.gammaln(k2)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.df, float)
        return 2.0 * jax.random.gamma(key, 0.5 * jnp.asarray(self.df, dtype), shape, dtype)

    def cdf(self, x):
        v = jnp.asarray(self.df, jnp.result_type(x, float))
        return jsp.gammainc(0.5 * v, 0.5 * jnp.maximum(x, 0.0))

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Chi(Distribution):
    df: jax.Array | float = 1.0

    def logpdf(self, x):
        k2 = 0.5 * jnp.asarray(self.df, jnp.result_type(x, float))
        return (
            (2.0 * k2 - 1.0) * jnp.log(x)
            - 0.5 * x * x
            - (k2 - 1.0) * LOG2
            - jsp.gammaln(k2)
        )

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped: (2k/2 - 1) log(e^v) + v = df*v; -0.5 e^{2v} stays a
        single overflow-to--inf term (no inf - inf NaN at v ~ 1e10)."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        df = jnp.asarray(self.df, dtype)
        k2 = 0.5 * df
        lp = df * y - 0.5 * jnp.exp(2.0 * y) - (k2 - 1.0) * LOG2 - jsp.gammaln(k2)
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.df, float)
        g = jax.random.gamma(key, 0.5 * jnp.asarray(self.df, dtype), shape, dtype)
        return jnp.sqrt(2.0 * g)

    def cdf(self, x):
        v = jnp.asarray(self.df, jnp.result_type(x, float))
        xc = jnp.maximum(x, 0.0)
        return jsp.gammainc(0.5 * v, 0.5 * xc * xc)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Weibull(Distribution):
    concentration: jax.Array | float = 1.0  # shape k
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        k = jnp.asarray(self.concentration, jnp.result_type(x, float))
        lam = jnp.asarray(self.scale, jnp.result_type(x, float))
        z = x / lam
        return jnp.log(k / lam) + (k - 1.0) * jnp.log(z) - z**k

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped: (k-1)log(e^v/lam) - (e^v/lam)^k + v collapses to
        log k - k log lam + k v - e^{k v - k log lam} — the generic
        composition's (k-1)*inf - inf NaN at v ~ 1e10 never forms."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        k = jnp.asarray(self.concentration, dtype)
        c1 = k * jnp.log(jnp.asarray(self.scale, dtype))
        lp = jnp.log(k) - c1 + k * y - jnp.exp(k * y - c1)
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.concentration, self.scale, float)
        u = jax.random.uniform(key, shape, dtype, minval=jnp.finfo(dtype).tiny)
        return self.scale * (-jnp.log(u)) ** (1.0 / self.concentration)

    def cdf(self, x):
        return -jnp.expm1(-((x / self.scale) ** self.concentration))

    def quantile(self, q):
        return self.scale * (-jnp.log1p(-q)) ** (1.0 / self.concentration)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Rayleigh(Distribution):
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        s2 = jnp.asarray(self.scale, jnp.result_type(x, float)) ** 2
        return jnp.log(x) - jnp.log(s2) - 0.5 * x * x / s2

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped: log(e^v) - 2 log s - 0.5 e^{2(v - log s)} + v =
        2v - 2 log s - 0.5 e^{2(v-ls)} — never the inf - inf the generic
        composition hits at |v| ~ 1e10."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        ls = jnp.log(jnp.asarray(self.scale, dtype))
        lp = 2.0 * y - 2.0 * ls - 0.5 * jnp.exp(2.0 * (y - ls))
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.scale, float)
        u = jax.random.uniform(key, shape, dtype, minval=jnp.finfo(dtype).tiny)
        return self.scale * jnp.sqrt(-2.0 * jnp.log(u))

    def cdf(self, x):
        s = jnp.asarray(self.scale, jnp.result_type(x, float))
        xc = jnp.maximum(x, 0.0)
        return -jnp.expm1(-0.5 * (xc / s) ** 2)

    def quantile(self, q):
        return self.scale * jnp.sqrt(-2.0 * jnp.log1p(-q))

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Frechet(Distribution):
    shape_: jax.Array | float = 1.0
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        a = jnp.asarray(self.shape_, jnp.result_type(x, float))
        s = jnp.asarray(self.scale, jnp.result_type(x, float))
        z = x / s
        return jnp.log(a / s) - (1.0 + a) * jnp.log(z) - z ** (-a)

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped: with w = v - log s, logpdf(e^v) + v = log a - a w
        - e^{-a w} (a Gumbel form) — the generic composition's
        (1+a)*inf - inf NaN at |v| ~ 1e10 never forms."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        a = jnp.asarray(self.shape_, dtype)
        w = y - jnp.log(jnp.asarray(self.scale, dtype))
        lp = jnp.log(a) - a * w - jnp.exp(-a * w)
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.shape_, self.scale, float)
        u = jax.random.uniform(key, shape, dtype, minval=jnp.finfo(dtype).tiny)
        return self.scale * (-jnp.log(u)) ** (-1.0 / self.shape_)

    def cdf(self, x):
        a = jnp.asarray(self.shape_, jnp.result_type(x, float))
        s = jnp.asarray(self.scale, jnp.result_type(x, float))
        xs = jnp.maximum(x, jnp.finfo(jnp.result_type(x, float)).tiny)
        return jnp.where(x > 0, jnp.exp(-((xs / s) ** -a)), 0.0)

    def quantile(self, q):
        return self.scale * (-jnp.log(q)) ** (-1.0 / self.shape_)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class HalfNormal(Distribution):
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        z = x / self.scale
        return LOG2 - 0.5 * (z * z + LOG2PI) - jnp.log(jnp.asarray(self.scale, z.dtype))

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped: logpdf(e^v) + v = const + v - 0.5 e^{2(v - log s)} —
        never the inf - inf the generic composition hits at |v| ~ 1e10."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        ls = jnp.log(jnp.asarray(self.scale, dtype))
        lp = (LOG2 - 0.5 * LOG2PI) - ls + y - 0.5 * jnp.exp(2.0 * (y - ls))
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.scale, float)
        return jnp.abs(self.scale * jax.random.normal(key, shape, dtype))

    def cdf(self, x):
        s = jnp.asarray(self.scale, jnp.result_type(x, float))
        return jax.scipy.special.erf(jnp.maximum(x, 0.0) / (s * jnp.sqrt(jnp.asarray(2.0, jnp.result_type(x, float)))))

    def quantile(self, q):
        dtype = jnp.result_type(q, float)
        return self.scale * jnp.sqrt(jnp.asarray(2.0, dtype)) * jsp.erfinv(q)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class HalfCauchy(Distribution):
    scale: jax.Array | float = 1.0

    def logpdf(self, x):
        z = x / self.scale
        return LOG2 - LOGPI - jnp.log(jnp.asarray(self.scale, z.dtype)) - jnp.log1p(z * z)

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped: log1p(z^2) with z = e^{v - log s} is
        softplus(2(v - log s)) exactly — stable at |v| ~ 1e10."""
        if not _is_log_link(bijector):
            return None
        dtype = jnp.result_type(y, float)
        ls = jnp.log(jnp.asarray(self.scale, dtype))
        lp = (LOG2 - LOGPI) - ls + y - jax.nn.softplus(2.0 * (y - ls))
        return (jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.scale, float)
        return jnp.abs(self.scale * jax.random.cauchy(key, shape, dtype))

    def cdf(self, x):
        s = jnp.asarray(self.scale, jnp.result_type(x, float))
        return (2.0 / jnp.pi) * jnp.arctan(jnp.maximum(x, 0.0) / s)

    def quantile(self, q):
        return self.scale * jnp.tan(0.5 * jnp.pi * q)

    @property
    def support(self):
        return positive()


# ---------------------------------------------------------------------------
# Bounded intervals
# ---------------------------------------------------------------------------


@pytree_dataclass(meta_fields=("low_static", "high_static"))
class Uniform(Distribution):
    """Uniform(low, high). Bounds are stored both as (possibly traced) values
    and as static floats for the registry when python scalars were given."""

    low: jax.Array | float = 0.0
    high: jax.Array | float = 1.0
    low_static: float | None = None
    high_static: float | None = None

    def __post_init__(self):
        if self.low_static is None and isinstance(self.low, (int, float)):
            object.__setattr__(self, "low_static", float(self.low))
        if self.high_static is None and isinstance(self.high, (int, float)):
            object.__setattr__(self, "high_static", float(self.high))

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        lo = jnp.asarray(self.low, dtype)
        hi = jnp.asarray(self.high, dtype)
        inside = (x >= lo) & (x <= hi)
        return jnp.where(inside, -jnp.log(hi - lo), -jnp.inf)

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped linked density: the interval width log(hi-lo) of the
        inverse-link log-jac cancels the density's -log(hi-lo) exactly,
        leaving -|v| - 2 log1pexp(-|v|) (the stable logistic log-jac,
        reference truncated.jl:71-82) — parameter-free and NaN-free."""
        if not _is_interval_logit_link(bijector, self.low, self.high):
            return None
        dtype = jnp.result_type(y, float)
        ay = jnp.abs(jnp.asarray(y, dtype))
        lp = -ay - 2.0 * jax.nn.softplus(-ay)
        if want_x:
            lo = jnp.asarray(self.low, dtype)
            hi = jnp.asarray(self.high, dtype)
            return (hi - lo) * jax.nn.sigmoid(y) + lo, lp
        return None, lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.low, self.high, float)
        u = jax.random.uniform(key, shape, dtype)
        return self.low + (self.high - self.low) * u

    def cdf(self, x):
        return jnp.clip((x - self.low) / (self.high - self.low), 0.0, 1.0)

    def quantile(self, q):
        return self.low + (self.high - self.low) * q

    @property
    def support(self):
        lo = self.low_static if self.low_static is not None else self.low
        hi = self.high_static if self.high_static is not None else self.high
        return Support("interval", lo, hi, True, True)


@pytree_dataclass
class Beta(Distribution):
    a: jax.Array | float = 1.0
    b: jax.Array | float = 1.0

    def logpdf(self, x):
        a = jnp.asarray(self.a, jnp.result_type(x, float))
        b = jnp.asarray(self.b, jnp.result_type(x, float))
        return (
            (a - 1.0) * jnp.log(x)
            + (b - 1.0) * jnp.log1p(-x)
            - (jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))
        )

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped linked density: with the unit-interval logit link,
        (a-1)log x + (b-1)log(1-x) plus the inverse-link log-jac
        log x + log(1-x) telescopes to a*log sigmoid(v) + b*log sigmoid(-v)
        - log B(a, b) — NaN-free at |v| ~ 1e10 (no clamp round-trip) and
        exp/log-free in the leapfrog hot loop."""
        if not _is_interval_logit_link(bijector, 0.0, 1.0):
            return None
        dtype = jnp.result_type(y, float)
        a = jnp.asarray(self.a, dtype)
        b = jnp.asarray(self.b, dtype)
        lp = (
            -a * jax.nn.softplus(-y)
            - b * jax.nn.softplus(y)
            - (jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))
        )
        return (jax.nn.sigmoid(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.a, self.b, float)
        return jax.random.beta(key, self.a, self.b, shape, dtype)

    def cdf(self, x):
        return jsp.betainc(self.a, self.b, jnp.clip(x, 0.0, 1.0))

    @property
    def support(self):
        return unit_interval()


@pytree_dataclass
class Kumaraswamy(Distribution):
    a: jax.Array | float = 1.0
    b: jax.Array | float = 1.0

    def logpdf(self, x):
        a = jnp.asarray(self.a, jnp.result_type(x, float))
        b = jnp.asarray(self.b, jnp.result_type(x, float))
        return (
            jnp.log(a)
            + jnp.log(b)
            + (a - 1.0) * jnp.log(x)
            + (b - 1.0) * jnp.log1p(-(x**a))
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.a, self.b, float)
        u = jax.random.uniform(
            key, shape, dtype, minval=jnp.finfo(dtype).tiny, maxval=1.0
        )
        return (1.0 - u ** (1.0 / self.b)) ** (1.0 / self.a)

    def cdf(self, x):
        return -jnp.expm1(self.b * jnp.log1p(-(x**self.a)))

    def quantile(self, q):
        return (-jnp.expm1(jnp.log1p(-q) / self.b)) ** (1.0 / self.a)

    @property
    def support(self):
        return unit_interval()


@pytree_dataclass
class LogitNormal(Distribution):
    mu: jax.Array | float = 0.0
    sigma: jax.Array | float = 1.0

    def logpdf(self, x):
        lx = jnp.log(x) - jnp.log1p(-x)
        z = (lx - self.mu) / self.sigma
        return (
            -0.5 * (z * z + LOG2PI)
            - jnp.log(jnp.asarray(self.sigma, z.dtype))
            - jnp.log(x)
            - jnp.log1p(-x)
        )

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped: with the unit-interval logit link the density's
        -log x - log(1-x) cancels the inverse-link log-jac EXACTLY, leaving
        the plain Normal density of v — parameter-free of x, NaN-free at
        |v| ~ 1e10, and exp/log-free in the leapfrog hot loop."""
        if not _is_interval_logit_link(bijector, 0.0, 1.0):
            return None
        dtype = jnp.result_type(y, float)
        mu = jnp.asarray(self.mu, dtype)
        sig = jnp.asarray(self.sigma, dtype)
        z = (y - mu) / sig
        lp = -0.5 * (z * z + LOG2PI) - jnp.log(sig)
        return (jax.nn.sigmoid(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.sigma, float)
        return jax.nn.sigmoid(self.mu + self.sigma * jax.random.normal(key, shape, dtype))

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        xc = jnp.clip(x, jnp.finfo(dtype).tiny, 1.0 - jnp.finfo(dtype).epsneg)
        z = (jnp.log(xc) - jnp.log1p(-xc) - self.mu) / self.sigma
        return jax.scipy.special.ndtr(z)

    def quantile(self, q):
        return jax.nn.sigmoid(self.mu + self.sigma * jsp.ndtri(q))

    @property
    def support(self):
        return unit_interval()


@pytree_dataclass
class Arcsine(Distribution):
    a: jax.Array | float = 0.0
    b: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        a, b = jnp.asarray(self.a, dtype), jnp.asarray(self.b, dtype)
        return -(LOGPI + 0.5 * (jnp.log(x - a) + jnp.log(b - x)))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.a, self.b, float)
        u = jax.random.uniform(key, shape, dtype)
        s = jnp.sin(0.5 * math.pi * u)
        return self.a + (self.b - self.a) * s * s

    def cdf(self, x):
        a = jnp.asarray(self.a, jnp.result_type(x, float))
        b = jnp.asarray(self.b, jnp.result_type(x, float))
        z = jnp.clip((x - a) / (b - a), 0.0, 1.0)
        return (2.0 / jnp.pi) * jnp.arcsin(jnp.sqrt(z))

    def quantile(self, q):
        s = jnp.sin(0.5 * jnp.pi * q)
        return self.a + (self.b - self.a) * s * s

    @property
    def support(self):
        lo = self.a if isinstance(self.a, (int, float)) else self.a
        hi = self.b if isinstance(self.b, (int, float)) else self.b
        return Support("interval", lo, hi, True, True)


# ---------------------------------------------------------------------------
# Other half-bounded supports
# ---------------------------------------------------------------------------


@pytree_dataclass(meta_fields=("min_static",))
class Pareto(Distribution):
    """Pareto(shape α, scale x_m); support [x_m, ∞) — lower-bounded
    (reference maps it to log∘Shift(−a), src/transformed_distribution.jl:135)."""

    alpha: jax.Array | float = 1.0
    scale: jax.Array | float = 1.0
    min_static: float | None = None

    def __post_init__(self):
        if self.min_static is None and isinstance(self.scale, (int, float)):
            object.__setattr__(self, "min_static", float(self.scale))

    def logpdf(self, x):
        a = jnp.asarray(self.alpha, jnp.result_type(x, float))
        m = jnp.asarray(self.scale, jnp.result_type(x, float))
        return jnp.log(a) + a * jnp.log(m) - (a + 1.0) * jnp.log(x)

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped shifted-log link (y = log(x - x_m)): log x =
        logaddexp(log x_m, v), so lp = log a + a log x_m + v
        - (a+1) logaddexp(log x_m, v) — NaN-free at |v| ~ 1e10."""
        if not _is_shifted_log_link(bijector, self.scale):
            return None
        dtype = jnp.result_type(y, float)
        a = jnp.asarray(self.alpha, dtype)
        lm = jnp.log(jnp.asarray(self.scale, dtype))
        lp = jnp.log(a) + a * lm + y - (a + 1.0) * jnp.logaddexp(lm, y)
        return (jnp.asarray(self.scale, dtype) + jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.alpha, self.scale, float)
        u = jax.random.uniform(key, shape, dtype, minval=jnp.finfo(dtype).tiny)
        return self.scale * u ** (-1.0 / self.alpha)

    def cdf(self, x):
        a = jnp.asarray(self.alpha, jnp.result_type(x, float))
        m = jnp.asarray(self.scale, jnp.result_type(x, float))
        xs = jnp.maximum(x, m)
        return -jnp.expm1(-a * jnp.log(xs / m))

    def quantile(self, q):
        return self.scale * jnp.exp(-jnp.log1p(-q) / self.alpha)

    @property
    def support(self):
        lo = self.min_static if self.min_static is not None else self.scale
        return Support("interval", lo, math.inf, True, False)


@pytree_dataclass(meta_fields=("min_static",))
class Levy(Distribution):
    """Levy(μ, σ); support [μ, ∞)."""

    mu: jax.Array | float = 0.0
    sigma: jax.Array | float = 1.0
    min_static: float | None = None

    def __post_init__(self):
        if self.min_static is None and isinstance(self.mu, (int, float)):
            object.__setattr__(self, "min_static", float(self.mu))

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        mu = jnp.asarray(self.mu, dtype)
        s = jnp.asarray(self.sigma, dtype)
        d = x - mu
        return 0.5 * (jnp.log(s) - LOG2PI) - 0.5 * s / d - 1.5 * jnp.log(d)

    def fused_linked_logdensity(self, bijector, y, want_x: bool = True):
        """Telescoped shifted-log link (y = log(x - mu)): d = e^v, so lp =
        0.5(log s - log 2pi) - 0.5 s e^{-v} - 0.5 v — the generic
        composition's 1.5*inf - inf NaN at |v| ~ 1e10 never forms."""
        if not _is_shifted_log_link(bijector, self.mu):
            return None
        dtype = jnp.result_type(y, float)
        s = jnp.asarray(self.sigma, dtype)
        lp = 0.5 * (jnp.log(s) - LOG2PI) - 0.5 * s * jnp.exp(-y) - 0.5 * y
        return (jnp.asarray(self.mu, dtype) + jnp.exp(y) if want_x else None), lp

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.sigma, float)
        z = jax.random.normal(key, shape, dtype)
        return self.mu + self.sigma / (z * z)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        mu = jnp.asarray(self.mu, dtype)
        s = jnp.asarray(self.sigma, dtype)
        d = jnp.maximum(x - mu, jnp.finfo(dtype).tiny)
        return jnp.where(x > mu, jax.scipy.special.erfc(jnp.sqrt(0.5 * s / d)), 0.0)

    def quantile(self, q):
        # cdf = erfc(sqrt(s/(2d))) = q  ⇒  d = s / ndtri(q/2)²
        z = jsp.ndtri(0.5 * q)
        return self.mu + self.sigma / (z * z)

    @property
    def support(self):
        lo = self.min_static if self.min_static is not None else self.mu
        return Support("interval", lo, math.inf, True, False)


# ---------------------------------------------------------------------------
# Discrete (identity bijector in the registry,
# reference src/transformed_distribution.jl:75-76)
# ---------------------------------------------------------------------------


class DiscreteDistribution(Distribution):
    @property
    def support(self):
        return DISCRETE


@pytree_dataclass
class Poisson(DiscreteDistribution):
    rate: jax.Array | float = 1.0

    def logpdf(self, x):
        r = jnp.asarray(self.rate, jnp.result_type(x, float))
        return x * jnp.log(r) - r - jsp.gammaln(x + 1.0)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.poisson(key, self.rate, shape)

    def cdf(self, x):
        lam = jnp.asarray(self.rate, jnp.result_type(x, float))
        k = jnp.floor(jnp.asarray(x, jnp.result_type(x, float)))
        return jnp.where(k >= 0, jsp.gammaincc(jnp.maximum(k, 0.0) + 1.0, lam), 0.0)


@pytree_dataclass
class Bernoulli(DiscreteDistribution):
    p: jax.Array | float = 0.5

    def logpdf(self, x):
        p = jnp.asarray(self.p, jnp.result_type(x, float))
        return x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(key, self.p, shape).astype(jnp.int32)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        p = jnp.asarray(self.p, dtype)
        x = jnp.asarray(x, dtype)
        return jnp.where(x < 0, 0.0, jnp.where(x < 1, 1.0 - p, 1.0))


@pytree_dataclass
class Binomial(DiscreteDistribution):
    n: int = 1
    p: jax.Array | float = 0.5

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        p = jnp.asarray(self.p, dtype)
        n = jnp.asarray(self.n, dtype)
        x = jnp.asarray(x, dtype)
        logc = jsp.gammaln(n + 1) - jsp.gammaln(x + 1) - jsp.gammaln(n - x + 1)
        return logc + x * jnp.log(p) + (n - x) * jnp.log1p(-p)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.bernoulli(key, self.p, (self.n,) + tuple(shape))
        return jnp.sum(u.astype(jnp.int32), axis=0)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        p = jnp.asarray(self.p, dtype)
        k = jnp.floor(jnp.asarray(x, dtype))
        kc = jnp.clip(k, 0.0, self.n - 1)
        val = jsp.betainc(self.n - kc, kc + 1.0, 1.0 - p)
        return jnp.where(k < 0, 0.0, jnp.where(k >= self.n, 1.0, val))


@pytree_dataclass
class Geometric(DiscreteDistribution):
    """Number of failures before first success."""

    p: jax.Array | float = 0.5

    def logpdf(self, x):
        p = jnp.asarray(self.p, jnp.result_type(x, float))
        return x * jnp.log1p(-p) + jnp.log(p)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.geometric(key, self.p, shape) - 1

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        p = jnp.asarray(self.p, dtype)
        k = jnp.floor(jnp.asarray(x, dtype))
        return jnp.where(k >= 0, -jnp.expm1(jnp.log1p(-p) * (jnp.maximum(k, 0.0) + 1.0)), 0.0)


@pytree_dataclass
class Categorical(DiscreteDistribution):
    logits: jax.Array = None  # type: ignore[assignment]

    def logpdf(self, x):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(
            logp, jnp.asarray(x)[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    def sample(self, key, sample_shape=()):
        return jax.random.categorical(key, self.logits, shape=tuple(sample_shape))

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        p = jax.nn.softmax(self.logits, axis=-1)
        K = jnp.shape(self.logits)[-1]
        k = jnp.floor(jnp.asarray(x, dtype))
        idx = jnp.arange(K, dtype=dtype)
        return jnp.sum(jnp.where(idx <= k[..., None], p, 0.0), axis=-1)


# ---------------------------------------------------------------------------
# Truncated wrapper (reference: Distributions.truncated;
# the bijector registry handles it via interval support)
# ---------------------------------------------------------------------------


@pytree_dataclass(meta_fields=("lower", "upper"))
class Truncated(Distribution):
    """truncated(base; lower, upper) with *static* truncation bounds.

    logpdf renormalizes by (cdf(ub) - cdf(lb)); sampling is inverse-cdf when
    the base has `quantile`, else rejection inside a `lax.while_loop` is NOT
    used (dynamic trip count) — we require quantile or cdf+bisection.
    """

    base: Distribution
    lower: float = -math.inf
    upper: float = math.inf

    def _bounds_cdf(self):
        lo_c = self.base.cdf(jnp.asarray(self.lower)) if math.isfinite(self.lower) else 0.0
        hi_c = self.base.cdf(jnp.asarray(self.upper)) if math.isfinite(self.upper) else 1.0
        return lo_c, hi_c

    def logpdf(self, x):
        lo_c, hi_c = self._bounds_cdf()
        lp = self.base.logpdf(x) - jnp.log(hi_c - lo_c)
        inside = jnp.ones_like(lp, bool)
        if math.isfinite(self.lower):
            inside &= x >= self.lower
        if math.isfinite(self.upper):
            inside &= x <= self.upper
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, sample_shape=()):
        lo_c, hi_c = self._bounds_cdf()
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, jnp.result_type(float))
        q = lo_c + (hi_c - lo_c) * u
        return self.base.quantile(q)

    def cdf(self, x):
        base = self.base
        lo, hi = self.lower, self.upper
        Fl = base.cdf(jnp.asarray(lo, jnp.result_type(x, float))) if math.isfinite(lo) else 0.0
        Fh = base.cdf(jnp.asarray(hi, jnp.result_type(x, float))) if math.isfinite(hi) else 1.0
        xc = jnp.clip(x, lo, hi)
        return (base.cdf(xc) - Fl) / (Fh - Fl)

    @property
    def support(self):
        base_s = self.base.support
        lo = max(self.lower, base_s.lower) if isinstance(base_s.lower, (int, float)) else self.lower
        hi = min(self.upper, base_s.upper) if isinstance(base_s.upper, (int, float)) else self.upper
        return Support("interval", lo, hi, math.isfinite(lo), math.isfinite(hi))
