"""Univariate families, part 2 — completing the reference test-matrix
coverage (test/vector/univariate.jl lists ~85 cases; SURVEY.md §2.7)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from ..tree import pytree_dataclass
from .base import Distribution, Support, positive, real_line, unit_interval

LOG2PI = math.log(2.0 * math.pi)
LOGPI = math.log(math.pi)
LOG2 = math.log(2.0)


@pytree_dataclass
class FDist(Distribution):
    d1: jax.Array | float = 1.0
    d2: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        d1 = jnp.asarray(self.d1, dtype)
        d2 = jnp.asarray(self.d2, dtype)
        h1, h2 = 0.5 * d1, 0.5 * d2
        return (
            h1 * (jnp.log(d1) - jnp.log(d2))
            + (h1 - 1.0) * jnp.log(x)
            - (h1 + h2) * jnp.log1p(d1 * x / d2)
            - (jsp.gammaln(h1) + jsp.gammaln(h2) - jsp.gammaln(h1 + h2))
        )

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.d1, self.d2, float)
        g1 = jax.random.gamma(k1, 0.5 * jnp.asarray(self.d1, dtype), shape, dtype)
        g2 = jax.random.gamma(k2, 0.5 * jnp.asarray(self.d2, dtype), shape, dtype)
        return (g1 / jnp.asarray(self.d1, dtype)) / (g2 / jnp.asarray(self.d2, dtype))

    def cdf(self, x):
        d1 = jnp.asarray(self.d1, jnp.result_type(x, float))
        d2 = jnp.asarray(self.d2, jnp.result_type(x, float))
        xc = jnp.maximum(x, 0.0)
        return jsp.betainc(0.5 * d1, 0.5 * d2, d1 * xc / (d1 * xc + d2))

    @property
    def support(self):
        return positive()


@pytree_dataclass
class BetaPrime(Distribution):
    a: jax.Array | float = 1.0
    b: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        a = jnp.asarray(self.a, dtype)
        b = jnp.asarray(self.b, dtype)
        return (
            (a - 1.0) * jnp.log(x)
            - (a + b) * jnp.log1p(x)
            - (jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.a, self.b, float)
        u = jax.random.beta(key, self.a, self.b, shape, dtype)
        return u / (1.0 - u)

    def cdf(self, x):
        a = jnp.asarray(self.a, jnp.result_type(x, float))
        b = jnp.asarray(self.b, jnp.result_type(x, float))
        xc = jnp.maximum(x, 0.0)
        return jsp.betainc(a, b, xc / (1.0 + xc))

    @property
    def support(self):
        return positive()


@pytree_dataclass
class InverseGaussian(Distribution):
    """Wald distribution IG(mu, lambda)."""

    mu: jax.Array | float = 1.0
    lam: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        mu = jnp.asarray(self.mu, dtype)
        lam = jnp.asarray(self.lam, dtype)
        return 0.5 * (jnp.log(lam) - LOG2PI - 3.0 * jnp.log(x)) - lam * (
            x - mu
        ) ** 2 / (2.0 * mu * mu * x)

    def sample(self, key, sample_shape=()):
        # Michael-Schucany-Haas
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.lam, float)
        mu = jnp.asarray(self.mu, dtype)
        lam = jnp.asarray(self.lam, dtype)
        nu = jax.random.normal(k1, shape, dtype)
        y = nu * nu
        x = mu + mu * mu * y / (2 * lam) - mu / (2 * lam) * jnp.sqrt(
            4 * mu * lam * y + mu * mu * y * y
        )
        z = jax.random.uniform(k2, shape, dtype)
        return jnp.where(z <= mu / (mu + x), x, mu * mu / x)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        mu = jnp.asarray(self.mu, dtype)
        lam = jnp.asarray(self.lam, dtype)
        xs = jnp.maximum(x, jnp.finfo(dtype).tiny)
        rt = jnp.sqrt(lam / xs)
        ndtr = jax.scipy.special.ndtr
        val = ndtr(rt * (xs / mu - 1.0)) + jnp.exp(2.0 * lam / mu) * ndtr(-rt * (xs / mu + 1.0))
        return jnp.where(x > 0, val, 0.0)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class VonMises(Distribution):
    """Von Mises on [-pi, pi] (bounded support -> Logit-type link)."""

    loc: jax.Array | float = 0.0
    kappa: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        kappa = jnp.asarray(self.kappa, dtype)
        return kappa * jnp.cos(x - self.loc) - LOG2PI + jnp.log(
            1.0
        ) - jnp.log(jsp.i0e(kappa)) - kappa

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.kappa, float)
        return self.loc + jax.random.vonmises(
            key, jnp.asarray(0.0, dtype), self.kappa, shape, dtype
        ) if hasattr(jax.random, "vonmises") else self._sample_rejectionless(key, shape, dtype)

    def _sample_rejectionless(self, key, shape, dtype):
        # wrapped-Cauchy-free fallback: sum of many small steps is overkill;
        # use inverse-cdf via Fisher approximation is poor. Use best-of-n
        # Best-Fisher rejection with fixed proposals and masked acceptance.
        kappa = jnp.asarray(self.kappa, dtype)
        n_prop = 8
        k1, k2, k3 = jax.random.split(key, 3)
        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa * kappa)
        rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa)
        r = (1.0 + rho * rho) / (2.0 * rho)
        u1 = jax.random.uniform(k1, (n_prop,) + shape, dtype)
        u2 = jax.random.uniform(k2, (n_prop,) + shape, dtype)
        u3 = jax.random.uniform(k3, (n_prop,) + shape, dtype)
        z = jnp.cos(jnp.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = kappa * (r - f)
        accept = (c * (2.0 - c) - u2 > 0) | (jnp.log(c / u2) + 1.0 - c >= 0)
        theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        # first accepted among the n_prop proposals
        idx = jnp.argmax(accept, axis=0)
        theta_sel = jnp.take_along_axis(theta, idx[None], axis=0)[0]
        return jnp.mod(theta_sel + self.loc + jnp.pi, 2.0 * jnp.pi) - jnp.pi

    @property
    def support(self):
        return Support("interval", -math.pi, math.pi, True, True)


@pytree_dataclass(meta_fields=("a_static", "b_static"))
class TriangularDist(Distribution):
    a: jax.Array | float = 0.0
    b: jax.Array | float = 1.0
    c: jax.Array | float = 0.5  # mode
    a_static: float | None = None
    b_static: float | None = None

    def __post_init__(self):
        if self.a_static is None and isinstance(self.a, (int, float)):
            object.__setattr__(self, "a_static", float(self.a))
        if self.b_static is None and isinstance(self.b, (int, float)):
            object.__setattr__(self, "b_static", float(self.b))

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        a = jnp.asarray(self.a, dtype)
        b = jnp.asarray(self.b, dtype)
        c = jnp.asarray(self.c, dtype)
        left = 2.0 * (x - a) / ((b - a) * (c - a))
        right = 2.0 * (b - x) / ((b - a) * (b - c))
        pdf = jnp.where(x < c, left, right)
        pdf = jnp.where((x < a) | (x > b), 0.0, pdf)
        return jnp.log(pdf)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.a, self.b, self.c, float)
        u = jax.random.uniform(key, shape, dtype)
        a = jnp.asarray(self.a, dtype)
        b = jnp.asarray(self.b, dtype)
        c = jnp.asarray(self.c, dtype)
        fc = (c - a) / (b - a)
        return jnp.where(
            u < fc,
            a + jnp.sqrt(u * (b - a) * (c - a)),
            b - jnp.sqrt((1.0 - u) * (b - a) * (b - c)),
        )

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        a = jnp.asarray(self.a, dtype); b = jnp.asarray(self.b, dtype); c = jnp.asarray(self.c, dtype)
        xc = jnp.clip(x, a, b)
        left = (xc - a) ** 2 / ((b - a) * (c - a))
        right = 1.0 - (b - xc) ** 2 / ((b - a) * (b - c))
        return jnp.where(xc <= c, left, right)

    def quantile(self, q):
        dtype = jnp.result_type(q, float)
        a = jnp.asarray(self.a, dtype)
        b = jnp.asarray(self.b, dtype)
        c = jnp.asarray(self.c, dtype)
        fc = (c - a) / (b - a)
        return jnp.where(
            q < fc,
            a + jnp.sqrt(jnp.maximum(q, 0.0) * (b - a) * (c - a)),
            b - jnp.sqrt(jnp.maximum(1.0 - q, 0.0) * (b - a) * (b - c)),
        )

    @property
    def support(self):
        lo = self.a_static if self.a_static is not None else self.a
        hi = self.b_static if self.b_static is not None else self.b
        return Support("interval", lo, hi, True, True)


@pytree_dataclass
class Semicircle(Distribution):
    radius: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        r = jnp.asarray(self.radius, dtype)
        return 0.5 * jnp.log(r * r - x * x) + LOG2 - LOGPI - 2.0 * jnp.log(r)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.radius, float)
        u = jax.random.beta(key, 1.5, 1.5, shape, dtype)
        return self.radius * (2.0 * u - 1.0)

    def cdf(self, x):
        r = jnp.asarray(self.radius, jnp.result_type(x, float))
        z = jnp.clip(x / r, -1.0, 1.0)
        return 0.5 + z * jnp.sqrt(1.0 - z * z) / jnp.pi + jnp.arcsin(z) / jnp.pi

    @property
    def support(self):
        return Support("interval", -self.radius, self.radius, True, True)


@pytree_dataclass
class Cosine(Distribution):
    """Raised-cosine on [mu - s, mu + s]."""

    mu: jax.Array | float = 0.0
    s: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        mu = jnp.asarray(self.mu, dtype)
        s = jnp.asarray(self.s, dtype)
        z = (x - mu) / s
        return jnp.log1p(jnp.cos(jnp.pi * z)) - jnp.log(2.0 * s)

    def sample(self, key, sample_shape=()):
        # inverse-cdf via bisection (cdf = (1 + z + sin(pi z)/pi)/2)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.s, float)
        u = jax.random.uniform(key, shape, dtype)

        def cdf(z):
            return 0.5 * (1.0 + z + jnp.sin(jnp.pi * z) / jnp.pi)

        lo = -jnp.ones_like(u)
        hi = jnp.ones_like(u)
        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            go_hi = cdf(mid) < u
            return jnp.where(go_hi, mid, lo), jnp.where(go_hi, hi, mid)
        lo, hi = jax.lax.fori_loop(0, 60, body, (lo, hi))
        z = 0.5 * (lo + hi)
        return self.mu + self.s * z

    def cdf(self, x):
        mu = jnp.asarray(self.mu, jnp.result_type(x, float))
        s = jnp.asarray(self.s, jnp.result_type(x, float))
        z = jnp.clip((x - mu) / s, -1.0, 1.0)
        return 0.5 * (1.0 + z + jnp.sin(jnp.pi * z) / jnp.pi)

    @property
    def support(self):
        return Support("interval", self.mu - self.s, self.mu + self.s, True, True)


@pytree_dataclass
class Epanechnikov(Distribution):
    mu: jax.Array | float = 0.0
    s: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        z = (x - jnp.asarray(self.mu, dtype)) / jnp.asarray(self.s, dtype)
        return jnp.log(0.75) + jnp.log1p(-z * z) - jnp.log(jnp.asarray(self.s, dtype))

    def sample(self, key, sample_shape=()):
        # median of three uniforms on [-1, 1]
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.s, float)
        u = jax.random.uniform(key, (3,) + shape, dtype, minval=-1.0, maxval=1.0)
        z = jnp.median(u, axis=0)
        return self.mu + self.s * z

    def cdf(self, x):
        mu = jnp.asarray(self.mu, jnp.result_type(x, float))
        s = jnp.asarray(self.s, jnp.result_type(x, float))
        z = jnp.clip((x - mu) / s, -1.0, 1.0)
        return 0.25 * (2.0 + 3.0 * z - z ** 3)

    @property
    def support(self):
        return Support("interval", self.mu - self.s, self.mu + self.s, True, True)


@pytree_dataclass
class GeneralizedPareto(Distribution):
    """GPD(mu, sigma, xi) with xi != 0 handled; support [mu, inf) for xi >= 0."""

    mu: jax.Array | float = 0.0
    sigma: jax.Array | float = 1.0
    xi: jax.Array | float = 0.3

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        s = jnp.asarray(self.sigma, dtype)
        xi = jnp.asarray(self.xi, dtype)
        z = (x - self.mu) / s
        return jnp.where(
            jnp.abs(xi) < 1e-12,
            -z - jnp.log(s),
            -(1.0 / xi + 1.0) * jnp.log1p(xi * z) - jnp.log(s),
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.sigma, self.xi, float)
        u = jax.random.uniform(key, shape, dtype, minval=jnp.finfo(dtype).tiny)
        xi = jnp.asarray(self.xi, dtype)
        z = jnp.where(
            jnp.abs(xi) < 1e-12, -jnp.log(u), jnp.expm1(-xi * jnp.log(u)) / xi
        )
        return self.mu + self.sigma * z

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        mu = jnp.asarray(self.mu, dtype); s = jnp.asarray(self.sigma, dtype)
        xi = jnp.asarray(self.xi, dtype)
        z = jnp.maximum((x - mu) / s, 0.0)
        # xi != 0 branch via a safe log1p; xi ~ 0 falls back to exp form
        small = jnp.abs(xi) < 1e-6
        xi_safe = jnp.where(small, 1.0, xi)
        t = jnp.maximum(1.0 + xi_safe * z, 0.0)
        general = -jnp.expm1(-jnp.log(jnp.maximum(t, jnp.finfo(dtype).tiny)) / xi_safe)
        general = jnp.where(t > 0, general, 1.0)
        return jnp.where(small, -jnp.expm1(-z), general)

    def quantile(self, q):
        dtype = jnp.result_type(q, float)
        xi = jnp.asarray(self.xi, dtype)
        small = jnp.abs(xi) < 1e-6
        xi_safe = jnp.where(small, 1.0, xi)
        l1mq = jnp.log1p(-q)
        z = jnp.where(small, -l1mq, jnp.expm1(-xi_safe * l1mq) / xi_safe)
        return self.mu + self.sigma * z

    @property
    def support(self):
        return Support("interval", self.mu, math.inf, True, False)


@pytree_dataclass
class GeneralizedExtremeValue(Distribution):
    """GEV(mu, sigma, xi) with xi > 0: support [mu - sigma/xi, inf)."""

    mu: jax.Array | float = 0.0
    sigma: jax.Array | float = 1.0
    xi: jax.Array | float = 0.3

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        s = jnp.asarray(self.sigma, dtype)
        xi = jnp.asarray(self.xi, dtype)
        z = (x - self.mu) / s
        t = 1.0 + xi * z
        return -(1.0 / xi + 1.0) * jnp.log(t) - t ** (-1.0 / xi) - jnp.log(s)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.sigma, self.xi, float)
        u = jax.random.uniform(key, shape, dtype, minval=jnp.finfo(dtype).tiny)
        xi = jnp.asarray(self.xi, dtype)
        g = -jnp.log(u)  # standard Gumbel variate is -log(-log(u)); here:
        return self.mu + self.sigma * (g ** (-xi) - 1.0) / xi

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        mu = jnp.asarray(self.mu, dtype); s = jnp.asarray(self.sigma, dtype)
        xi = jnp.asarray(self.xi, dtype)
        z = (x - mu) / s
        small = jnp.abs(xi) < 1e-6
        xi_safe = jnp.where(small, 1.0, xi)
        t = jnp.maximum(1.0 + xi_safe * z, 0.0)
        logt = jnp.log(jnp.maximum(t, jnp.finfo(dtype).tiny))
        general = jnp.exp(-jnp.exp(-logt / xi_safe))
        general = jnp.where(t > 0, general, jnp.where(xi > 0, 0.0, 1.0))
        return jnp.where(small, jnp.exp(-jnp.exp(-z)), general)

    def quantile(self, q):
        dtype = jnp.result_type(q, float)
        xi = jnp.asarray(self.xi, dtype)
        small = jnp.abs(xi) < 1e-6
        xi_safe = jnp.where(small, 1.0, xi)
        llq = jnp.log(-jnp.log(q))  # -log of the Gumbel variate
        z = jnp.where(small, -llq, jnp.expm1(-xi_safe * llq) / xi_safe)
        return self.mu + self.sigma * z

    @property
    def support(self):
        if all(isinstance(v, (int, float)) for v in (self.mu, self.sigma, self.xi)):
            if self.xi > 0:
                return Support("interval", self.mu - self.sigma / self.xi, math.inf, True, False)
            if self.xi < 0:
                return Support("interval", -math.inf, self.mu - self.sigma / self.xi, False, True)
            return real_line()  # xi == 0: Gumbel limit
        # the bounded side depends on sign(xi), which is undecidable for
        # traced parameters — refuse rather than return a wrong link
        raise ValueError("GeneralizedExtremeValue.support needs static mu/sigma/xi")


@pytree_dataclass
class Gompertz(Distribution):
    eta: jax.Array | float = 1.0
    b: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        eta = jnp.asarray(self.eta, dtype)
        b = jnp.asarray(self.b, dtype)
        return jnp.log(b * eta) + b * x + eta * -jnp.expm1(b * x)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.eta, self.b, float)
        u = jax.random.uniform(key, shape, dtype, minval=jnp.finfo(dtype).tiny)
        eta = jnp.asarray(self.eta, dtype)
        return jnp.log1p(-jnp.log(u) / eta) / self.b

    def cdf(self, x):
        eta = jnp.asarray(self.eta, jnp.result_type(x, float))
        b = jnp.asarray(self.b, jnp.result_type(x, float))
        xc = jnp.maximum(x, 0.0)
        return -jnp.expm1(-eta * jnp.expm1(b * xc))

    def quantile(self, q):
        return jnp.log1p(-jnp.log1p(-q) / self.eta) / self.b

    @property
    def support(self):
        return positive()


@pytree_dataclass
class NegativeBinomial(Distribution):
    """Failures before r-th success; discrete -> identity link."""

    r: jax.Array | float = 1.0
    p: jax.Array | float = 0.5

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        r = jnp.asarray(self.r, dtype)
        p = jnp.asarray(self.p, dtype)
        x = jnp.asarray(x, dtype)
        return (
            jsp.gammaln(x + r)
            - jsp.gammaln(r)
            - jsp.gammaln(x + 1.0)
            + r * jnp.log(p)
            + x * jnp.log1p(-p)
        )

    def sample(self, key, sample_shape=()):
        kg, kp = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.r, self.p, float)
        lam = jax.random.gamma(kg, jnp.asarray(self.r, dtype), shape, dtype) * (
            (1.0 - jnp.asarray(self.p, dtype)) / jnp.asarray(self.p, dtype)
        )
        return jax.random.poisson(kp, lam, shape)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        r = jnp.asarray(self.r, dtype)
        p = jnp.asarray(self.p, dtype)
        k = jnp.floor(jnp.asarray(x, dtype))
        return jnp.where(k >= 0, jsp.betainc(r, jnp.maximum(k, 0.0) + 1.0, p), 0.0)

    @property
    def support(self):
        from .base import DISCRETE

        return DISCRETE
