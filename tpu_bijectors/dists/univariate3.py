"""Univariate families, part 3 — the remaining rows of the reference test
matrix (/root/reference/test/vector/univariate.jl:1-98; SURVEY.md §2.7):
Erlang, LogUniform, JohnsonSU, NormalCanon, Biweight, Triweight,
SymTriangularDist, PGeneralizedGaussian, Rician, Lindley, Kolmogorov,
the noncentral families (Chisq/Beta/F/T via Poisson-mixture / power series —
static-length logsumexp reductions, branch-free on the VPU), the
NormalInverseGaussian (Bessel-K1 via Abramowitz-Stegun minimax polynomials),
SkewedExponentialPower, and StudentizedRange (fixed Gauss-Legendre
quadrature: static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

from ..tree import pytree_dataclass
from .base import Distribution, Support, positive, real_line, unit_interval

LOG2PI = math.log(2.0 * math.pi)
LOGPI = math.log(math.pi)
LOG2 = math.log(2.0)

# number of terms for the Poisson-mixture / power-series densities; all sums
# are static-length and fused into one logsumexp reduction
_N_SERIES = 128


def _signed_logsumexp(log_abs, sign, axis=-1):
    """logsumexp of signed terms: returns log|sum| (sum assumed positive)."""
    m = jnp.max(log_abs, axis=axis, keepdims=True)
    s = jnp.sum(sign * jnp.exp(log_abs - m), axis=axis)
    return jnp.squeeze(m, axis) + jnp.log(s)


def _pois_logweights(half_lam, n, dtype):
    j = jnp.arange(n, dtype=dtype)
    return -half_lam + j * jnp.log(half_lam) - jsp.gammaln(j + 1.0), j


# coarse argmax grid for the windowed series: exact small indices, then
# powers of two out to 2^20 (static — shapes never depend on parameters)
_SERIES_COARSE = np.concatenate([np.arange(0.0, 32.0), 2.0 ** np.arange(5, 21)])


def _windowed_series_logsumexp(log_term, dtype, n=_N_SERIES):
    """logsumexp over j = 0, 1, 2, ... of `log_term(j)`, truncated to an
    n-point window centered on the dominant term — uniformly accurate in the
    parameters, unlike a fixed j = 0..n-1 truncation (Poisson-mixture
    weights peak near j ~ lambda/2, far past any static window for large
    noncentrality; caught by scipy-parity probes at lambda >= 200).

    `log_term` must broadcast over a trailing j-axis and be unimodal in j
    with curvature ~ -2/j (all the Poisson-mixture / Bessel-series
    summands). The center is located by argmax on a static coarse grid
    (_SERIES_COARSE) followed by three linear refinements — all static
    shapes, so traced parameters under jit are fine. For peaks wider than
    the window (sigma = sqrt(j*/2) > n/16) the sum switches to a
    stride-s midpoint rule (+log s); the aliasing error of sampling a
    smooth ~Gaussian summand at stride s is e^{-2 pi^2 (sigma/s)^2},
    negligible at the enforced sigma/s >= n/16. Exact discrete sum when
    s == 1 (every small-parameter case)."""
    jg = jnp.asarray(_SERIES_COARSE, dtype)
    coarse = log_term(jg)
    jc = jg[jnp.argmax(coarse, axis=-1)]
    for frac in (0.75, 0.05, 0.0035):
        half = jnp.maximum(frac * jc, 4.0)
        grid = jnp.maximum(
            jc[..., None] + jnp.linspace(-1.0, 1.0, 33, dtype=dtype) * half[..., None],
            0.0,
        )
        v = log_term(grid)
        jc = jnp.take_along_axis(grid, jnp.argmax(v, axis=-1)[..., None], -1)[..., 0]
    sigma = jnp.sqrt(jnp.maximum(jc, 1.0) / 2.0)
    s = jnp.maximum(jnp.ceil(16.0 * sigma / n), 1.0)
    j0 = jnp.floor(jnp.maximum(jc - s * (n / 2), 0.0))
    j = j0[..., None] + s[..., None] * jnp.arange(n, dtype=dtype)
    return jsp.logsumexp(log_term(j), axis=-1) + jnp.log(s)


# ---------------------------------------------------------------------------
# simple closed-form families
# ---------------------------------------------------------------------------


@pytree_dataclass
class Erlang(Distribution):
    """Erlang(k, theta) — Gamma with integer shape (kept as its own family to
    mirror the reference's PositiveDistribution union, src/Bijectors.jl:268)."""

    k: jax.Array | float = 1.0
    theta: jax.Array | float = 1.0  # scale

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        k = jnp.asarray(self.k, dtype)
        th = jnp.asarray(self.theta, dtype)
        return (k - 1.0) * jnp.log(x) - x / th - k * jnp.log(th) - jsp.gammaln(k)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.k, self.theta, float)
        return self.theta * jax.random.gamma(key, jnp.asarray(self.k, dtype), shape, dtype)

    def cdf(self, x):
        return jsp.gammainc(jnp.asarray(self.k, jnp.result_type(x, float)), x / self.theta)

    @property
    def support(self):
        return positive()


@pytree_dataclass(meta_fields=("a_static", "b_static"))
class LogUniform(Distribution):
    a: jax.Array | float = 1.0
    b: jax.Array | float = math.e
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
        return -jnp.log(x) - jnp.log(jnp.log(b) - jnp.log(a))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.a, self.b, float)
        u = jax.random.uniform(key, shape, dtype)
        la, lb = jnp.log(jnp.asarray(self.a, dtype)), jnp.log(jnp.asarray(self.b, dtype))
        return jnp.exp(la + u * (lb - la))

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        la = jnp.log(jnp.asarray(self.a, dtype))
        lb = jnp.log(jnp.asarray(self.b, dtype))
        return (jnp.log(x) - la) / (lb - la)

    def quantile(self, q):
        dtype = jnp.result_type(q, float)
        la = jnp.log(jnp.asarray(self.a, dtype))
        lb = jnp.log(jnp.asarray(self.b, dtype))
        return jnp.exp(la + q * (lb - la))

    @property
    def support(self):
        lo = self.a_static if self.a_static is not None else self.a
        hi = self.b_static if self.b_static is not None else self.b
        return Support("interval", lo, hi, True, True)


@pytree_dataclass
class JohnsonSU(Distribution):
    """Johnson S_U(xi, lam, gamma, delta): gamma + delta*asinh((x-xi)/lam) ~ N(0,1)."""

    xi: jax.Array | float = 0.0
    lam: jax.Array | float = 1.0
    gamma: jax.Array | float = 0.0
    delta: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        lam = jnp.asarray(self.lam, dtype)
        delta = jnp.asarray(self.delta, dtype)
        z = (x - self.xi) / lam
        w = self.gamma + delta * jnp.arcsinh(z)
        return (
            jnp.log(delta)
            - jnp.log(lam)
            - 0.5 * (LOG2PI + jnp.log1p(z * z))
            - 0.5 * w * w
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.xi, self.lam, self.gamma, self.delta, float)
        z = jax.random.normal(key, shape, dtype)
        return self.xi + self.lam * jnp.sinh((z - self.gamma) / self.delta)

    def cdf(self, x):
        z = (x - self.xi) / self.lam
        return jsp.ndtr(self.gamma + self.delta * jnp.arcsinh(z))

    def quantile(self, q):
        return self.xi + self.lam * jnp.sinh((jsp.ndtri(q) - self.gamma) / self.delta)


@pytree_dataclass
class NormalCanon(Distribution):
    """Canonical-form normal: potential eta, precision lam (mean eta/lam)."""

    eta: jax.Array | float = 0.0
    lam: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        lam = jnp.asarray(self.lam, dtype)
        mu = self.eta / lam
        return 0.5 * (jnp.log(lam) - LOG2PI) - 0.5 * lam * (x - mu) ** 2

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.eta, self.lam, float)
        lam = jnp.asarray(self.lam, dtype)
        return self.eta / lam + jax.random.normal(key, shape, dtype) / jnp.sqrt(lam)

    def cdf(self, x):
        lam = jnp.asarray(self.lam, jnp.result_type(x, float))
        return jsp.ndtr((x - self.eta / lam) * jnp.sqrt(lam))

    def quantile(self, q):
        lam = jnp.asarray(self.lam, jnp.result_type(q, float))
        return self.eta / lam + jsp.ndtri(q) / jnp.sqrt(lam)


def _bounded_kernel_support(mu, s):
    # bounds may be python floats (static) or arrays (traced) — both finite
    return Support("interval", mu - s, mu + s, True, True)


@pytree_dataclass
class Biweight(Distribution):
    """(15/16)(1-z^2)^2 kernel on [mu-s, mu+s]."""

    mu: jax.Array | float = 0.0
    s: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        s = jnp.asarray(self.s, dtype)
        z = (x - self.mu) / s
        return jnp.log(15.0 / 16.0) + 2.0 * jnp.log1p(-z * z) - jnp.log(s)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.s, float)
        u = jax.random.beta(key, 3.0, 3.0, shape, dtype)
        return self.mu + self.s * (2.0 * u - 1.0)

    def cdf(self, x):
        mu = jnp.asarray(self.mu, jnp.result_type(x, float))
        s = jnp.asarray(self.s, jnp.result_type(x, float))
        z = jnp.clip((x - mu) / s, -1.0, 1.0)
        return 0.5 + (15.0 * z - 10.0 * z ** 3 + 3.0 * z ** 5) / 16.0

    @property
    def support(self):
        return _bounded_kernel_support(self.mu, self.s)


@pytree_dataclass
class Triweight(Distribution):
    """(35/32)(1-z^2)^3 kernel on [mu-s, mu+s]."""

    mu: jax.Array | float = 0.0
    s: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        s = jnp.asarray(self.s, dtype)
        z = (x - self.mu) / s
        return jnp.log(35.0 / 32.0) + 3.0 * jnp.log1p(-z * z) - jnp.log(s)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.s, float)
        u = jax.random.beta(key, 4.0, 4.0, shape, dtype)
        return self.mu + self.s * (2.0 * u - 1.0)

    def cdf(self, x):
        mu = jnp.asarray(self.mu, jnp.result_type(x, float))
        s = jnp.asarray(self.s, jnp.result_type(x, float))
        z = jnp.clip((x - mu) / s, -1.0, 1.0)
        return 0.5 + (35.0 * z - 35.0 * z ** 3 + 21.0 * z ** 5 - 5.0 * z ** 7) / 32.0

    @property
    def support(self):
        return _bounded_kernel_support(self.mu, self.s)


@pytree_dataclass
class SymTriangularDist(Distribution):
    """(1-|z|)/s triangle on [mu-s, mu+s]."""

    mu: jax.Array | float = 0.0
    s: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        s = jnp.asarray(self.s, dtype)
        z = (x - self.mu) / s
        return jnp.log1p(-jnp.abs(z)) - jnp.log(s)

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.s, float)
        u = jax.random.uniform(k1, shape, dtype) - jax.random.uniform(k2, shape, dtype)
        return self.mu + self.s * u

    def cdf(self, x):
        z = jnp.clip((x - self.mu) / self.s, -1.0, 1.0)
        return jnp.where(z < 0, 0.5 * (1.0 + z) ** 2, 1.0 - 0.5 * (1.0 - z) ** 2)

    def quantile(self, q):
        z = jnp.where(
            q < 0.5,
            jnp.sqrt(jnp.maximum(2.0 * q, 0.0)) - 1.0,
            1.0 - jnp.sqrt(jnp.maximum(2.0 * (1.0 - q), 0.0)),
        )
        return self.mu + self.s * z

    @property
    def support(self):
        return _bounded_kernel_support(self.mu, self.s)


@pytree_dataclass
class PGeneralizedGaussian(Distribution):
    """p-generalized Gaussian (scipy gennorm): pdf = p/(2a Gamma(1/p)) e^{-|z|^p}."""

    p: jax.Array | float = 2.0
    mu: jax.Array | float = 0.0
    alpha: jax.Array | float = 1.0  # scale

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        p = jnp.asarray(self.p, dtype)
        a = jnp.asarray(self.alpha, dtype)
        z = jnp.abs((x - self.mu) / a)
        return jnp.log(p) - LOG2 - jnp.log(a) - jsp.gammaln(1.0 / p) - z**p

    def sample(self, key, sample_shape=()):
        kg, ks = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.p, self.mu, self.alpha, float)
        p = jnp.asarray(self.p, dtype)
        g = jax.random.gamma(kg, 1.0 / p, shape, dtype)
        sign = 2.0 * jax.random.bernoulli(ks, 0.5, shape).astype(dtype) - 1.0
        return self.mu + self.alpha * sign * g ** (1.0 / p)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        p = jnp.asarray(self.p, dtype)
        mu = jnp.asarray(self.mu, dtype)
        al = jnp.asarray(self.alpha, dtype)
        z = (x - mu) / al
        g = jsp.gammainc(1.0 / p, jnp.abs(z) ** p)
        return 0.5 + 0.5 * jnp.sign(z) * g


@pytree_dataclass
class Rician(Distribution):
    """Rice(nu, sigma): pdf = x/s^2 exp(-(x^2+nu^2)/(2s^2)) I0(x nu/s^2)."""

    nu: jax.Array | float = 0.0
    sigma: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        nu = jnp.asarray(self.nu, dtype)
        s2 = jnp.asarray(self.sigma, dtype) ** 2
        t = x * nu / s2
        # log I0(t) = log(i0e(t)) + |t|
        log_i0 = jnp.log(jsp.i0e(t)) + jnp.abs(t)
        return jnp.log(x) - jnp.log(s2) - (x * x + nu * nu) / (2.0 * s2) + log_i0

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.nu, self.sigma, float)
        z1 = jax.random.normal(k1, shape, dtype)
        z2 = jax.random.normal(k2, shape, dtype)
        return jnp.sqrt((self.nu + self.sigma * z1) ** 2 + (self.sigma * z2) ** 2)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Lindley(Distribution):
    """Lindley(theta): pdf = theta^2/(1+theta) (1+x) e^{-theta x}."""

    theta: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        th = jnp.asarray(self.theta, dtype)
        return 2.0 * jnp.log(th) - jnp.log1p(th) + jnp.log1p(x) - th * x

    def sample(self, key, sample_shape=()):
        km, ke, kg = jax.random.split(key, 3)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.theta, float)
        th = jnp.asarray(self.theta, dtype)
        # mixture: w.p. theta/(1+theta) Exp(theta), else Gamma(2, 1/theta)
        pick_exp = jax.random.uniform(km, shape, dtype) < th / (1.0 + th)
        g1 = jax.random.exponential(ke, shape, dtype) / th
        g2 = jax.random.gamma(kg, jnp.asarray(2.0, dtype), shape, dtype) / th
        return jnp.where(pick_exp, g1, g2)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        th = jnp.asarray(self.theta, dtype)
        return 1.0 - (1.0 + th * x / (1.0 + th)) * jnp.exp(-th * x)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class Kolmogorov(Distribution):
    """Kolmogorov-Smirnov limiting distribution of sup|B(t)|.

    pdf via the two theta-series (large-x: 8x sum (-1)^{k-1} k^2 e^{-2k^2x^2};
    small-x: Jacobi-transformed series), switched at x = 1 — both static-length
    sums, branch-free via where.
    """

    def _pdf_large(self, x):
        k = jnp.arange(1.0, 11.0)
        t = jnp.exp(-2.0 * (k * k)[..., :] * (x[..., None] ** 2))
        s = jnp.sum(((-1.0) ** (k - 1.0)) * k * k * t, axis=-1)
        return 8.0 * x * s

    def _pdf_small(self, x):
        xs = jnp.maximum(x, 0.05)
        k = jnp.arange(1.0, 11.0)
        a = ((2.0 * k - 1.0) ** 2) * (math.pi**2)
        e = jnp.exp(-a[..., :] / (8.0 * xs[..., None] ** 2))
        s = jnp.sum(e * (a[..., :] / (4.0 * xs[..., None] ** 2) - 1.0), axis=-1)
        return jnp.where(x > 0.04, math.sqrt(2.0 * math.pi) / (xs * xs) * s, 0.0)

    def logpdf(self, x):
        x = jnp.asarray(x, jnp.result_type(x, float))
        pdf = jnp.where(x < 1.0, self._pdf_small(x), self._pdf_large(x))
        return jnp.log(jnp.maximum(pdf, jnp.finfo(pdf.dtype).tiny))

    def cdf(self, x):
        x = jnp.asarray(x, jnp.result_type(x, float))
        xs = jnp.maximum(x, 0.05)
        k = jnp.arange(1.0, 11.0)
        large = 1.0 - 2.0 * jnp.sum(
            ((-1.0) ** (k - 1.0)) * jnp.exp(-2.0 * (k * k)[..., :] * (x[..., None] ** 2)),
            axis=-1,
        )
        small = (
            math.sqrt(2.0 * math.pi)
            / xs
            * jnp.sum(
                jnp.exp(-(((2.0 * k - 1.0) ** 2) * (math.pi**2))[..., :] / (8.0 * xs[..., None] ** 2)),
                axis=-1,
            )
        )
        return jnp.where(x < 1.0, jnp.where(x > 0.04, small, 0.0), large)

    def sample(self, key, sample_shape=()):
        # inverse-cdf via fixed bisection (cdf is smooth and monotone)
        shape = tuple(sample_shape)
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        u = jax.random.uniform(key, shape, dtype, minval=1e-12, maxval=1.0 - 1e-12)
        lo = jnp.full(shape, 0.1, dtype)
        hi = jnp.full(shape, 4.0, dtype)

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            go_hi = self.cdf(mid) < u
            return jnp.where(go_hi, mid, lo), jnp.where(go_hi, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 60, body, (lo, hi))
        return 0.5 * (lo + hi)

    @property
    def support(self):
        return positive()


# ---------------------------------------------------------------------------
# noncentral families (Poisson-mixture / power series)
# ---------------------------------------------------------------------------


@pytree_dataclass
class NoncentralChisq(Distribution):
    """ncx2(k, lam): Poisson(lam/2) mixture of central chi^2_{k+2j}."""

    k: jax.Array | float = 1.0
    lam: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        k = jnp.asarray(self.k, dtype)
        lam = jnp.asarray(self.lam, dtype)
        x = jnp.asarray(x, dtype)
        def lt(j):
            h = 0.5 * (k + 2.0 * j)
            return (
                -0.5 * lam
                + j * jnp.log(0.5 * lam)
                - jsp.gammaln(j + 1.0)
                + (h - 1.0) * jnp.log(x[..., None])
                - 0.5 * x[..., None]
                - h * LOG2
                - jsp.gammaln(h)
            )

        return _windowed_series_logsumexp(lt, dtype)

    def sample(self, key, sample_shape=()):
        kp, kg = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.k, self.lam, float)
        lam = jnp.asarray(self.lam, dtype)
        j = jax.random.poisson(kp, 0.5 * lam, shape)
        h = 0.5 * (jnp.asarray(self.k, dtype) + 2.0 * j.astype(dtype))
        return 2.0 * jax.random.gamma(kg, h, shape, dtype)

    @property
    def support(self):
        return positive()


@pytree_dataclass
class NoncentralBeta(Distribution):
    """Noncentral beta: Poisson(lam/2) mixture of Beta(a+j, b)."""

    a: jax.Array | float = 1.0
    b: jax.Array | float = 1.0
    lam: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        a = jnp.asarray(self.a, dtype)
        b = jnp.asarray(self.b, dtype)
        lam = jnp.asarray(self.lam, dtype)
        x = jnp.asarray(x, dtype)
        def lt(j):
            aj = a + j
            return (
                -0.5 * lam
                + j * jnp.log(0.5 * lam)
                - jsp.gammaln(j + 1.0)
                + (aj - 1.0) * jnp.log(x[..., None])
                + (b - 1.0) * jnp.log1p(-x[..., None])
                - (jsp.gammaln(aj) + jsp.gammaln(b) - jsp.gammaln(aj + b))
            )

        return _windowed_series_logsumexp(lt, dtype)

    def sample(self, key, sample_shape=()):
        kp, kb = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.a, self.b, self.lam, float)
        lam = jnp.asarray(self.lam, dtype)
        j = jax.random.poisson(kp, 0.5 * lam, shape).astype(dtype)
        return jax.random.beta(kb, jnp.asarray(self.a, dtype) + j, self.b, shape, dtype)

    @property
    def support(self):
        return unit_interval()


@pytree_dataclass
class NoncentralF(Distribution):
    """ncF(d1, d2, lam) = (ncx2(d1,lam)/d1) / (chi2(d2)/d2)."""

    d1: jax.Array | float = 1.0
    d2: jax.Array | float = 1.0
    lam: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        d1 = jnp.asarray(self.d1, dtype)
        d2 = jnp.asarray(self.d2, dtype)
        lam = jnp.asarray(self.lam, dtype)
        x = jnp.asarray(x, dtype)
        h2 = 0.5 * d2

        # central F(d1+2j, d2) with the d1/(d1+2j) scale folded in
        # (Wikipedia noncentral F density, term by term, in log space)
        def lt(j):
            h1 = 0.5 * d1 + j
            return (
                -0.5 * lam
                + j * jnp.log(0.5 * lam)
                - jsp.gammaln(j + 1.0)
                + h1 * (jnp.log(d1) - jnp.log(d2))
                + (h1 + h2) * jnp.log(d2 / (d2 + d1 * x[..., None]))
                + (h1 - 1.0) * jnp.log(x[..., None])
                - (jsp.gammaln(h1) + jsp.gammaln(h2) - jsp.gammaln(h1 + h2))
            )

        return _windowed_series_logsumexp(lt, dtype)

    def sample(self, key, sample_shape=()):
        kn, kd = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.d1, self.d2, self.lam, float)
        num = NoncentralChisq(self.d1, self.lam).sample(kn, sample_shape)
        den = 2.0 * jax.random.gamma(kd, 0.5 * jnp.asarray(self.d2, dtype), shape, dtype)
        return (num / self.d1) / (den / self.d2)

    @property
    def support(self):
        return positive()


_NCT_GH_NODES, _NCT_GH_WEIGHTS = np.polynomial.hermite.hermgauss(96)


@pytree_dataclass
class NoncentralT(Distribution):
    """nct(nu, delta) = (Z + delta) / sqrt(chi2_nu / nu).

    Density via the exact scale-mixture representation, integrated with a
    Laplace-centered 96-point Gauss-Hermite rule (static nodes, log domain):

      f(t) = C * int_0^inf r^nu exp(-nu r^2/2) exp(-(t r - delta)^2/2) dr,
      C = 2 (nu/2)^{nu/2} / (Gamma(nu/2) sqrt(2 pi)),

    integrated over s = log r (which absorbs the small-nu skew of the
    integrand): the log-integrand g(s) = (nu+1)s - nu e^{2s}/2
    - (t e^s - delta)^2/2 has closed-form mode r* = e^{s*}, the positive
    root of (nu+t^2) r^2 - t delta r - (nu+1) = 0, and Laplace width
    1/sqrt(t delta r* + 2(nu+1)) (provably positive). Unlike the classic
    power series this is uniformly accurate in delta — the series' terms
    peak near j ~ q^2/2 (q = t delta sqrt2/sqrt(t^2+nu)), far past any
    static truncation for |delta| beyond ~15, and alternate
    catastrophically for t*delta < 0.
    """

    nu: jax.Array | float = 1.0
    delta: jax.Array | float = 0.0

    def logpdf(self, t):
        dtype = jnp.result_type(t, float)
        nu = jnp.asarray(self.nu, dtype)
        d = jnp.asarray(self.delta, dtype)
        t = jnp.asarray(t, dtype)
        a = nu + t * t
        td = t * d
        rstar = (td + jnp.sqrt(td * td + 4.0 * (nu + 1.0) * a)) / (2.0 * a)
        sigma = 1.0 / jnp.sqrt(td * rstar + 2.0 * (nu + 1.0))
        x = jnp.asarray(_NCT_GH_NODES, dtype)
        logw = jnp.asarray(np.log(_NCT_GH_WEIGHTS), dtype)
        s = jnp.log(rstar)[..., None] + math.sqrt(2.0) * sigma[..., None] * x
        r = jnp.exp(s)
        g = (
            (nu[..., None] + 1.0) * s
            - 0.5 * nu[..., None] * r * r
            - 0.5 * jnp.square(t[..., None] * r - d[..., None])
        )
        log_int = jsp.logsumexp(g + x * x + logw, axis=-1) + 0.5 * LOG2 + jnp.log(
            sigma
        )
        logC = LOG2 + 0.5 * nu * (jnp.log(nu) - LOG2) - jsp.gammaln(0.5 * nu) - 0.5 * jnp.log(2.0 * jnp.pi)
        return logC + log_int

    def sample(self, key, sample_shape=()):
        kz, kc = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.nu, self.delta, float)
        nu = jnp.asarray(self.nu, dtype)
        z = jax.random.normal(kz, shape, dtype) + self.delta
        v = 2.0 * jax.random.gamma(kc, 0.5 * nu, shape, dtype)
        return z / jnp.sqrt(v / nu)


# ---------------------------------------------------------------------------
# NormalInverseGaussian (Bessel K1) and SkewedExponentialPower
# ---------------------------------------------------------------------------


def _log_k1(x):
    """log K1(x) via Abramowitz-Stegun 9.8.7/9.8.8 minimax polynomials
    (|rel err| < ~2e-7; the reference outsources this to SpecialFunctions)."""
    dtype = x.dtype
    xs = jnp.maximum(x, 1e-30)
    # x <= 2 branch: x*K1(x) = x*log(x/2)*I1(x) + poly((x/2)^2)
    t = jnp.minimum(xs, 2.0)
    q = (t / 2.0) ** 2
    p_small = (
        1.0
        + q * (0.15443144 + q * (-0.67278579 + q * (-0.18156897 + q * (-0.01919402 + q * (-0.00110404 + q * (-0.00004686))))))
    )
    i1 = jsp.i1e(t) * jnp.exp(t)
    k1_small = (t * jnp.log(t / 2.0) * i1 + p_small) / t
    log_k1_small = jnp.log(jnp.maximum(k1_small, jnp.finfo(dtype).tiny))
    # x >= 2 branch: sqrt(x) e^x K1(x) = poly(2/x)
    r = 2.0 / jnp.maximum(xs, 2.0)
    p_large = (
        1.25331414
        + r * (0.23498619 + r * (-0.03655620 + r * (0.01504268 + r * (-0.00780353 + r * (0.00325614 + r * (-0.00068245))))))
    )
    log_k1_large = jnp.log(p_large) - xs - 0.5 * jnp.log(xs)
    return jnp.where(xs <= 2.0, log_k1_small, log_k1_large)


@pytree_dataclass
class NormalInverseGaussian(Distribution):
    """NIG(mu, alpha, beta, delta): normal variance-mean mixture with
    InverseGaussian(delta/gamma, delta^2) mixing, gamma = sqrt(alpha^2-beta^2)."""

    mu: jax.Array | float = 0.0
    alpha: jax.Array | float = 1.0
    beta: jax.Array | float = 0.0
    delta: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        mu = jnp.asarray(self.mu, dtype)
        a = jnp.asarray(self.alpha, dtype)
        b = jnp.asarray(self.beta, dtype)
        de = jnp.asarray(self.delta, dtype)
        g = jnp.sqrt(a * a - b * b)
        r = jnp.sqrt(de * de + (x - mu) ** 2)
        return (
            jnp.log(a * de)
            - LOGPI
            + _log_k1(a * r)
            - jnp.log(r)
            + de * g
            + b * (x - mu)
        )

    def sample(self, key, sample_shape=()):
        kw, kz = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.alpha, self.beta, self.delta, float)
        a = jnp.asarray(self.alpha, dtype)
        b = jnp.asarray(self.beta, dtype)
        de = jnp.asarray(self.delta, dtype)
        g = jnp.sqrt(a * a - b * b)
        from .univariate2 import InverseGaussian

        w = InverseGaussian(de / g, de * de).sample(kw, shape)
        z = jax.random.normal(kz, shape, dtype)
        return self.mu + b * w + jnp.sqrt(w) * z


@pytree_dataclass
class SkewedExponentialPower(Distribution):
    """SEPD(mu, sigma, p, alpha) (Zhu & Galbraith 2010 as in Distributions.jl):
    f = 1/(2 sigma p^{1/p} Gamma(1+1/p)) exp(-1/p |z/(2 a)|^p), a = alpha for
    z<=0 else (1-alpha), z = (x-mu)/sigma. alpha=1/2 reduces to
    PGeneralizedGaussian(mu, sigma p^{1/p}, p)."""

    mu: jax.Array | float = 0.0
    sigma: jax.Array | float = 1.0
    p: jax.Array | float = 2.0
    alpha: jax.Array | float = 0.5

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        s = jnp.asarray(self.sigma, dtype)
        p = jnp.asarray(self.p, dtype)
        al = jnp.asarray(self.alpha, dtype)
        z = (x - self.mu) / s
        a = jnp.where(z <= 0, al, 1.0 - al)
        return (
            -LOG2
            - jnp.log(s)
            - jnp.log(p) / p
            - jsp.gammaln(1.0 + 1.0 / p)
            - jnp.abs(z / (2.0 * a)) ** p / p
        )

    def sample(self, key, sample_shape=()):
        km, kg = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.mu, self.sigma, self.p, self.alpha, float)
        p = jnp.asarray(self.p, dtype)
        al = jnp.asarray(self.alpha, dtype)
        left = jax.random.uniform(km, shape, dtype) < al
        g = jax.random.gamma(kg, 1.0 / p, shape, dtype)
        u = (p * g) ** (1.0 / p)
        z = jnp.where(left, -2.0 * al * u, 2.0 * (1.0 - al) * u)
        return self.mu + self.sigma * z


# ---------------------------------------------------------------------------
# StudentizedRange — nested fixed quadrature
# ---------------------------------------------------------------------------

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(96)


def _gl(a, b):
    """Gauss-Legendre nodes/weights on [a, b] (static arrays)."""
    x = 0.5 * (b - a) * (_GL_NODES + 1.0) + a
    w = 0.5 * (b - a) * _GL_WEIGHTS
    return jnp.asarray(x), jnp.asarray(w)


@pytree_dataclass
class StudentizedRange(Distribution):
    """q(nu, k) = range(Z_1..Z_k) / sqrt(chi2_nu/nu).

    pdf via the scipy-documented double integral evaluated with fixed 96-point
    Gauss-Legendre quadrature in both dimensions (static shapes, MXU-friendly
    outer products; no data-dependent control flow).
    """

    nu: jax.Array | float = 1.0
    k: jax.Array | float = 2.0

    def logpdf(self, q):
        dtype = jnp.result_type(q, float)
        nu = jnp.asarray(self.nu, dtype)
        k = jnp.asarray(self.k, dtype)
        q = jnp.asarray(q, dtype)

        s_x, s_w = _gl(1e-6, 8.0)  # s integrand decays like s^{nu-1}e^{-nu s^2/2}
        z_x, z_w = _gl(-9.0, 9.0)
        s_x = s_x.astype(dtype)
        z_x = z_x.astype(dtype)

        def phi(u):
            return jnp.exp(-0.5 * u * u) / math.sqrt(2.0 * math.pi)

        def Phi(u):
            return jsp.ndtr(u)

        # inner(u; qs) integrated over z for each s node
        qs = q[..., None] * s_x  # (..., S)
        z = z_x  # (Z,)
        pz = phi(z) * z_w  # (Z,) weights folded in
        # (Phi(z) − Phi(z−qs))^(k−2) via clamped exp∘log: the direct `pow`
        # has a NaN gradient at base 0 with exponent 0 (k = 2 — 0·∞ in the
        # power JVP); the clamp makes the derivative exactly 0 there
        diff = jnp.maximum(
            Phi(z) - Phi(z - qs[..., None]), jnp.finfo(dtype).tiny
        )
        inner = jnp.sum(
            pz * phi(z - qs[..., None]) * jnp.exp((k - 2.0) * jnp.log(diff)),
            axis=-1,
        )  # (..., S)
        outer = jnp.sum(
            s_w * s_x ** (nu - 1.0) * jnp.exp(-0.5 * nu * s_x * s_x) * s_x * inner,
            axis=-1,
        )
        log_c = (
            jnp.log(k)
            + jnp.log(k - 1.0)
            + 0.5 * nu * jnp.log(nu)
            - jsp.gammaln(0.5 * nu)
            - (0.5 * nu - 1.0) * LOG2
        )
        return log_c + jnp.log(jnp.maximum(outer, jnp.finfo(dtype).tiny))

    def sample(self, key, sample_shape=()):
        kz, kc = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.nu, self.k, float)
        nu = jnp.asarray(self.nu, dtype)
        if not isinstance(self.k, (int, float)):
            raise ValueError("StudentizedRange.sample needs a static k")
        n_k = int(self.k)
        z = jax.random.normal(kz, shape + (n_k,), dtype)
        rng = jnp.max(z, -1) - jnp.min(z, -1)
        v = 2.0 * jax.random.gamma(kc, 0.5 * nu, shape, dtype)
        return rng / jnp.sqrt(v / nu)

    @property
    def support(self):
        return positive()


@pytree_dataclass(meta_fields=("n",))
class KSOneSided(Distribution):
    """One-sided Kolmogorov-Smirnov statistic D_n^+ for sample size n.

    cdf by the Birnbaum-Tingey finite sum; logpdf differentiates the smooth
    terms (the reference's UnitDistribution union includes KSOneSided,
    src/Bijectors.jl:286)."""

    n: int = 10

    def _terms(self, d):
        """Birnbaum-Tingey summands T_j = C(n,j) a^{j-1} b^{n-j} (masked),
        with a = d + j/n, b = 1 - d - j/n, plus the safe a, b."""
        dtype = d.dtype
        n = self.n
        j = jnp.arange(n + 1, dtype=dtype)
        mask = j <= n * (1.0 - d[..., None])
        tiny = jnp.finfo(dtype).tiny
        a = jnp.maximum(d[..., None] + j / n, tiny)
        b = jnp.maximum(1.0 - d[..., None] - j / n, tiny)
        logc = jsp.gammaln(n + 1.0) - jsp.gammaln(j + 1.0) - jsp.gammaln(n - j + 1.0)
        t = jnp.where(
            mask,
            jnp.exp(logc + (j - 1.0) * jnp.log(a) + (n - j) * jnp.log(b)),
            0.0,
        )
        # entries with b at the clamp (masked, or the exact mask boundary
        # where b == 0) would overflow (n-j)/b; give them a harmless
        # denominator — t is 0 there anyway
        b_safe = jnp.where(mask & (b > tiny), b, 1.0)
        return t, a, b_safe, j

    def cdf(self, d):
        d = jnp.asarray(d, jnp.result_type(d, float))
        t, _, _, _ = self._terms(d)
        return 1.0 - d * jnp.sum(t, axis=-1)

    def logpdf(self, d):
        # cdf = 1 - d*S  =>  pdf = -S - d*S' = -S + d * sum_j T_j ((n-j)/b - (j-1)/a)
        d = jnp.asarray(d, jnp.result_type(d, float))
        t, a, b, j = self._terms(d)
        n = self.n
        S = jnp.sum(t, axis=-1)
        dS = jnp.sum(t * ((n - j) / b - (j - 1.0) / a), axis=-1)
        pdf = -S + d * dS
        return jnp.log(jnp.maximum(pdf, jnp.finfo(d.dtype).tiny))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape)
        u = jnp.sort(jax.random.uniform(key, shape + (self.n,)), axis=-1)
        i = jnp.arange(1, self.n + 1, dtype=u.dtype) / self.n
        return jnp.max(i - u, axis=-1)

    @property
    def support(self):
        return unit_interval()
