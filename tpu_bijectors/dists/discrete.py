"""Discrete families, part 2 — completing the reference test-matrix rows
(/root/reference/test/vector/univariate.jl:58-73): BernoulliLogit,
BetaBinomial, Dirac, DiscreteUniform, DiscreteNonParametric, Hypergeometric,
PoissonBinomial, Skellam, Soliton. All map to the identity link
(src/transformed_distribution.jl:75-76); their role in the framework is
logpmf + sampling for the vectorize/test sweeps.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

from ..tree import pytree_dataclass
from .base import DISCRETE, Distribution

_N_BESSEL = 96  # static series length for log I_k


def _log_binom(n, k):
    return jsp.gammaln(n + 1.0) - jsp.gammaln(k + 1.0) - jsp.gammaln(n - k + 1.0)


@pytree_dataclass
class BernoulliLogit(Distribution):
    logitp: jax.Array | float = 0.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        l = jnp.asarray(self.logitp, dtype)
        x = jnp.asarray(x, dtype)
        # x*l - softplus(l) == log sigmoid(l) at x=1, log sigmoid(-l) at x=0
        return x * l - jax.nn.softplus(l)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(key, jax.nn.sigmoid(jnp.asarray(self.logitp)), shape).astype(jnp.int32)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        p = jax.nn.sigmoid(jnp.asarray(self.logitp, dtype))
        x = jnp.asarray(x, dtype)
        return jnp.where(x < 0, 0.0, jnp.where(x < 1, 1.0 - p, 1.0))

    @property
    def support(self):
        return DISCRETE


@pytree_dataclass(meta_fields=("n",))
class BetaBinomial(Distribution):
    n: int = 1
    a: jax.Array | float = 1.0
    b: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        a = jnp.asarray(self.a, dtype)
        b = jnp.asarray(self.b, dtype)
        x = jnp.asarray(x, dtype)
        n = float(self.n)
        valid = (x >= 0) & (x <= n)
        xc = jnp.clip(x, 0.0, n)  # avoid -inf + inf = NaN outside support
        lp = _log_binom(n, xc) + jsp.betaln(xc + a, n - xc + b) - jsp.betaln(a, b)
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key, sample_shape=()):
        kp, kb = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.a, self.b, float)
        p = jax.random.beta(kp, self.a, self.b, shape, dtype)
        return jax.random.binomial(kb, self.n, p, shape).astype(jnp.int32)

    def cdf(self, x):
        # static-n pmf sum: F(k) = sum_{j<=k} pmf(j)
        dtype = jnp.result_type(x, float)
        ks = jnp.arange(self.n + 1, dtype=dtype)
        pmf = jnp.exp(self.logpdf(ks))
        k = jnp.floor(jnp.asarray(x, dtype))
        return jnp.sum(jnp.where(ks <= k[..., None], pmf, 0.0), axis=-1)

    @property
    def support(self):
        return DISCRETE


@pytree_dataclass
class Dirac(Distribution):
    """Point mass at `value` (registry: identity link, logpdf 0/-inf)."""

    value: jax.Array | float = 0.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        return jnp.where(jnp.asarray(x, dtype) == self.value, 0.0, -jnp.inf)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.broadcast_to(jnp.asarray(self.value), shape)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        return jnp.where(jnp.asarray(x, dtype) >= self.value, 1.0, 0.0)

    @property
    def support(self):
        return DISCRETE


@pytree_dataclass(meta_fields=("a", "b"))
class DiscreteUniform(Distribution):
    a: int = 0
    b: int = 1

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        x = jnp.asarray(x, dtype)
        inside = (x >= self.a) & (x <= self.b)
        return jnp.where(inside, -math.log(self.b - self.a + 1), -jnp.inf)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.randint(key, shape, self.a, self.b + 1)

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        k = jnp.floor(jnp.asarray(x, dtype))
        return jnp.clip((k - self.a + 1.0) / (self.b - self.a + 1.0), 0.0, 1.0)

    @property
    def support(self):
        return DISCRETE


@pytree_dataclass
class DiscreteNonParametric(Distribution):
    """Arbitrary finite support: values xs (static length) with probs ps."""

    xs: jax.Array
    ps: jax.Array

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        x = jnp.asarray(x, dtype)
        match = x[..., None] == jnp.asarray(self.xs, dtype)
        p = jnp.sum(jnp.where(match, jnp.asarray(self.ps, dtype), 0.0), axis=-1)
        return jnp.log(jnp.maximum(p, jnp.finfo(dtype).tiny)) + jnp.where(
            jnp.any(match, axis=-1), 0.0, -jnp.inf
        )

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        idx = jax.random.categorical(key, jnp.log(jnp.asarray(self.ps)), shape=shape)
        return jnp.asarray(self.xs)[idx]

    def cdf(self, x):
        dtype = jnp.result_type(x, float)
        x = jnp.asarray(x, dtype)
        le = jnp.asarray(self.xs, dtype) <= x[..., None]
        return jnp.sum(jnp.where(le, jnp.asarray(self.ps, dtype), 0.0), axis=-1)

    @property
    def support(self):
        return DISCRETE


@pytree_dataclass(meta_fields=("ns", "nf", "n"))
class Hypergeometric(Distribution):
    """Successes drawn in n draws w/o replacement from ns successes + nf failures."""

    ns: int = 1
    nf: int = 1
    n: int = 1

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        x = jnp.asarray(x, dtype)
        return (
            _log_binom(float(self.ns), x)
            + _log_binom(float(self.nf), self.n - x)
            - _log_binom(float(self.ns + self.nf), float(self.n))
        )

    def sample(self, key, sample_shape=()):
        # top-n of random keys over the ns+nf items == uniform draw w/o
        # replacement; count successes among them (static shapes)
        shape = tuple(sample_shape)
        total = self.ns + self.nf
        g = jax.random.uniform(key, shape + (total,))
        _, idx = jax.lax.top_k(g, self.n)
        return jnp.sum(idx < self.ns, axis=-1)

    @property
    def support(self):
        return DISCRETE


@pytree_dataclass
class PoissonBinomial(Distribution):
    """Sum of independent Bernoulli(ps_i): pmf by dynamic-programming
    convolution over the (static-length) probability vector via lax.scan."""

    ps: jax.Array

    def _pmf_vector(self, dtype):
        ps = jnp.asarray(self.ps, dtype)
        n = ps.shape[-1]
        pmf0 = jnp.zeros(n + 1, dtype).at[0].set(1.0)

        def step(pmf, p):
            shifted = jnp.concatenate([jnp.zeros(1, dtype), pmf[:-1]])
            return pmf * (1.0 - p) + shifted * p, None

        pmf, _ = jax.lax.scan(step, pmf0, ps)
        return pmf

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        pmf = self._pmf_vector(dtype)
        xi = jnp.clip(jnp.asarray(x).astype(jnp.int32), 0, pmf.shape[0] - 1)
        p = pmf[xi]
        valid = (jnp.asarray(x, dtype) >= 0) & (jnp.asarray(x, dtype) <= pmf.shape[0] - 1)
        return jnp.where(valid, jnp.log(jnp.maximum(p, jnp.finfo(dtype).tiny)), -jnp.inf)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape)
        n = jnp.shape(self.ps)[-1]
        u = jax.random.uniform(key, shape + (n,))
        return jnp.sum(u < jnp.asarray(self.ps), axis=-1)

    @property
    def support(self):
        return DISCRETE


def _log_bessel_i(order, z):
    """log I_order(z) for integer order >= 0, via the ascending series
    sum_m (z/2)^{2m+order} / (m! (m+order)!) — windowed logsumexp centered
    on the dominant term (m* ~ z/2 for large z, beyond a fixed truncation;
    see univariate3._windowed_series_logsumexp)."""
    from .univariate3 import _windowed_series_logsumexp

    dtype = z.dtype
    log_half_z = jnp.log(jnp.maximum(0.5 * z, jnp.finfo(dtype).tiny))

    def lt(m):
        return (
            (2.0 * m + order[..., None]) * log_half_z[..., None]
            - jsp.gammaln(m + 1.0)
            - jsp.gammaln(m + order[..., None] + 1.0)
        )

    return _windowed_series_logsumexp(lt, dtype, n=_N_BESSEL)


@pytree_dataclass
class Skellam(Distribution):
    """Difference of two independent Poissons: pmf(k) =
    e^{-(m1+m2)} (m1/m2)^{k/2} I_|k|(2 sqrt(m1 m2))."""

    mu1: jax.Array | float = 1.0
    mu2: jax.Array | float = 1.0

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        m1 = jnp.asarray(self.mu1, dtype)
        m2 = jnp.asarray(self.mu2, dtype)
        k = jnp.asarray(x, dtype)
        z = 2.0 * jnp.sqrt(m1 * m2)
        return (
            -(m1 + m2)
            + 0.5 * k * (jnp.log(m1) - jnp.log(m2))
            + _log_bessel_i(jnp.abs(k), jnp.broadcast_to(z, jnp.shape(k)))
        )

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = tuple(sample_shape) + self.batch_shape
        n1 = jax.random.poisson(k1, jnp.asarray(self.mu1), shape)
        n2 = jax.random.poisson(k2, jnp.asarray(self.mu2), shape)
        return n1 - n2

    @property
    def support(self):
        return DISCRETE


@pytree_dataclass(meta_fields=("K", "M", "delta"))
class Soliton(Distribution):
    """Robust soliton distribution on {1..K} with spike at M (LT codes;
    Distributions.jl Soliton(K, M, delta)). rho(1)=1/K, rho(i)=1/(i(i-1));
    tau(i)=1/(iM) for i<M, tau(M)=log(R/delta)/M with R=K/M, else 0;
    pmf = (rho+tau)/beta."""

    K: int = 10
    M: int = 5
    delta: float = 0.1

    def _pmf(self):
        i = np.arange(1, self.K + 1, dtype=np.float64)
        rho = np.where(i == 1, 1.0 / self.K, 1.0 / (i * np.maximum(i - 1.0, 1.0)))
        R = self.K / self.M
        tau = np.where(
            i < self.M,
            1.0 / (i * self.M),
            np.where(i == self.M, math.log(R / self.delta) / self.M, 0.0),
        )
        p = rho + tau
        return p / p.sum()

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        pmf = jnp.asarray(self._pmf(), dtype)
        xi = jnp.clip(jnp.asarray(x).astype(jnp.int32) - 1, 0, self.K - 1)
        valid = (jnp.asarray(x, dtype) >= 1) & (jnp.asarray(x, dtype) <= self.K)
        return jnp.where(valid, jnp.log(pmf[xi]), -jnp.inf)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape)
        idx = jax.random.categorical(key, jnp.log(jnp.asarray(self._pmf())), shape=shape)
        return idx + 1

    @property
    def support(self):
        return DISCRETE
