"""Affine (location-scale) transformed distributions: `a * d + b`.

The reference's test matrix exercises affine-transformed univariates
(`Logistic() + 2`, `Gamma(2, 3) * -3`, ..., /root/reference/test/vector/
univariate.jl:78-89) via Distributions.jl's `AffineDistribution`. Here this is
a first-class wrapper: the support interval maps through the affine map
(flipping bounds under negative scale), so the registry's generic interval
branch picks the right link automatically — including the monotone-decreasing
negative-scale case the reference handles with sign-aware Log/Exp links
(src/vector/univariate/positive.jl:10-79).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass
from .base import Distribution, Support


def _static(v):
    return float(v) if isinstance(v, (int, float)) else None


@pytree_dataclass(meta_fields=("loc_static", "scale_static"))
class Affine(Distribution):
    """`X = loc + scale * base`, scalar-event base, scale != 0 (may be < 0)."""

    base: Distribution
    loc: jax.Array | float = 0.0
    scale: jax.Array | float = 1.0
    loc_static: float | None = None
    scale_static: float | None = None

    def __post_init__(self):
        if self.base.event_ndims != 0:
            raise ValueError("Affine requires a scalar-event base distribution")
        if self.loc_static is None and isinstance(self.loc, (int, float)):
            object.__setattr__(self, "loc_static", float(self.loc))
        if self.scale_static is None and isinstance(self.scale, (int, float)):
            if self.scale == 0:
                raise ValueError("Affine scale must be nonzero")
            object.__setattr__(self, "scale_static", float(self.scale))

    def _z(self, x):
        return (x - self.loc) / self.scale

    def logpdf(self, x):
        dtype = jnp.result_type(x, float)
        return self.base.logpdf(self._z(x)) - jnp.log(
            jnp.abs(jnp.asarray(self.scale, dtype))
        )

    def sample(self, key, sample_shape=()):
        return self.loc + self.scale * self.base.sample(key, sample_shape)

    def cdf(self, x):
        F = self.base.cdf(self._z(x))
        s = self.scale_static
        if s is not None:
            return F if s > 0 else 1.0 - F
        return jnp.where(jnp.asarray(self.scale) > 0, F, 1.0 - F)

    def quantile(self, q):
        s = self.scale_static
        if s is not None:
            if s < 0:
                q = 1.0 - q
        else:
            q = jnp.where(jnp.asarray(self.scale) > 0, q, 1.0 - q)
        return self.loc + self.scale * self.base.quantile(q)

    @property
    def support(self):
        bs = self.base.support
        if bs.kind != "interval":
            raise ValueError(f"Affine of {bs.kind}-supported base unsupported")
        l, s = self.loc_static, self.scale_static
        if l is None or s is None:
            # traced loc/scale: bounds can't be static; only the unbounded
            # case keeps a valid static registry entry
            if not bs.lower_finite and not bs.upper_finite:
                return bs
            raise ValueError("Affine with traced loc/scale over bounded support")

        def _map(v, finite):
            if not finite:
                # v is +-inf; the image side depends on the sign of s
                return math.inf if (v == math.inf) == (s > 0) else -math.inf
            return l + s * v  # python float or finite array bound

        lo, hi = _map(bs.lower, bs.lower_finite), _map(bs.upper, bs.upper_finite)
        lf, uf = bs.lower_finite, bs.upper_finite
        if s < 0:
            lo, hi = hi, lo
            lf, uf = uf, lf
        return Support("interval", lo, hi, lf, uf)


def affine(base: Distribution, loc=0.0, scale=1.0) -> Distribution:
    """Build `loc + scale * base`, flattening nested Affine wrappers."""
    if isinstance(base, Affine):
        return affine(base.base, loc + scale * base.loc, scale * base.scale)
    if (
        isinstance(loc, (int, float))
        and isinstance(scale, (int, float))
        and loc == 0.0
        and scale == 1.0
    ):
        return base
    return Affine(base, loc, scale)
