"""Product distributions over heterogeneous components.

Counterparts of Distributions.jl's `product_distribution` (array and
NamedTuple variants) that the reference's VectorBijectors layer dispatches on
(/root/reference/src/vector/product/product.jl). Samples are pytrees:

  IIDProduct(base, n):   sample shape (n,) + base.event_shape — the
                         homogeneous fast path (one vmapped bijector; the
                         TPU-native analogue of the reference's
                         `Elementwise`/Fill optimization, product/fill.jl)
  Product(components):   sample is a tuple of component samples
  NamedProduct(dict):    sample is a dict of component samples
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass
from .base import Distribution, Support


@pytree_dataclass(meta_fields=("n",))
class IIDProduct(Distribution):
    """n iid copies of a base distribution, stacked on a new leading event axis."""

    base: Distribution
    n: int

    @property
    def event_ndims(self):  # type: ignore[override]
        return self.base.event_ndims + 1

    @property
    def event_shape(self):
        return (self.n,) + tuple(self.base.event_shape)

    @property
    def batch_shape(self):
        return self.base.batch_shape

    def logpdf(self, x):
        lp = self.base.logpdf(x)
        # base.logpdf broadcasts; sum over the iid axis
        return jnp.sum(lp, axis=-1)

    def sample(self, key, sample_shape=()):
        return self.base.sample(key, tuple(sample_shape) + (self.n,))

    @property
    def support(self) -> Support:
        return self.base.support

    def in_support(self, x, atol: float = 1e-8):
        ok = self.base.in_support(x, atol)
        return jnp.all(ok, axis=-1)


@pytree_dataclass
class ElementwiseProduct(Distribution):
    """product_distribution of an ARRAY of same-family scalar distributions
    with per-element parameters — the Distributions.jl `arraydist` /
    `product_distribution(Normal.(mu, sigma))` analogue (reference
    src/vector/product/product.jl array variant). `base` is the scalar
    family with 1-D batch_shape (n,); the sample is an (n,) array and
    logpdf sums the per-element densities.

    For SHARED parameters use IIDProduct (same semantics, scalar base);
    for heterogeneous families use Product/NamedProduct."""

    base: Distribution

    @property
    def n(self) -> int:
        return int(self.base.batch_shape[-1])

    @property
    def event_ndims(self):  # type: ignore[override]
        return self.base.event_ndims + 1

    @property
    def event_shape(self):
        return (self.n,) + tuple(self.base.event_shape)

    @property
    def batch_shape(self):
        return ()

    def logpdf(self, x):
        return jnp.sum(self.base.logpdf(x), axis=-1)

    def sample(self, key, sample_shape=()):
        # base.sample returns sample_shape + batch_shape == (..., n)
        return self.base.sample(key, sample_shape)

    @property
    def support(self) -> Support:
        return self.base.support

    def in_support(self, x, atol: float = 1e-8):
        return jnp.all(self.base.in_support(x, atol), axis=-1)


def arraydist(base: Distribution) -> ElementwiseProduct:
    """Distributions.jl `arraydist` analogue: the per-element-parameter
    product of a family — `arraydist(Normal.(mu, sigma))` for scalar
    events, or e.g. a stack of per-group Dirichlets/LKJs for vector/matrix
    events (batched parameters, one block axis). Validates the base."""
    if len(base.batch_shape) != 1:
        raise ValueError(
            "arraydist needs a base with 1-D batch_shape (per-element "
            f"parameters); got {base.batch_shape}"
        )
    return ElementwiseProduct(base)


@pytree_dataclass
class Product(Distribution):
    """Heterogeneous product; sample is a tuple of component samples."""

    components: tuple

    @property
    def event_shape(self):
        return tuple(c.event_shape for c in self.components)

    def logpdf(self, x):
        lps = [c.logpdf(xi) for c, xi in zip(self.components, x)]
        out = lps[0]
        for lp in lps[1:]:
            out = out + lp
        return out

    def sample(self, key, sample_shape=()):
        keys = jax.random.split(key, len(self.components))
        return tuple(
            c.sample(k, sample_shape) for c, k in zip(self.components, keys)
        )

    @property
    def support(self) -> Support:
        return Support("product")


@pytree_dataclass(meta_fields=("names",))
class NamedProduct(Distribution):
    """Named heterogeneous product; sample is a dict (the reference's
    ProductNamedTupleDistribution, src/bijectors/named_stacked.jl:64-95)."""

    components: tuple
    names: tuple

    @classmethod
    def of(cls, **dists):
        names = tuple(dists.keys())  # preserve declaration order
        return cls(tuple(dists[n] for n in names), names)

    @property
    def event_shape(self):
        return {n: c.event_shape for n, c in zip(self.names, self.components)}

    def logpdf(self, x):
        lps = [c.logpdf(x[n]) for n, c in zip(self.names, self.components)]
        out = lps[0]
        for lp in lps[1:]:
            out = out + lp
        return out

    def sample(self, key, sample_shape=()):
        keys = jax.random.split(key, len(self.components))
        return {
            n: c.sample(k, sample_shape)
            for n, c, k in zip(self.names, self.components, keys)
        }

    @property
    def support(self) -> Support:
        return Support("product")
