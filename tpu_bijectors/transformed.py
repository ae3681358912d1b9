"""TransformedDistribution: (base distribution, bijector) -> distribution.

TPU-native counterpart of /root/reference/src/transformed_distribution.jl.

  logpdf(td, y) = logpdf(base, b^{-1}(y)) + logdetJ(b^{-1}, y)
                  (transformed_distribution.jl:159-197)
  sample        = b(base.sample(key))  (transformed_distribution.jl:207-240)

Everything composes into ONE fused XLA computation when jitted — this is the
"single fused XLA computation" requirement of the north star (BASELINE.json).
"""

from __future__ import annotations

import jax.numpy as jnp

from .bijectors.base import Bijector, Block, Chain, inverse
from .bijectors.ordered import OrderedBijector
from .bijectors.scalar import SignFlip
from .dists.base import Distribution, Support
from .registry import _logpdf_eps_safe, bijector, register_bijector
from .tree import pytree_dataclass


@pytree_dataclass
class TransformedDistribution(Distribution):
    """Distribution of y = transform(x), x ~ base."""

    base: Distribution
    transform: Bijector

    @property
    def event_ndims(self):  # type: ignore[override]
        return _event_ndims_out(self.transform, self.base.event_ndims)

    @property
    def event_shape(self):
        return tuple(self.transform.forward_event_shape(self.base.event_shape))

    @property
    def batch_shape(self):
        return self.base.batch_shape

    def logpdf(self, y):
        x, ld = self.transform.inverse_and_log_det(y)
        lp = _logpdf_eps_safe(self.base, x)
        extra = self.base.event_ndims - _event_ndims_in(
            self.transform, self.base.event_ndims
        )
        if extra > 0:
            ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
        return lp + ld

    def sample(self, key, sample_shape=()):
        return self.transform.forward(self.base.sample(key, sample_shape))

    def sample_and_logpdf(self, key, sample_shape=()):
        x = self.base.sample(key, sample_shape)
        lp = self.base.logpdf(x)
        y, ld = self.transform.forward_and_log_det(x)
        extra = self.base.event_ndims - _event_ndims_in(
            self.transform, self.base.event_ndims
        )
        if extra > 0:
            ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
        return y, lp - ld

    @property
    def support(self) -> Support:
        # Unknown in general; the registry composes transforms instead.
        return Support("unknown")


def _event_ndims_in(b: Bijector, base_ndims: int) -> int:
    n = b.event_ndims_in
    return int(n)


def _event_ndims_out(b: Bijector, base_ndims: int) -> int:
    n_in = int(b.event_ndims_in)
    n_out = int(b.event_ndims_out)
    # scalar bijector on a vector base keeps the base's event rank
    return base_ndims - n_in + n_out if n_in <= base_ndims else n_out


def transformed(d: Distribution, b: Bijector | None = None) -> TransformedDistribution:
    """`transformed(d) = transformed(d, bijector(d))`
    (reference src/transformed_distribution.jl:37-38)."""
    if b is None:
        b = bijector(d)
    return TransformedDistribution(d, b)


# `bijector` of a TransformedDistribution composes away the wrapper
# (src/transformed_distribution.jl:45-48).
@register_bijector(TransformedDistribution)
def _bijector_transformed(td: TransformedDistribution):
    return Chain((bijector(td.base), inverse(td.transform)))


# ---------------------------------------------------------------------------
# ordered(d) — reference src/bijectors/ordered.jl:83-168
# ---------------------------------------------------------------------------


@pytree_dataclass
class OrderedDistribution(Distribution):
    """Restriction of a multivariate distribution to sorted vectors
    (un-normalized; see the caveats at ordered.jl:106-129)."""

    dist: Distribution
    transform: Bijector  # constrained(ordered) -> unconstrained

    event_ndims = 1

    @property
    def event_shape(self):
        return self.dist.event_shape

    @property
    def batch_shape(self):
        return self.dist.batch_shape

    def logpdf(self, x):
        lp = self.dist.logpdf(x)
        is_sorted = jnp.all(x[..., 1:] >= x[..., :-1], axis=-1)
        return jnp.where(is_sorted, lp, -jnp.inf)

    def sample(self, key, sample_shape=()):
        """Reference semantics: rejection-sample until sorted
        (ordered.jl:160-168). For exchangeable bases (IID products) sorting a
        draw IS a draw from the ordered restriction, so we keep that O(1)
        fast path; everything else gets a lax.while_loop rejection sampler
        (compiled control flow, no host round-trips)."""
        from .dists.product import IIDProduct

        if isinstance(self.dist, IIDProduct):
            x = self.dist.sample(key, sample_shape)
            return jnp.sort(x, axis=-1)
        return self._rejection_sample(key, sample_shape)

    def _rejection_sample(self, key, sample_shape=()):
        import jax
        from jax import lax

        def is_sorted(x):
            return jnp.all(x[..., 1:] >= x[..., :-1], axis=-1)

        key, sub = jax.random.split(key)
        x0 = self.dist.sample(sub, sample_shape)
        ok0 = is_sorted(x0)
        # Cap the rounds: acceptance is ~1/n! for weakly-coupled bases, so a
        # huge cap only triggers on misuse (large n); unaccepted rows are
        # poisoned with NaN rather than silently returned unsorted.
        max_rounds = 100_000

        def cond(state):
            _, _, ok, i = state
            return jnp.logical_and(~jnp.all(ok), i < max_rounds)

        def body(state):
            key, x, ok, i = state
            key, sub = jax.random.split(key)
            xn = self.dist.sample(sub, sample_shape)
            okn = is_sorted(xn)
            take = jnp.logical_and(~ok, okn)
            x = jnp.where(take[..., None], xn, x)
            return key, x, jnp.logical_or(ok, okn), i + 1

        _, x, ok, _ = lax.while_loop(cond, body, (key, x0, ok0, jnp.int32(0)))
        return jnp.where(ok[..., None], x, jnp.nan)

    @property
    def support(self):
        return Support("ordered")


def ordered(d: Distribution) -> OrderedDistribution:
    """Order-restricted version of `d` (reference `ordered`, ordered.jl:130-147)."""
    b = bijector(d)
    binv = inverse(b)
    flip = Block(SignFlip(), 1)  # batch-shaped log-det to match OrderedBijector
    if binv.monotonically_decreasing:
        ob = Chain((flip, inverse(OrderedBijector()), flip, b))
    elif binv.monotonically_increasing:
        ob = Chain((inverse(OrderedBijector()), b))
    else:
        raise ValueError(f"ordered transform not supported for {type(d).__name__}")
    return OrderedDistribution(d, ob)


@register_bijector(OrderedDistribution)
def _bijector_ordered(d: OrderedDistribution):
    return d.transform
