"""Distribution -> bijector registry and the classic link API.

TPU-native counterpart of /root/reference/src/Bijectors.jl:128-356 and the
`bijector(d)` dispatch table at src/transformed_distribution.jl:40-149.

`bijector(d)` returns the constrained -> unconstrained bijector for a
distribution. Resolution order (all at trace time, zero runtime cost):

  1. exact-type entries registered via `register_bijector`;
  2. structural `support` metadata: simplex -> SimplexBijector,
     pd -> PDVecBijector (matrix API uses PDBijector),
     corr -> VecCorrBijector, chol_corr -> VecCholeskyBijector,
     interval -> Truncated(lb, ub) family (identity / Log / Logit / flipped
     log branch chosen statically, mirroring truncated.jl:20-31 and the
     registry rows at src/transformed_distribution.jl:75-142);
  3. discrete -> Identity (src/transformed_distribution.jl:75-76).

`logpdf_with_trans(d, x, transform)` reproduces src/Bijectors.jl:249-262 incl.
the Dirichlet epsilon-nudge (src/Bijectors.jl:253) and the PD-matrix path.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .bijectors.base import Bijector, Block, Chain, Identity, elementwise, inverse
from .bijectors.corr import VecCholeskyBijector, VecCorrBijector
from .bijectors.pd import PDVecBijector
from .bijectors.scalar import Truncated
from .bijectors.simplex import SimplexBijector
from .dists.base import Distribution
from .utils import _eps

_REGISTRY: dict[type, callable] = {}


def register_bijector(dist_type: type):
    """Register `fn(d) -> Bijector` for a distribution type."""

    def deco(fn):
        _REGISTRY[dist_type] = fn
        return fn

    return deco


def bijector(d: Distribution) -> Bijector:
    """The constrained -> unconstrained bijector for `d`
    (reference `bijector`, src/transformed_distribution.jl:40-149)."""
    for t in type(d).__mro__:
        if t in _REGISTRY:
            return _REGISTRY[t](d)
    s = d.support
    n = d.event_ndims
    if s.kind == "discrete":
        return elementwise(Identity(), n)
    if s.kind == "simplex":
        return SimplexBijector()
    if s.kind == "pd":
        return PDVecBijector()
    if s.kind == "corr":
        return VecCorrBijector()
    if s.kind == "chol_corr":
        # default "L" agrees with LKJCholesky's own default and with the
        # vectorize layer's triangle packing/optics fallback (core.py)
        return VecCholeskyBijector(getattr(d, "mode", "L"))
    if s.kind in ("interval",):
        if not s.lower_finite and not s.upper_finite:
            return elementwise(Identity(), n)
        b = Truncated(
            s.lower if s.lower_finite else -math.inf,
            s.upper if s.upper_finite else math.inf,
            lower_finite=s.lower_finite,
            upper_finite=s.upper_finite,
        )
        return elementwise(b, n)
    if s.kind in ("real_vector", "real_matrix"):
        return elementwise(Identity(), n)
    if s.kind == "reshaped":
        # inverse(Reshape) ∘ b ∘ Reshape (src/transformed_distribution.jl:144-149)
        from .bijectors.reshape import Reshape

        inner_b = bijector(d.base)
        inner_shape = tuple(int(v) for v in d.base.event_shape)
        return Chain((inner_b, Reshape(tuple(d.shape), inner_shape)))
    if s.kind == "joint_order":
        # JointOrderWrap (src/vector/order/order.jl:14-76): elementwise link,
        # sign-flip sandwich for decreasing links, then unordered via the
        # ordered bijector's inverse.
        from .bijectors.ordered import OrderedBijector
        from .bijectors.scalar import SignFlip

        b_scalar = bijector(d.base)
        eb = Block(b_scalar, 1)
        flip = Block(SignFlip(), 1)
        if b_scalar.monotonically_decreasing:
            return Chain((flip, inverse(OrderedBijector()), flip, eb))
        if not b_scalar.monotonically_increasing:
            # a non-monotone (or unflagged) link does not preserve order:
            # the ordered inverse would take logs of negative differences
            # and return NaNs silently (same guard as transformed.ordered)
            raise ValueError(
                "joint order statistics need a monotone scalar link; "
                f"bijector({type(d.base).__name__}) declares neither "
                "monotonically_increasing nor monotonically_decreasing"
            )
        return Chain((inverse(OrderedBijector()), eb))
    if s.kind == "product":
        # dict/tuple sample -> flat unconstrained vector (the reference's
        # NamedStacked, src/bijectors/named_stacked.jl) via the vectorize layer
        from .vectorize.core import UnconstrainerBijector, unconstrain

        return UnconstrainerBijector(unconstrain(d))
    raise NotImplementedError(f"no bijector known for {type(d).__name__} ({s.kind})")


def link(d: Distribution, x):
    """Constrained -> unconstrained (reference `link`, src/Bijectors.jl:156)."""
    return bijector(d).forward(x)


def invlink(d: Distribution, y):
    """Unconstrained -> constrained (reference `invlink`, src/Bijectors.jl:183)."""
    return bijector(d).inverse(y)


def logpdf_with_trans(d: Distribution, x, transform: bool = False):
    """logpdf, optionally adjusted for the unconstraining transform:

        logpdf(d, x) - logabsdetjac(bijector(d), x)

    (reference src/Bijectors.jl:249-262). Mirrors the Dirichlet epsilon-nudge
    at src/Bijectors.jl:253: the density is evaluated at x + eps to keep
    boundary values finite (load-bearing for the 1e10-jump robustness test,
    test/legacy_interface.jl:160-172).
    """
    lp = _logpdf_eps_safe(d, x)
    if not transform:
        return lp
    b = bijector(d)
    ld = b.forward_and_log_det(x)[1]
    # scalar-event bijectors produce elementwise log-dets; sum event dims
    extra = d.event_ndims - _bij_event_ndims_in(b)
    if extra > 0:
        ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
    return lp - ld


def _bij_event_ndims_in(b: Bijector) -> int:
    try:
        return int(b.event_ndims_in)
    except TypeError:
        return 0


def _logpdf_eps_safe(d: Distribution, x):
    """Dirichlet-style eps nudge for simplex-supported dists
    (src/Bijectors.jl:253: `logpdf(d, x .+ ϵ)`)."""
    if d.support.kind == "simplex":
        eps = _eps(jnp.result_type(x, float))
        return d.logpdf(x + eps)
    return d.logpdf(x)
