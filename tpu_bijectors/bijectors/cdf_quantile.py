"""CDF / Quantile bijectors.

Counterparts of /root/reference/src/bijectors/cdf_quantile.jl:
  CDFBijector(d):      support(d) -> (0, 1) via x -> cdf(d, x);
                       logdetJ = logpdf(d, x) elementwise
  QuantileBijector(d): (0, 1) -> support(d) via q -> quantile(d, q);
                       logdetJ = -logpdf(d, y) at y = quantile(d, q)
They are each other's inverse (cdf_quantile.jl:92-93).
"""

from __future__ import annotations

from ..tree import pytree_dataclass
from .base import Bijector


def has_cdf(d) -> bool:
    """True when `d` implements cdf (rather than inheriting the abstract
    raise from Distribution). The generic `quantile` (bracketed bisection on
    cdf, dists/base.py) then works too."""
    from ..dists.base import Distribution

    for klass in type(d).__mro__:
        if "cdf" in vars(klass):
            return klass is not Distribution
    return False


def _check_usable(d, bij_name):
    from ..dists.base import Distribution

    if isinstance(d, Distribution):
        ev = getattr(d, "event_ndims", 0)
        if not (isinstance(ev, int) and ev == 0):
            raise TypeError(
                "%s requires a scalar-event distribution; %s has event_ndims=%s"
                % (bij_name, type(d).__name__, ev)
            )
        try:
            kind = d.support.kind
        except Exception:
            # parameter-dependent supports can't be inspected under tracing
            # (pytree unflatten re-runs __post_init__ inside jit) — the
            # construction-time check already ran on the concrete original
            kind = None
        if kind == "discrete":
            raise TypeError(
                "%s(%s): discrete distributions have step CDFs, which are "
                "not invertible" % (bij_name, type(d).__name__)
            )
        if not has_cdf(d):
            raise TypeError(
                "%s(%s): this family has no cdf implementation. Families "
                "without closed-form CDFs (VonMises, Rician, SkewNormal, "
                "SkewedExponentialPower, Noncentral*, NormalInverseGaussian, "
                "StudentizedRange) are listed in docs/bijectors.md; all "
                "other continuous scalar families support it."
                % (bij_name, type(d).__name__)
            )


@pytree_dataclass
class CDFBijector(Bijector):
    dist: object  # a scalar-event Distribution with cdf/quantile/logpdf

    monotonically_increasing = True

    def __post_init__(self):
        _check_usable(self.dist, "CDFBijector")

    def forward_and_log_det(self, x):
        return self.dist.cdf(x), self.dist.logpdf(x)

    def forward(self, x):
        return self.dist.cdf(x)

    def inverse(self, y):
        return self.dist.quantile(y)

    def inverse_and_log_det(self, y):
        x = self.dist.quantile(y)
        return x, -self.dist.logpdf(x)

    def _self_inverse(self):
        return QuantileBijector(self.dist)


@pytree_dataclass
class QuantileBijector(Bijector):
    dist: object

    monotonically_increasing = True

    def __post_init__(self):
        _check_usable(self.dist, "QuantileBijector")

    def forward_and_log_det(self, q):
        y = self.dist.quantile(q)
        return y, -self.dist.logpdf(y)

    def forward(self, q):
        return self.dist.quantile(q)

    def inverse(self, y):
        return self.dist.cdf(y)

    def inverse_and_log_det(self, y):
        return self.dist.cdf(y), self.dist.logpdf(y)

    def _self_inverse(self):
        return CDFBijector(self.dist)
