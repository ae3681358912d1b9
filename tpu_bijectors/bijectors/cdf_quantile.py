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


@pytree_dataclass
class CDFBijector(Bijector):
    dist: object  # a scalar-event Distribution with cdf/quantile/logpdf

    monotonically_increasing = True

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
