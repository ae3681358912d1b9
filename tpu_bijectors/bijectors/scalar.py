"""Scalar (elementwise) bijectors.

TPU-native counterparts of the reference's elementwise transforms:
exp/log (src/bijectors/exp_log.jl), Logit (src/bijectors/logit.jl),
Shift (src/bijectors/shift.jl), Scale (src/bijectors/scale.jl),
TruncatedBijector (src/bijectors/truncated.jl), SignFlip
(src/bijectors/ordered.jl:1-7), LeakyReLU (src/bijectors/leaky_relu.jl).

All have ``event_ndims_in == event_ndims_out == 0``: they act elementwise and
return *elementwise* log-dets (wrap in :class:`~.base.Block` to sum event
dims). Branches on bound-finiteness are resolved **at trace time** from static
metadata, so the compiled TPU program is branch-free.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass
from ..utils import clamp, log1pexp, logistic, logit, softplus_inv
from .base import Bijector, pytree_dataclass as _unused  # noqa: F401


@pytree_dataclass
class Exp(Bijector):
    """y = exp(x); log|J| = x (reference src/bijectors/exp_log.jl:1-6)."""

    monotonically_increasing = True

    def forward_and_log_det(self, x):
        return jnp.exp(x), x

    def inverse_and_log_det(self, y):
        x = jnp.log(y)
        return x, -x

    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def _self_inverse(self):
        return Log()


@pytree_dataclass
class Log(Bijector):
    """y = log(x); log|J| = -log(x) = -y (reference src/bijectors/exp_log.jl:7-12)."""

    monotonically_increasing = True

    def forward_and_log_det(self, x):
        y = jnp.log(x)
        return y, -y

    def inverse_and_log_det(self, y):
        return jnp.exp(y), y

    def forward(self, x):
        return jnp.log(x)

    def inverse(self, y):
        return jnp.exp(y)

    def _self_inverse(self):
        return Exp()


@pytree_dataclass
class Logit(Bijector):
    """y = logit((x-a)/(b-a)) (reference src/bijectors/logit.jl:15-30).

    log|J| = -log((x-a)(b-x)/(b-a)) elementwise.
    """

    a: jax.Array | float = 0.0
    b: jax.Array | float = 1.0

    monotonically_increasing = True

    def forward_and_log_det(self, x):
        a, b = self.a, self.b
        y = logit((x - a) / (b - a))
        ld = -(jnp.log(x - a) + jnp.log(b - x) - jnp.log(jnp.asarray(b - a)))
        return y, ld

    def inverse_and_log_det(self, y):
        a, b = self.a, self.b
        x = (b - a) * logistic(y) + a
        # Stable: log|dx/dy| = log(b-a) - |y| - 2*log1pexp(-|y|)
        ay = jnp.abs(y)
        ld = jnp.log(jnp.asarray(b - a)) - ay - 2.0 * log1pexp(-ay)
        return x, ld

    def forward(self, x):
        return logit((x - self.a) / (self.b - self.a))

    def inverse(self, y):
        return (self.b - self.a) * logistic(y) + self.a


@pytree_dataclass
class Shift(Bijector):
    """y = x + a; log|J| = 0 (reference src/bijectors/shift.jl)."""

    a: jax.Array | float

    monotonically_increasing = True

    def forward_and_log_det(self, x):
        y = x + self.a
        return y, jnp.zeros_like(y, dtype=jnp.result_type(y, float))

    def inverse_and_log_det(self, y):
        x = y - self.a
        return x, jnp.zeros_like(x, dtype=jnp.result_type(x, float))

    def forward(self, x):
        return x + self.a

    def inverse(self, y):
        return y - self.a


@pytree_dataclass
class Scale(Bijector):
    """y = a * x elementwise; log|J| = log|a| (reference src/bijectors/scale.jl:13-36).

    Unlike the reference's matrix-`a` variant (a general linear map) this is the
    elementwise scale; for a full linear map see :class:`LinearMap` in
    linear.py. Monotonicity depends on the runtime sign of `a`, so the traits
    are only set when the sign is statically known (python scalar).
    """

    a: jax.Array | float

    def __post_init__(self):
        if isinstance(self.a, (int, float)):
            object.__setattr__(self, "_inc", self.a > 0)
        else:
            object.__setattr__(self, "_inc", None)

    @property
    def monotonically_increasing(self):  # type: ignore[override]
        return self._inc is True

    @property
    def monotonically_decreasing(self):  # type: ignore[override]
        return self._inc is False

    def forward_and_log_det(self, x):
        y = x * self.a
        ld = jnp.broadcast_to(jnp.log(jnp.abs(jnp.asarray(self.a, y.dtype))), y.shape)
        return y, ld

    def inverse_and_log_det(self, y):
        x = y / self.a
        ld = jnp.broadcast_to(-jnp.log(jnp.abs(jnp.asarray(self.a, x.dtype))), x.shape)
        return x, ld

    def forward(self, x):
        return x * self.a

    def inverse(self, y):
        return y / self.a


@pytree_dataclass
class SignFlip(Bijector):
    """x -> -x, log|J| = 0 (reference src/bijectors/ordered.jl:1-7)."""

    monotonically_decreasing = True

    def forward_and_log_det(self, x):
        return -x, jnp.zeros_like(x, dtype=jnp.result_type(x, float))

    def inverse_and_log_det(self, y):
        return -y, jnp.zeros_like(y, dtype=jnp.result_type(y, float))

    def forward(self, x):
        return -x

    def inverse(self, y):
        return -y

    def _self_inverse(self):
        return self


@pytree_dataclass
class LeakyReLU(Bijector):
    """y = x if x >= 0 else alpha*x (reference src/bijectors/leaky_relu.jl)."""

    alpha: jax.Array | float = 0.01

    monotonically_increasing = True

    def forward_and_log_det(self, x):
        mask = x < 0
        j = jnp.where(mask, jnp.asarray(self.alpha, x.dtype), jnp.ones_like(x))
        return x * j, jnp.log(jnp.abs(j))

    def inverse_and_log_det(self, y):
        mask = y < 0
        j = jnp.where(mask, 1.0 / jnp.asarray(self.alpha, y.dtype), jnp.ones_like(y))
        return y * j, jnp.log(jnp.abs(j))

    def forward(self, x):
        return jnp.where(x < 0, x * self.alpha, x)

    def inverse(self, y):
        return jnp.where(y < 0, y / self.alpha, y)


@pytree_dataclass
class Softplus(Bijector):
    """y = log(1+exp(x)) mapping R -> R+ ; log|J| = -log1pexp(-x).

    Not in the reference's bijector set but standard for positive-parameter
    flows; used internally by Radial/Planar reparameterizations.
    """

    monotonically_increasing = True

    def forward_and_log_det(self, x):
        # dy/dx = sigmoid(x) so log|J| = log sigmoid(x) = -log1pexp(-x).
        return log1pexp(x), -log1pexp(-x)

    def inverse_and_log_det(self, y):
        x = softplus_inv(y)
        return x, log1pexp(-x)

    def forward(self, x):
        return log1pexp(x)

    def inverse(self, y):
        return softplus_inv(y)


@pytree_dataclass(meta_fields=("lower_finite", "upper_finite"))
class Truncated(Bijector):
    """Support-of-truncated-distribution bijector
    (reference TruncatedBijector, src/bijectors/truncated.jl).

    Forward maps the interval (lb, ub) to R; the branch on bound finiteness is
    chosen at **trace time** from the static ``lower_finite``/``upper_finite``
    flags (set automatically from python-scalar bounds), matching the
    reference's runtime `isfinite` branches (truncated.jl:20-31) but with zero
    runtime cost under jit:

      both finite   -> logit((x-lb)/(ub-lb))
      lower only    -> log(x - lb)
      upper only    -> log(ub - x)            (monotone DEcreasing)
      neither       -> identity

    Inputs are clamped to the bounds first (truncated.jl:17).
    """

    lb: jax.Array | float = -math.inf
    ub: jax.Array | float = math.inf
    lower_finite: bool = None  # type: ignore[assignment]
    upper_finite: bool = None  # type: ignore[assignment]

    def __post_init__(self):
        lf, uf = self.lower_finite, self.upper_finite
        if lf is None:
            lf = _static_finite(self.lb)
            object.__setattr__(self, "lower_finite", lf)
        if uf is None:
            uf = _static_finite(self.ub)
            object.__setattr__(self, "upper_finite", uf)

    @property
    def monotonically_increasing(self):  # type: ignore[override]
        # truncated.jl:95-109
        return self.lower_finite or not self.upper_finite

    @property
    def monotonically_decreasing(self):  # type: ignore[override]
        return self.upper_finite and not self.lower_finite

    def forward_and_log_det(self, x):
        lb, ub = self.lb, self.ub
        lf, uf = self.lower_finite, self.upper_finite
        if lf and uf:
            x = clamp(x, lb, ub)
            y = logit((x - lb) / (ub - lb))
            ld = -(jnp.log(x - lb) + jnp.log(ub - x) - jnp.log(jnp.asarray(ub - lb)))
        elif lf:
            x = jnp.maximum(x, lb)
            d = x - lb
            y = jnp.log(d)
            ld = -jnp.log(d)
        elif uf:
            x = jnp.minimum(x, ub)
            d = ub - x
            y = jnp.log(d)
            ld = -jnp.log(d)
        else:
            y = x
            ld = jnp.zeros_like(x, dtype=jnp.result_type(x, float))
        return y, ld

    def inverse_and_log_det(self, y):
        lb, ub = self.lb, self.ub
        lf, uf = self.lower_finite, self.upper_finite
        if lf and uf:
            x = clamp((ub - lb) * logistic(y) + lb, lb, ub)
            # Stable inverse log-jac (truncated.jl:71-82):
            ay = jnp.abs(y)
            ld = jnp.log(jnp.asarray(ub - lb)) - ay - 2.0 * log1pexp(-ay)
        elif lf:
            x = jnp.maximum(jnp.exp(y) + lb, lb)
            ld = y + jnp.zeros_like(jnp.asarray(y, jnp.result_type(y, float)))
        elif uf:
            x = jnp.minimum(ub - jnp.exp(y), ub)
            ld = y + jnp.zeros_like(jnp.asarray(y, jnp.result_type(y, float)))
        else:
            x = y
            ld = jnp.zeros_like(y, dtype=jnp.result_type(y, float))
        return x, ld

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]


def _static_finite(v) -> bool:
    """Finiteness decided at trace time; traced arrays must pass explicit flags."""
    if isinstance(v, (int, float)):
        return math.isfinite(v)
    try:
        import numpy as np

        return bool(np.all(np.isfinite(np.asarray(v))))
    except Exception:
        raise ValueError(
            "Truncated bounds must be static (python/numpy scalars) or "
            "lower_finite/upper_finite flags must be given explicitly."
        )
