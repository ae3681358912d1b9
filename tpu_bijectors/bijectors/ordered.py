"""Ordered-vector bijector.

TPU-native counterpart of /root/reference/src/bijectors/ordered.jl.

Note the direction (ordered.jl:10-17): **forward maps unconstrained R^d to
ordered vectors**:  x_0 = y_0, x_i = x_{i-1} + exp(y_i)  — a plain cumulative
sum, so both directions are closed-form parallel on the VPU:

  forward:  x = cumsum([y_0, exp(y_1), ..., exp(y_{d-1})])
  logdetJ:  sum(y[1:])                       (ordered.jl:79-80)
  inverse:  y_0 = x_0, y_i = log(x_i - x_{i-1})  (diff + log)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tree import pytree_dataclass
from .base import Bijector


@pytree_dataclass
class OrderedBijector(Bijector):
    """Unconstrained -> ordered (reference OrderedBijector)."""

    event_ndims_in = 1
    event_ndims_out = 1
    monotonically_increasing = False  # not elementwise monotone as a map

    def forward_and_log_det(self, y):
        return self.forward(y), jnp.sum(y[..., 1:], axis=-1)

    def forward(self, y):
        steps = jnp.concatenate([y[..., :1], jnp.exp(y[..., 1:])], axis=-1)
        return jnp.cumsum(steps, axis=-1)

    def inverse_and_log_det(self, x):
        y = self.inverse(x)
        return y, -jnp.sum(y[..., 1:], axis=-1)

    def inverse(self, x):
        d = jnp.log(x[..., 1:] - x[..., :-1])
        return jnp.concatenate([x[..., :1], d], axis=-1)
