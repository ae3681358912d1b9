"""Invertible batch normalization for flows.

TPU-native counterpart of /root/reference/src/bijectors/normalise.jl. The
reference mutates running moments in-place (normalise.jl:55-60); JAX is
functional, so the layer is an immutable pytree and `forward_and_log_det_train`
returns `(y, logdet, updated_layer)` — the caller threads the state
(exactly how flax/optax handle batch statistics).

Semantics (normalise.jl:41-88), with channels on the LAST axis (JAX
convention; the reference uses dims-1 because Julia is column-major — same
layout, both put channels fastest-varying with batch outermost):

  eval:   y = exp(logs) * (x - m) / sqrt(v + eps) + b
  train:  m, v from the batch; running stats updated with momentum `mtm`,
          variance update uses the n/(n-1) bias correction (normalise.jl:60)
  logdetJ = sum(logs - log(v + eps)/2)   (same for every batch row)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bijectors.base import Bijector
from ..tree import pytree_dataclass, replace


@pytree_dataclass(meta_fields=("eps", "mtm"))
class InvertibleBatchNorm(Bijector):
    b: jax.Array  # bias (channels,)
    logs: jax.Array  # log-scale (channels,)
    m: jax.Array  # running mean
    v: jax.Array  # running variance
    eps: float = 1e-5
    mtm: float = 0.1

    event_ndims_in = 1
    event_ndims_out = 1

    @classmethod
    def init(cls, channels: int, eps: float = 1e-5, mtm: float = 0.1, dtype=jnp.float32):
        z = jnp.zeros((channels,), dtype)
        return cls(z, z, z, jnp.ones((channels,), dtype), eps, mtm)

    # -- eval mode (the Bijector interface) ---------------------------------

    def forward_and_log_det(self, x):
        s = jnp.exp(self.logs)
        y = s * (x - self.m) / jnp.sqrt(self.v + self.eps) + self.b
        ld = jnp.sum(self.logs - 0.5 * jnp.log(self.v + self.eps))
        return y, jnp.broadcast_to(ld, x.shape[:-1])

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse_and_log_det(self, y):
        x = self.inverse(y)
        ld = jnp.sum(self.logs - 0.5 * jnp.log(self.v + self.eps))
        return x, jnp.broadcast_to(-ld, y.shape[:-1])

    def inverse(self, y):
        s = jnp.exp(self.logs)
        return (y - self.b) / s * jnp.sqrt(self.v + self.eps) + self.m

    # -- train mode (functional state update) --------------------------------

    def forward_and_log_det_train(self, x):
        """Batch-stat forward; returns (y, logdet, updated_layer).

        x: (batch..., channels); statistics over all non-channel axes.
        """
        axes = tuple(range(x.ndim - 1))
        n = 1
        for a in axes:
            n *= x.shape[a]
        m = jnp.mean(x, axis=axes)
        v = jnp.mean((x - m) ** 2, axis=axes)
        y = jnp.exp(self.logs) * (x - m) / jnp.sqrt(v + self.eps) + self.b
        ld = jnp.sum(self.logs - 0.5 * jnp.log(v + self.eps))
        mtm = self.mtm
        new_m = (1 - mtm) * self.m + mtm * m
        new_v = (1 - mtm) * self.v + (mtm * n / max(n - 1, 1)) * v
        updated = replace(self, m=new_m, v=new_v)
        return y, jnp.broadcast_to(ld, x.shape[:-1]), updated
