"""Radial normalizing-flow layer.

TPU-native counterpart of /root/reference/src/bijectors/radial_layer.jl
(Rezende & Mohamed 2015, eq. 14 + appendix A.2):

  forward:  alpha = log1pexp(alpha_raw), beta_hat = -alpha + log1pexp(beta_raw)
            r = |z - z0|,  f(z) = z + beta_hat/(alpha + r) * (z - z0)
  logdetJ:  (d-1) log(1 + beta_hat h) + log(1 + beta_hat h - beta_hat h^2 r),
            h = 1/(alpha + r)                          (radial_layer.jl:58-72)
  inverse (closed form, radial_layer.jl:74-129):
            gamma = |y - z0|, a = log1pexp(beta_raw) - gamma
            r = (sqrt(a^2 + 4 alpha gamma) - a)/2
            z = z0 + (alpha + r)/(log1pexp(beta_raw) + r) * (y - z0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bijectors.base import Bijector
from ..tree import pytree_dataclass
from ..utils import log1pexp


@pytree_dataclass
class RadialLayer(Bijector):
    alpha_raw: jax.Array  # scalar
    beta_raw: jax.Array  # scalar
    z0: jax.Array  # (d,)

    event_ndims_in = 1
    event_ndims_out = 1

    @classmethod
    def init(cls, key, dim: int, dtype=jnp.float32):
        ka, kb, kz = jax.random.split(key, 3)
        return cls(
            jax.random.normal(ka, (), dtype),
            jax.random.normal(kb, (), dtype),
            jax.random.normal(kz, (dim,), dtype),
        )

    def _params(self):
        alpha = log1pexp(jnp.reshape(self.alpha_raw, ()))
        apb = log1pexp(jnp.reshape(self.beta_raw, ()))  # alpha + beta_hat
        beta_hat = apb - alpha
        return alpha, beta_hat, apb

    def forward_and_log_det(self, z):
        alpha, beta_hat, _ = self._params()
        d = self.z0.shape[-1]
        dz = z - self.z0
        r = jnp.sqrt(jnp.sum(dz * dz, -1))
        h = 1.0 / (alpha + r)
        y = z + (beta_hat * h)[..., None] * dz
        ld = (d - 1) * jnp.log1p(beta_hat * h) + jnp.log1p(
            beta_hat * h - beta_hat * h * h * r
        )
        return y, ld

    def forward(self, z):
        return self.forward_and_log_det(z)[0]

    def inverse(self, y):
        alpha, _, apb = self._params()
        dy = y - self.z0
        gamma = jnp.sqrt(jnp.sum(dy * dy, -1))
        a = apb - gamma
        r = 0.5 * (jnp.sqrt(a * a + 4.0 * alpha * gamma) - a)
        scale = (alpha + r) / (apb + r)
        return self.z0 + scale[..., None] * dy

    def inverse_and_log_det(self, y):
        x = self.inverse(y)
        return x, -self.forward_and_log_det(x)[1]
