"""Planar normalizing-flow layer + the `find_alpha` implicit root solve.

TPU-native counterpart of /root/reference/src/bijectors/planar_layer.jl
(Rezende & Mohamed 2015, eq. 10-12, 21-23):

  forward:  f(z) = z + u_hat * tanh(w'z + b)
            u_hat = u + (log1pexp(-w'u) - 1) * w / |w|^2   (invertibility)
            w'u_hat = log1pexp(w'u) - 1 > -1
  logdetJ:  log1p(w'u_hat * sech^2(w'z + b))               (planar_layer.jl:102-110)
  inverse:  solve w'y = alpha + w'u_hat * tanh(alpha + b) for alpha, then
            z = y - u_hat * tanh(alpha + b)                 (planar_layer.jl:112-127)

`find_alpha` is the reference's Roots.A42 bracketed solve
(planar_layer.jl:136-185) reimplemented as a fixed-count branch-free
bisection inside the bracket [wt_y - 2|wt_u_hat|, wt_y + 2|wt_u_hat|]
(including the empty-bracket early exit, planar_layer.jl:170-173), fully
vectorized under vmap/batching. AD does NOT differentiate the iteration:
a custom JVP implements the implicit-function rule with the partials from
ext/BijectorsChainRulesCoreExt.jl:42-46.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass
from ..utils import log1pexp
from ..bijectors.base import Bijector

_N_BISECT = 96  # enough to reach f64 ulp on any realistic bracket


@jax.custom_jvp
def find_alpha(wt_y, wt_u_hat, b):
    """Solve alpha + wt_u_hat*tanh(alpha + b) - wt_y = 0 (elementwise).

    Monotone in alpha since wt_u_hat > -1, so bisection on the bracket is
    globally convergent; fixed iteration count keeps it branch-free on TPU.
    Handles the empty bracket (wt_u_hat == 0 -> lower == upper, reference
    issue #204) and the b = -1e8 cancellation regression
    (test/normalising_flows.jl:47-71).
    """
    wt_y, wt_u_hat, b = jnp.broadcast_arrays(
        *map(jnp.asarray, (wt_y, wt_u_hat, b))
    )
    dtype = jnp.result_type(wt_y, wt_u_hat, b, float)
    wt_y, wt_u_hat, b = (a.astype(dtype) for a in (wt_y, wt_u_hat, b))
    delta = 2.0 * jnp.abs(wt_u_hat)
    lower = wt_y - delta
    upper = wt_y + delta

    def f(a):
        return a + wt_u_hat * jnp.tanh(a + b) - wt_y

    def body(_, lu):
        lo, hi = lu
        mid = 0.5 * (lo + hi)
        fm = f(mid)
        lo = jnp.where(fm <= 0, mid, lo)
        hi = jnp.where(fm > 0, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _N_BISECT, body, (lower, upper))
    alpha = 0.5 * (lo + hi)
    # Empty bracket -> return the endpoint (reference planar_layer.jl:170-173).
    return jnp.where(lower == upper, lower, alpha)


@find_alpha.defjvp
def _find_alpha_jvp(primals, tangents):
    """Implicit-function rule (ext/BijectorsChainRulesCoreExt.jl:42-46):
    with x = 1 / (1 + wt_u_hat * sech^2(alpha + b)):
      d alpha/d wt_y = x,  d alpha/d wt_u_hat = -tanh(alpha+b) * x,
      d alpha/d b = x - 1.
    """
    wt_y, wt_u_hat, b = primals
    dy, du, db = tangents
    alpha = find_alpha(wt_y, wt_u_hat, b)
    t = jnp.tanh(alpha + jnp.asarray(b))
    sech2 = 1.0 - t * t
    x = 1.0 / (1.0 + jnp.asarray(wt_u_hat) * sech2)
    tangent = x * dy + (-t * x) * du + (x - 1.0) * db
    return alpha, tangent


@pytree_dataclass
class PlanarLayer(Bijector):
    """Trainable planar flow layer (reference PlanarLayer). Params are pytree
    leaves, so `jax.grad` reaches them (reference uses Functors.@functor)."""

    w: jax.Array
    u: jax.Array
    b: jax.Array  # scalar (stored as shape () or (1,))

    event_ndims_in = 1
    event_ndims_out = 1
    closed_form_inverse = False  # reference `isclosedform`, planar_layer.jl:188

    @classmethod
    def init(cls, key, dim: int, dtype=jnp.float32):
        kw, ku, kb = jax.random.split(key, 3)
        return cls(
            jax.random.normal(kw, (dim,), dtype),
            jax.random.normal(ku, (dim,), dtype),
            jax.random.normal(kb, (), dtype),
        )

    def _u_hat(self):
        w, u = self.w, self.u
        wT_u = jnp.sum(w * u, -1)
        u_hat = u + ((log1pexp(-wT_u) - 1.0) / jnp.sum(w * w, -1)) * w
        wT_u_hat = log1pexp(wT_u) - 1.0
        return u_hat, wT_u_hat

    def forward_and_log_det(self, z):
        b = jnp.reshape(self.b, ())
        u_hat, wT_u_hat = self._u_hat()
        wT_z = jnp.sum(self.w * z, -1)
        t = jnp.tanh(wT_z + b)
        y = z + u_hat * t[..., None]
        sech2 = 1.0 - t * t
        ld = jnp.log1p(wT_u_hat * sech2)
        return y, ld

    def forward(self, z):
        return self.forward_and_log_det(z)[0]

    def inverse(self, y):
        b = jnp.reshape(self.b, ())
        u_hat, wT_u_hat = self._u_hat()
        wT_y = jnp.sum(self.w * y, -1)
        alpha = find_alpha(wT_y, wT_u_hat, b)
        return y - u_hat * jnp.tanh(alpha + b)[..., None]

    def inverse_and_log_det(self, y):
        x = self.inverse(y)
        return x, -self.forward_and_log_det(x)[1]
