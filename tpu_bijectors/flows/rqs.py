"""Rational-quadratic spline bijector (neural spline flows).

TPU-native counterpart of /root/reference/src/bijectors/
rational_quadratic_spline.jl (Durkan et al. 2019). Monotone RQ spline on
[-B, B], identity outside; closed-form inverse via the quadratic (eq. 24-27).

The reference does a per-element `searchsortedfirst` in a scalar loop
(rqs.jl:139); here bin lookup is one vectorized `searchsorted` + gathers over
the whole batch — a handful of fused VPU ops. NOTE: the reference's first
`rqs_logabsdetjac` method (rqs.jl:238-264) references an undefined variable
and is dead code (SURVEY.md §2.4) — not replicated.

Parameterization (rqs.jl:99-123): from raw params (widths w, heights h,
derivatives d, each (..., K) / (..., K-1)):
  knots_x = cumsum([0, softmax(w)]) * 2B - B          (K+1 knots)
  knots_y = likewise
  derivs  = [1, log1pexp(d), 1]                        (K+1, unit endpoints)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..bijectors.base import Bijector
from ..tree import pytree_dataclass
from ..utils import log1pexp


def _knots(raw, B):
    p = jax.nn.softmax(raw, axis=-1)
    c = jnp.cumsum(p, axis=-1) * (2.0 * B) - B
    left = jnp.full_like(c[..., :1], -B)
    return jnp.concatenate([left, c], axis=-1)


def _derivs(raw):
    ones = jnp.ones_like(raw[..., :1])
    return jnp.concatenate([ones, log1pexp(raw), ones], axis=-1)


def _search_bins(knots, v):
    """0-based bin index of v in knots (clipped inside).

    Branch-free comparison count instead of searchsorted: knots broadcast
    against v over ANY leading layout — per-event rows (d, K+1) as well as
    per-sample conditioner-generated knots (..., K+1) from a Coupling layer.
    K is small, so the (..., K+1) comparison sweep is one fused VPU op.
    """
    K = knots.shape[-1] - 1  # number of bins
    idx = jnp.sum(v[..., None] >= knots, axis=-1) - 1
    return jnp.clip(idx, 0, K - 1)


def _gather(knots, idx):
    # knots: (..., K+1) broadcastable against idx (...,); out[...] = knots[..., idx]
    b = jnp.broadcast_to(knots, jnp.broadcast_shapes(idx.shape, knots.shape[:-1]) + knots.shape[-1:])
    return jnp.take_along_axis(b, idx[..., None], axis=-1)[..., 0]


def _rqs_pieces(kx, ky, d, idx, v):
    w_k = _gather(kx, idx)
    w = _gather(kx, idx + 1) - w_k
    h_k = _gather(ky, idx)
    dy = _gather(ky, idx + 1) - h_k
    d_k = _gather(d, idx)
    d_k1 = _gather(d, idx + 1)
    s = dy / w
    return w_k, w, h_k, dy, d_k, d_k1, s


@pytree_dataclass(meta_fields=("B",))
class RationalQuadraticSpline(Bijector):
    """Elementwise monotone RQ spline (event_ndims 0 when params are vectors
    applied to every element; event_ndims handled by Block for vectors).

    `widths`/`heights`: raw (..., K); `derivatives`: raw (..., K-1).
    If params have a leading dim matching the event length, each element gets
    its own spline (the reference's matrix-param variant, rqs.jl:173-178) —
    then wrap usage in event semantics accordingly (still event 0 here,
    broadcasting param rows against x's last axis).
    """

    widths: jax.Array
    heights: jax.Array
    derivatives: jax.Array
    B: float = 3.0

    event_ndims_in = 0
    event_ndims_out = 0
    monotonically_increasing = True

    @classmethod
    def init(cls, key, K: int, B: float = 3.0, event_dim: int | None = None, dtype=jnp.float32):
        kw, kh, kd = jax.random.split(key, 3)
        shape = (K,) if event_dim is None else (event_dim, K)
        dshape = (K - 1,) if event_dim is None else (event_dim, K - 1)
        return cls(
            jax.random.normal(kw, shape, dtype) * 0.1,
            jax.random.normal(kh, shape, dtype) * 0.1,
            jax.random.normal(kd, dshape, dtype) * 0.1,
            B,
        )

    def _tables(self):
        return _knots(self.widths, self.B), _knots(self.heights, self.B), _derivs(
            self.derivatives
        )

    def forward_and_log_det(self, x):
        kx, ky, d = self._tables()
        inside = (x > -self.B) & (x < self.B)
        xs = jnp.where(inside, x, 0.0)
        idx = _search_bins(kx, xs)
        w_k, w, h_k, dy, d_k, d_k1, s = _rqs_pieces(kx, ky, d, idx, xs)
        xi = (xs - w_k) / w
        om = 1.0 - xi
        denom = s + (d_k1 + d_k - 2.0 * s) * xi * om
        y = h_k + dy * (s * xi * xi + d_k * xi * om) / denom
        num_l = s * s * (d_k1 * xi * xi + 2.0 * s * xi * om + d_k * om * om)
        ld = jnp.log(num_l) - 2.0 * jnp.log(denom)
        y = jnp.where(inside, y, x)
        ld = jnp.where(inside, ld, jnp.zeros_like(ld))
        return y, ld

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse_and_log_det(self, y):
        x = self.inverse(y)
        return x, -self.forward_and_log_det(x)[1]

    def inverse(self, y):
        kx, ky, d = self._tables()
        inside = (y > -self.B) & (y < self.B)
        ys = jnp.where(inside, y, 0.0)
        idx = _search_bins(ky, ys)
        w_k, w, h_k, dy, d_k, d_k1, s = _rqs_pieces(kx, ky, d, idx, ys)
        ds = d_k1 + d_k - 2.0 * s
        r = ys - h_k
        a1 = dy * (s - d_k) + r * ds
        a2 = dy * d_k - r * ds
        a3 = -s * r
        xi = (-2.0 * a3) / (a2 + jnp.sqrt(a2 * a2 - 4.0 * a1 * a3))
        x = xi * w + w_k
        return jnp.where(inside, x, y)
