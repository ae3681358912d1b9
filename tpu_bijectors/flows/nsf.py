"""Autoregressive neural spline flow (NSF-AR; Durkan et al. 2019).

Net-new vs the reference's flow set — combines its two most expressive
pieces: the MADE-masked one-pass conditioner (flows/maf.py, Germain et
al. 2015) emitting per-coordinate rational-quadratic-spline parameters
(flows/rqs.py, reference rational_quadratic_spline.jl formulas). Affine
MAF layers can only shift/scale; the spline transform is piecewise
monotone with K bins, so a single layer already fits multimodal
marginals.

- `forward` is one masked-matmul pass producing ALL spline tables, then
  the vectorized bin-search spline (fused VPU ops) — MXU + VPU friendly,
  batched over leading axes;
- `inverse` is D fixed-point passes (pass i settles coordinate i exactly
  — same argument as MAF's inverse), each using the closed-form RQS
  quadratic inverse;
- identity at init: derivative raws are biased by softplus^{-1}(1) so
  zero head weights give unit-slope uniform-knot splines (exactly the
  identity map inside [-B, B]).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..bijectors.base import Bijector, Chain
from ..tree import pytree_dataclass
from .maf import _made_masks
from .rqs import RationalQuadraticSpline

_SOFTPLUS_INV_1 = math.log(math.e - 1.0)  # log1pexp(x) = 1  =>  x = log(e-1)


@pytree_dataclass(meta_fields=("mask1", "mask2", "n_bins", "B"))
class MaskedAutoregressiveSpline(Bijector):
    """One NSF-AR layer: y_i = RQS(theta_i(x_<i))(x_i), identity outside
    [-B, B]. Trainable leaves: the masked-MLP weights."""

    w1: jax.Array  # (hidden, dim)
    b1: jax.Array  # (hidden,)
    w2: jax.Array  # (dim * (3K-1), hidden), rows masked per output dim
    b2: jax.Array  # (dim * (3K-1),)
    mask1: tuple = ()
    mask2: tuple = ()  # (dim, hidden) — repeated across each dim's 3K-1 rows
    n_bins: int = 8
    B: float = 4.0

    event_ndims_in = 1
    event_ndims_out = 1

    @classmethod
    def init(cls, key, dim: int, n_bins: int = 8, hidden: int | None = None,
             B: float = 4.0, dtype=jnp.float32):
        hidden = hidden or max(2 * dim, 16)
        m1, m2 = _made_masks(dim, hidden)
        k1, k2 = jax.random.split(key)
        p = 3 * n_bins - 1
        w1 = 0.1 * jax.random.normal(k1, (hidden, dim), dtype)
        # small head => spline tables ~ the identity-init bias
        w2 = 0.01 * jax.random.normal(k2, (dim * p, hidden), dtype)
        return cls(
            w1, jnp.zeros(hidden, dtype), w2, jnp.zeros(dim * p, dtype),
            mask1=tuple(map(tuple, m1)), mask2=tuple(map(tuple, m2)),
            n_bins=n_bins, B=B,
        )

    def _spline(self, x):
        """One conditioner pass -> per-coordinate spline tables (an
        elementwise RationalQuadraticSpline with (..., dim, K)-row params,
        strictly autoregressive by the MADE masks)."""
        K = self.n_bins
        dim = len(self.mask2)
        m1 = jnp.asarray(self.mask1, x.dtype)
        m2 = jnp.asarray(self.mask2, x.dtype)  # (dim, hidden)
        h = jnp.tanh(x @ (self.w1 * m1).T + self.b1)
        m2_rep = jnp.repeat(m2, 3 * K - 1, axis=0)  # (dim*(3K-1), hidden)
        raw = h @ (self.w2 * m2_rep).T + self.b2
        raw = raw.reshape(x.shape[:-1] + (dim, 3 * K - 1))
        return RationalQuadraticSpline(
            widths=raw[..., :K],
            heights=raw[..., K : 2 * K],
            derivatives=raw[..., 2 * K :] + _SOFTPLUS_INV_1,
            B=self.B,
        )

    def forward_and_log_det(self, x):
        spl = self._spline(x)
        y, ld = spl.forward_and_log_det(x)
        return y, jnp.sum(ld, -1)

    def inverse_and_log_det(self, y):
        dim = len(self.mask2)

        def body(_, x):
            return self._spline(x).inverse(y)

        x = jax.lax.fori_loop(0, dim, body, jnp.zeros_like(y))
        _, ld = self._spline(x).forward_and_log_det(x)
        return x, -jnp.sum(ld, -1)

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]


def nsf_ar_stack(key, dim: int, n_layers: int = 3, n_bins: int = 8,
                 hidden: int | None = None, B: float = 4.0,
                 dtype=jnp.float32) -> Chain:
    """Stack of NSF-AR layers with coordinate-reversing Permutes (as
    maf_stack). Forward = fast direction; wrap in `Invert` for maximum-
    likelihood data fitting."""
    from ..bijectors.reshape import Permute

    rev = Permute(perm=tuple(range(dim - 1, -1, -1)))
    layers = []
    for i, k in enumerate(jax.random.split(key, n_layers)):
        if i:
            layers.append(rev)
        layers.append(
            MaskedAutoregressiveSpline.init(k, dim, n_bins, hidden, B, dtype)
        )
    return Chain(tuple(layers))
