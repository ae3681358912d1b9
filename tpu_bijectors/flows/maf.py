"""Masked autoregressive flow layer (MAF/IAF; Papamakarios et al. 2017,
Kingma et al. 2016) on a MADE-masked conditioner (Germain et al. 2015).

Net-new vs the reference's flow set (planar/radial/coupling/RQS) — the
autoregressive family completes the standard library. One layer computes

    y_i = x_i · exp(s_i(x_<i)) + m_i(x_<i)

where (m, s) come from ONE pass of a weight-masked MLP (the masks enforce
strict autoregression), so:

- `forward` (sampling direction — what ADVI's FlowPosterior uses) is a
  single fused matmul pass: MXU-friendly, batched over leading axes;
- `inverse` (density direction for data fitting) is D fixed-point passes
  of the same network inside `lax.fori_loop` — pass i settles coordinate i
  exactly, so D iterations invert exactly (static trip count, jittable).
  Fit data with `Invert(layer)` / `Invert(maf_stack(...))` so the fast
  pass faces the data.

The log-scale is soft-clamped (s = cap·tanh(ŝ/cap)) — the standard
stabilizer against runaway scales early in training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..bijectors.base import Bijector, Chain
from ..tree import pytree_dataclass


def _made_masks(dim: int, hidden: int):
    """MADE degree masks for one hidden layer: hidden unit of degree k sees
    inputs with degree ≤ k; output of degree i sees hidden with degree < i
    ⇒ output i depends only on inputs < i (strict)."""
    deg_in = np.arange(1, dim + 1)
    # cycle hidden degrees through 1..dim-1 (dim 1: no dependencies at all)
    deg_hidden = (np.arange(hidden) % max(dim - 1, 1)) + 1
    m1 = (deg_hidden[:, None] >= deg_in[None, :]).astype(np.float32)
    m2 = (deg_in[:, None] > deg_hidden[None, :]).astype(np.float32)
    return m1, m2  # (hidden, dim), (dim, hidden)


@pytree_dataclass(meta_fields=("mask1", "mask2", "scale_cap"))
class MaskedAutoregressive(Bijector):
    """One MAF/IAF layer. Trainable leaves: the masked-MLP weights."""

    w1: jax.Array  # (hidden, dim)
    b1: jax.Array  # (hidden,)
    wm: jax.Array  # (dim, hidden) -> shift head
    bm: jax.Array  # (dim,)
    ws: jax.Array  # (dim, hidden) -> log-scale head
    bs: jax.Array  # (dim,)
    mask1: tuple = ()
    mask2: tuple = ()
    scale_cap: float = 3.0

    event_ndims_in = 1
    event_ndims_out = 1

    @classmethod
    def init(cls, key, dim: int, hidden: int | None = None, dtype=jnp.float32):
        hidden = hidden or max(2 * dim, 8)
        m1, m2 = _made_masks(dim, hidden)
        k1, k2, k3 = jax.random.split(key, 3)
        # small init => starts near the identity map (s=0, m=0)
        w1 = 0.1 * jax.random.normal(k1, (hidden, dim), dtype)
        wm = 0.01 * jax.random.normal(k2, (dim, hidden), dtype)
        ws = 0.01 * jax.random.normal(k3, (dim, hidden), dtype)
        return cls(
            w1, jnp.zeros(hidden, dtype), wm, jnp.zeros(dim, dtype),
            ws, jnp.zeros(dim, dtype),
            mask1=tuple(map(tuple, m1)), mask2=tuple(map(tuple, m2)),
        )

    def _nets(self, x):
        m1 = jnp.asarray(self.mask1, x.dtype)
        m2 = jnp.asarray(self.mask2, x.dtype)
        h = jnp.tanh(x @ (self.w1 * m1).T + self.b1)
        m = h @ (self.wm * m2).T + self.bm
        s_raw = h @ (self.ws * m2).T + self.bs
        cap = self.scale_cap
        return m, cap * jnp.tanh(s_raw / cap)

    def forward_and_log_det(self, x):
        m, s = self._nets(x)
        return x * jnp.exp(s) + m, jnp.sum(s, -1)

    def inverse_and_log_det(self, y):
        dim = y.shape[-1]

        def body(_, x):
            m, s = self._nets(x)
            return (y - m) * jnp.exp(-s)

        x = jax.lax.fori_loop(0, dim, body, jnp.zeros_like(y))
        _, s = self._nets(x)
        return x, -jnp.sum(s, -1)

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]


def flow_stack(key, dim: int, kind: str = "maf", **kwargs) -> Chain:
    """Uniform constructor over the autoregressive stacks: kind='maf'
    (affine; cheapest) or 'nsf' (spline; fits multimodal marginals).
    kwargs forwarded to maf_stack / nsf_ar_stack."""
    if kind == "maf":
        return maf_stack(key, dim, **kwargs)
    if kind == "nsf":
        from .nsf import nsf_ar_stack

        return nsf_ar_stack(key, dim, **kwargs)
    raise ValueError(f"unknown flow kind {kind!r}")


def maf_stack(key, dim: int, n_layers: int = 4, hidden: int | None = None,
              dtype=jnp.float32) -> Chain:
    """Stack of MaskedAutoregressive layers with coordinate-reversing
    Permutes in between (so every coordinate gets conditioned on every
    other across the stack). Forward = fast sampling direction; wrap in
    `Invert` for maximum-likelihood data fitting."""
    from ..bijectors.reshape import Permute

    rev = Permute(perm=tuple(range(dim - 1, -1, -1)))
    layers = []
    for i, k in enumerate(jax.random.split(key, n_layers)):
        if i:
            layers.append(rev)
        layers.append(MaskedAutoregressive.init(k, dim, hidden, dtype))
    return Chain(tuple(layers))
