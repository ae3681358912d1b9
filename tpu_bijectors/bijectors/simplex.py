"""Stick-breaking simplex bijector (Stan-style).

TPU-native counterpart of /root/reference/src/bijectors/simplex.jl. Maps the
K-simplex to R^{K-1} (dimension-changing; `output_size` semantics at
simplex.jl:6-12).

Math (0-based k, eps = machine epsilon of the dtype — simplex.jl:28-64):

  forward:  s_k = sum_{i<k} x_i
            z_0 = x_0 * (1-2eps) + eps
            z_k = (x_k + eps) * (1-2eps) / ((1+eps) - s_k),   k >= 1
            y_k = logit(z_k) + log(K-1-k)

  logdetJ(forward) (simplex.jl:122-138):
            z'_0 = x_0 ;  z'_k = x_k / max(1 - s_k, eps)
            -sum_k [ log(max(z'_k,eps)) + log(max(1-z'_k,eps))
                     + (k>0) * log(max(1-s_k,eps)) ]

  inverse (simplex.jl:84-100) is a true recurrence in the running sum s_k with
  per-step clamping — implemented as a `lax.scan` over K-1 steps, fully
  vectorized over all leading batch dims (each step is one fused VPU op over
  the batch; sequential depth K only).

The forward direction and both log-dets are closed-form parallel (masked
cumulative sums) — ideal for the VPU.
"""

from __future__ import annotations

import math

from functools import partial as _partial

import jax
import jax.numpy as jnp
import numpy as np

from ..tree import pytree_dataclass
from ..utils import _eps, clamp, logistic, logit
from .base import Bijector


def _log_km1_minus_k(K: int, dtype):
    # log(K-1-k) for k = 0..K-2  (reference's log(K - k) with 1-based k).
    return jnp.asarray(np.log(np.arange(K - 1, 0, -1)), dtype=dtype)


@pytree_dataclass
class SimplexBijector(Bijector):
    """K-simplex -> R^{K-1} via stick-breaking (reference SimplexBijector)."""

    event_ndims_in = 1
    event_ndims_out = 1

    def forward_event_shape(self, shape):
        return shape[:-1] + (shape[-1] - 1,)

    def inverse_event_shape(self, shape):
        return shape[:-1] + (shape[-1] + 1,)

    def forward_and_log_det(self, x):
        # (B, K) f32 TPU batches take the fused single-pass kernel; note the
        # profitability check looks at the OUTPUT length K-1
        if x.ndim == 2 and _pallas_profitable(x[..., :-1]):
            return _simplex_forward_logdet_pallas_diffable(x)
        return self.forward(x), self.forward_log_det_jacobian(x)

    def forward(self, x):
        K = x.shape[-1]
        if K < 2:
            raise ValueError("simplex dimension must be >= 2")
        dtype = jnp.result_type(x, float)
        x = x.astype(dtype)
        eps = _eps(dtype)
        # s_k = sum_{i<k} x_i for k = 0..K-2 (exclusive prefix sum).
        s = jnp.cumsum(x[..., : K - 2], axis=-1)
        s = jnp.concatenate([jnp.zeros_like(x[..., :1]), s], axis=-1)
        xk = x[..., : K - 1]
        z_first = xk * (1 - 2 * eps) + eps
        z_rest = (xk + eps) * (1 - 2 * eps) / ((1 + eps) - s)
        k_is_zero = jnp.arange(K - 1) == 0
        z = jnp.where(k_is_zero, z_first, z_rest)
        return logit(z) + _log_km1_minus_k(K, dtype)

    def forward_log_det_jacobian(self, x):
        K = x.shape[-1]
        dtype = jnp.result_type(x, float)
        x = x.astype(dtype)
        eps = _eps(dtype)
        s = jnp.cumsum(x[..., : K - 2], axis=-1)
        s = jnp.concatenate([jnp.zeros_like(x[..., :1]), s], axis=-1)
        rem = jnp.maximum(1.0 - s, eps)
        xk = x[..., : K - 1]
        k_is_zero = jnp.arange(K - 1) == 0
        z = jnp.where(k_is_zero, xk, xk / rem)
        lp = jnp.log(jnp.maximum(z, eps)) + jnp.log(jnp.maximum(1.0 - z, eps))
        lp = lp + jnp.where(k_is_zero, 0.0, jnp.log(rem))
        return -jnp.sum(lp, axis=-1)

    def inverse(self, y):
        if _pallas_profitable(y):
            return _simplex_inverse_pallas_diffable(y)
        if y.shape[-1] + 1 >= _ASSOC_SCAN_MIN_K:
            return _simplex_inverse_parallel(y)
        return _simplex_inverse(y)

    def inverse_and_log_det(self, y):
        if _pallas_profitable(y):
            return _simplex_inverse_logdet_pallas_diffable(y)
        if y.shape[-1] + 1 >= _ASSOC_SCAN_MIN_K:
            x = _simplex_inverse_parallel(y)
        else:
            x = _simplex_inverse(y)
        return x, -self.forward_log_det_jacobian(x)


def _on_tpu() -> bool:
    """The jvp rules keep the Pallas PRIMAL under differentiation on TPU
    (value_and_grad is the NUTS hot path) but must fall back to the jnp
    primal elsewhere — a direct caller may differentiate these wrappers on
    CPU, where Pallas only runs in interpret mode."""
    return jax.default_backend() == "tpu"


def _clamp_mask(pre):
    """d clamp(pre, 0, 1) / d pre — computed by differentiating the SAME
    `clamp` the scan applies, so boundary/tie conventions match jax.jvp of
    the sequential path exactly."""
    return jax.jvp(lambda p: clamp(p, 0.0, 1.0), (pre,), (jnp.ones_like(pre),))[1]


def _simplex_inverse_tangent(x, y, dy):
    """Exact LINEAR tangent dx of y -> x = _simplex_inverse(y), given the
    primal x (the scan's running sums are recovered from it by cumsum).

    The scan's tangent recurrence is affine in ds (the running-sum tangent):
        ds_{k+1} = a_k ds_k + b_k,
        a_k = 1 - m_k z_k/(1-2eps),  b_k = m_k ((1+eps)-s_k)/(1-2eps) dz_k
    (k=0: a_0=1, b_0 = m_0 dz_0/(1-2eps)), with m_k the clamp masks — so it
    solves in O(log K) depth by the same affine associative_scan trick as
    `_simplex_inverse_parallel`, instead of re-running the sequential scan.
    Linear in dy => XLA transposes it for reverse mode (`grad` through the
    Pallas dispatch stays on the fast path)."""
    Km1 = y.shape[-1]
    K = Km1 + 1
    dtype = jnp.result_type(y, float)
    y = y.astype(dtype)
    dy = dy.astype(dtype)
    x = x.astype(dtype)
    eps = _eps(dtype)
    z = logistic(y - _log_km1_minus_k(K, dtype))
    dz = z * (1.0 - z) * dy
    # s_k = scan carry BEFORE step k, k = 0..K-2 (exclusive prefix of x)
    s = jnp.cumsum(x[..., : K - 2], axis=-1)
    s = jnp.concatenate([jnp.zeros_like(x[..., :1]), s], axis=-1)
    k_is_zero = jnp.arange(Km1) == 0
    pre = jnp.where(
        k_is_zero,
        (z - eps) / (1 - 2 * eps),
        ((1 + eps) - s) / (1 - 2 * eps) * z - eps,
    )
    m = _clamp_mask(pre)
    a = jnp.where(k_is_zero, 1.0, 1.0 - m * z / (1 - 2 * eps))
    b = m * jnp.where(
        k_is_zero, dz / (1 - 2 * eps), ((1 + eps) - s) / (1 - 2 * eps) * dz
    )

    def compose(f, g):
        fa, fb = f
        ga, gb = g
        return fa * ga, ga * fb + gb

    _, B = jax.lax.associative_scan(compose, (a, b), axis=-1)
    # B[..., k] = ds_{k+1}; dx_k = ds_{k+1} - ds_k
    ds_excl = jnp.concatenate([jnp.zeros_like(B[..., :1]), B[..., :-1]], axis=-1)
    dxk = B - ds_excl
    s_final = s[..., -1] + x[..., K - 2]
    dx_last = -_clamp_mask(1.0 - s_final) * B[..., -1]
    return jnp.concatenate([dxk, dx_last[..., None]], axis=-1)


def _ld_from_x(x):
    return -SimplexBijector().forward_log_det_jacobian(x)


@jax.custom_jvp
def _simplex_inverse_pallas_diffable(y):
    """Pallas primal; closed-form linear tangent (Pallas kernels are not
    generally differentiable; the tangent map is identical to the scan's)."""
    from ..kernels.simplex import simplex_inverse_pallas

    return simplex_inverse_pallas(y)


@_simplex_inverse_pallas_diffable.defjvp
def _simplex_inverse_pallas_jvp(primals, tangents):
    (y,) = primals
    (dy,) = tangents
    if _on_tpu():
        from ..kernels.simplex import simplex_inverse_pallas

        x = simplex_inverse_pallas(y)
    else:
        x = _simplex_inverse(y)
    return x, _simplex_inverse_tangent(x, y, dy)


@jax.custom_jvp
def simplex_inverse_logdet_wlog(y, am1):
    """(x, ld_inv, sum_k am1[k] log x_k). `am1` may be a traced array (it
    rides into the Pallas kernel as a lane-broadcast operand — the
    params-as-jit-arguments style docs/vector.md recommends never declines
    the fusion). Tangents via the jnp composition, diffable in BOTH args."""
    from ..kernels.simplex import simplex_inverse_logdet_wlog_pallas

    return simplex_inverse_logdet_wlog_pallas(y, am1)


def _simplex_inverse_logdet_wlog_jnp(y, am1):
    x, ld = _simplex_inverse_logdet_jnp(y)
    w = jnp.asarray(am1, x.dtype)  # match the primal dtype (f32 on TPU)
    # eps-nudge matching the reference's transformed-path Dirichlet density
    # logpdf(d, x .+ eps) (src/Bijectors.jl:253): finite (and NaN-free for
    # alpha = 1 coordinates) when the stick-breaking clamps saturate x to 0
    return x, ld, jnp.sum(w * jnp.log(x + _eps(x.dtype)), axis=-1)


def _wlog_tangents(x, y, am1, dy, dam1):
    """(dx, dld, dwlog): closed-form dx, then chain rule through the cheap
    elementwise (ld, wlog)-from-x map (jax.jvp of it is O(BK) parallel)."""
    dx = _simplex_inverse_tangent(x, y, dy)

    def ld_wlog(x, w):
        return _ld_from_x(x), jnp.sum(w * jnp.log(x + _eps(x.dtype)), axis=-1)

    w = jnp.asarray(am1, x.dtype)
    dw = jnp.asarray(dam1, x.dtype)
    _, (dld, dwlog) = jax.jvp(ld_wlog, (x, w), (dx, dw))
    return dx, dld, dwlog


@simplex_inverse_logdet_wlog.defjvp
def _simplex_inverse_logdet_wlog_jvp(primals, tangents):
    y, am1 = primals
    dy, dam1 = tangents
    if _on_tpu():
        from ..kernels.simplex import simplex_inverse_logdet_wlog_pallas

        x, ld, wlog = simplex_inverse_logdet_wlog_pallas(y, am1)
    else:
        x, ld, wlog = _simplex_inverse_logdet_wlog_jnp(y, am1)
    dx, dld, dwlog = _wlog_tangents(x, y, am1, dy, dam1)
    return (x, ld, wlog), (dx, dld, dwlog)


@jax.custom_jvp
def simplex_logdet_wlog_nox(y, am1):
    """(ld_inv, sum_k am1[k] log x_k) WITHOUT writing x to HBM (the
    linked_logdensity path; a kernel cannot be DCE'd into)."""
    from ..kernels.simplex import simplex_inverse_logdet_wlog_pallas

    _, ld, wlog = simplex_inverse_logdet_wlog_pallas(y, am1, want_x=False)
    return ld, wlog


@simplex_logdet_wlog_nox.defjvp
def _simplex_logdet_wlog_nox_jvp(primals, tangents):
    y, am1 = primals
    dy, dam1 = tangents
    if _on_tpu():
        from ..kernels.simplex import simplex_inverse_logdet_wlog_pallas

        # want_x=True here: the closed-form tangent needs the primal x (one
        # extra (B, K) HBM write — still far cheaper than the jnp scan path)
        x, ld, wlog = simplex_inverse_logdet_wlog_pallas(y, am1)
    else:
        x, ld, wlog = _simplex_inverse_logdet_wlog_jnp(y, am1)
    _, dld, dwlog = _wlog_tangents(x, y, am1, dy, dam1)
    return (ld, wlog), (dld, dwlog)


@jax.custom_jvp
def simplex_logdet_wlog_nox_t(yT, am1):
    """Transposed-layout variant of simplex_logdet_wlog_nox: yT is (K-1, B)
    — the kernel's native batch-on-lanes orientation — so the (B, K-1) ->
    (K-1, B) HBM relayout is skipped entirely (the linked_logdensity_t
    serving path)."""
    from ..kernels.simplex import simplex_inverse_logdet_wlog_pallas

    _, ld, wlog = simplex_inverse_logdet_wlog_pallas(
        yT, am1, want_x=False, pre_t=True
    )
    return ld, wlog


@simplex_logdet_wlog_nox_t.defjvp
def _simplex_logdet_wlog_nox_t_jvp(primals, tangents):
    yT, am1 = primals
    dyT, dam1 = tangents
    y = jnp.swapaxes(yT, 0, 1)
    if _on_tpu():
        from ..kernels.simplex import simplex_inverse_logdet_wlog_pallas

        x, ld, wlog = simplex_inverse_logdet_wlog_pallas(yT, am1, pre_t=True)
    else:
        x, ld, wlog = _simplex_inverse_logdet_wlog_jnp(y, am1)
    _, dld, dwlog = _wlog_tangents(x, y, am1, jnp.swapaxes(dyT, 0, 1), dam1)
    return (ld, wlog), (dld, dwlog)


@jax.custom_jvp
def _simplex_forward_logdet_pallas_diffable(x):
    """Fused Pallas (y, ld_fwd) primal; tangents via the jnp composition."""
    from ..kernels.simplex import simplex_forward_logdet_pallas

    return simplex_forward_logdet_pallas(x)


def _simplex_forward_logdet_jnp(x):
    b = SimplexBijector()
    return b.forward(x), b.forward_log_det_jacobian(x)


@_simplex_forward_logdet_pallas_diffable.defjvp
def _simplex_forward_logdet_pallas_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    # Pallas primal on TPU; tangent via the jnp forward — which is already
    # closed-form parallel (cumsum-based, no scan), so its jvp is cheap and
    # XLA DCEs the unused jnp primal outputs.
    primal, tangent = jax.jvp(_simplex_forward_logdet_jnp, (x,), (dx,))
    if _on_tpu():
        from ..kernels.simplex import simplex_forward_logdet_pallas

        primal = simplex_forward_logdet_pallas(x)
    return primal, tangent


@jax.custom_jvp
def _simplex_inverse_logdet_pallas_diffable(y):
    """Fused Pallas (x, ld_inv) primal; tangents via the jnp composition."""
    from ..kernels.simplex import simplex_inverse_logdet_pallas

    return simplex_inverse_logdet_pallas(y)


def _simplex_inverse_logdet_jnp(y):
    x = _simplex_inverse(y)
    return x, -SimplexBijector().forward_log_det_jacobian(x)


@_simplex_inverse_logdet_pallas_diffable.defjvp
def _simplex_inverse_logdet_pallas_jvp(primals, tangents):
    (y,) = primals
    (dy,) = tangents
    if _on_tpu():
        from ..kernels.simplex import simplex_inverse_logdet_pallas

        x, ld = simplex_inverse_logdet_pallas(y)
    else:
        x, ld = _simplex_inverse_logdet_jnp(y)
    dx = _simplex_inverse_tangent(x, y, dy)
    _, dld = jax.jvp(_ld_from_x, (x,), (dx,))
    return (x, ld), (dx, dld)


def _pallas_profitable(y) -> bool:
    """Dispatch the Pallas kernel where it measured faster than the scanned
    jnp path on TPU (2D f32 batches, small K; see kernels/simplex.py).
    Trace-time decision: static shape/dtype/backend only."""
    try:
        from .. import kernels

        return kernels.profitable(
            "simplex", batch=y.shape[0], k=y.shape[-1] + 1, ndim=y.ndim, dtype=y.dtype
        )
    except Exception:
        return False


def _pallas_profitable_t(yT) -> bool:
    """Transposed-layout dispatch: yT is (K-1, B)."""
    try:
        from .. import kernels

        return kernels.profitable(
            "simplex",
            batch=yT.shape[-1],
            k=yT.shape[0] + 1,
            ndim=yT.ndim,
            dtype=yT.dtype,
        )
    except Exception:
        return False


def _simplex_inverse(y):
    """Exact reference recurrence (simplex.jl:84-100), scanned over K-1 steps.

    y: (..., K-1) unconstrained -> x: (..., K) on the simplex. All batch dims
    ride along inside the scan carry, so each of the K-1 steps is one
    vectorized VPU op.
    """
    Km1 = y.shape[-1]
    K = Km1 + 1
    dtype = jnp.result_type(y, float)
    y = y.astype(dtype)
    eps = _eps(dtype)
    z = logistic(y - _log_km1_minus_k(K, dtype))  # (..., K-1)

    # Move the scanned axis to the front.
    zt = jnp.moveaxis(z, -1, 0)  # (K-1, ...)
    k_idx = jnp.arange(Km1)

    def step(s, inp):
        zk, k = inp
        x_first = clamp((zk - eps) / (1 - 2 * eps), 0.0, 1.0)
        x_rest = clamp(((1 + eps) - s) / (1 - 2 * eps) * zk - eps, 0.0, 1.0)
        xk = jnp.where(k == 0, x_first, x_rest)
        return s + xk, xk

    s_final, xs = jax.lax.scan(step, jnp.zeros(zt.shape[1:], dtype), (zt, k_idx))
    x_last = clamp(1.0 - s_final, 0.0, 1.0)
    x = jnp.concatenate([jnp.moveaxis(xs, 0, -1), x_last[..., None]], axis=-1)
    return x


# sequential-scan depth becomes the bottleneck for large simplices; above
# this K the log-depth associative-scan formulation takes over (measured
# crossover on v5e: ~1.2x at K=512, 5x at K=4096, slightly slower at K=64)
_ASSOC_SCAN_MIN_K = 128


def _simplex_inverse_parallel(y):
    """log-depth stick-breaking inverse via `lax.associative_scan`.

    The running-sum recurrence is AFFINE in s (the per-step clamps of the
    sequential path almost never bind: they activate only at |y| beyond
    ~ -log(eps), where both paths saturate to the boundary anyway):

        s_{k+1} = a_k s_k + b_k,   a_k = 1 - z_k/(1-2eps),
                                   b_k = (1+eps) z_k/(1-2eps) - eps   (k >= 1)
        s_1 = (z_0 - eps)/(1-2eps)

    Composition of affine maps is associative, so all prefix sums come out of
    one associative_scan over the event axis — O(log K) depth instead of the
    sequential O(K), the long-sequence scaling dimension SURVEY.md §2.2 maps
    stick-breaking onto. x is then recovered elementwise (with the same
    clamps as the sequential path)."""
    Km1 = y.shape[-1]
    K = Km1 + 1
    dtype = jnp.result_type(y, float)
    y = y.astype(dtype)
    eps = _eps(dtype)
    z = logistic(y - _log_km1_minus_k(K, dtype))  # (..., K-1)

    k_is_zero = jnp.arange(Km1) == 0
    a = jnp.where(k_is_zero, 1.0, 1.0 - z / (1 - 2 * eps))
    b = jnp.where(
        k_is_zero,
        (z - eps) / (1 - 2 * eps),
        (1 + eps) * z / (1 - 2 * eps) - eps,
    )

    def compose(f, g):
        # apply f then g: s -> g_a * (f_a * s + f_b) + g_b
        fa, fb = f
        ga, gb = g
        return fa * ga, ga * fb + gb

    A, B = jax.lax.associative_scan(compose, (a, b), axis=-1)
    # s_k for k = 0..K-2 (prefix sums BEFORE step k); s_{K-1} closes the stick.
    # The sequential path's per-step x-clamps keep its running sum in [0, 1];
    # clipping the scanned prefix recovers that invariant at extreme inputs
    # (the scan itself must stay clamp-free to remain associative).
    s = jnp.clip(
        jnp.concatenate([jnp.zeros_like(B[..., :1]), B[..., :-1]], axis=-1), 0.0, 1.0
    )
    s_last = jnp.clip(B[..., -1], 0.0, 1.0)

    x_first = clamp((z - eps) / (1 - 2 * eps), 0.0, 1.0)
    x_rest = clamp(((1 + eps) - s) / (1 - 2 * eps) * z - eps, 0.0, 1.0)
    xk = jnp.where(k_is_zero, x_first, x_rest)
    x_last = clamp(1.0 - s_last, 0.0, 1.0)
    return jnp.concatenate([xk, x_last[..., None]], axis=-1)


def simplex_forward_unrolled(x):
    """Trace-time-unrolled forward (identical math) — used by tests to check
    the vectorized path; also the form the Pallas kernel mirrors."""
    K = x.shape[-1]
    dtype = jnp.result_type(x, float)
    eps = _eps(dtype)
    ys = []
    s = jnp.zeros(x.shape[:-1], dtype)
    for k in range(K - 1):
        if k == 0:
            z = x[..., 0] * (1 - 2 * eps) + eps
        else:
            s = s + x[..., k - 1]
            z = (x[..., k] + eps) * (1 - 2 * eps) / ((1 + eps) - s)
        ys.append(logit(z) + math.log(K - 1 - k))
    return jnp.stack(ys, axis=-1)
