"""Pallas TPU kernels for the stick-breaking simplex bijector.

Layout: the event axis K lives on the SUBLANE dimension and the batch on the
128-wide LANE dimension, so the sequential K-recurrence runs as a register-
carried loop over sublanes while every step is a full-width VPU op across the
batch tile. This turns the inverse's lax.scan (K tiny sequential HLO steps)
into ONE kernel with K in-register steps and a single HBM round-trip.

Numerics match bijectors/simplex.py exactly (same eps algebra/clamps,
reference: /root/reference/src/bijectors/simplex.jl:84-120).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import _eps

from .layout import (
    block_lanes as _block_lanes,
    pad_to as _pad_to,
    padded_batch as _padded_batch,
)


def simplex_inverse_pallas(y, *, interpret: bool = False):
    """y: (B, K-1) -> x: (B, K) (unconstrained -> simplex), matching
    bijectors.simplex._simplex_inverse bit-for-bit in f32."""
    B, Km1 = y.shape
    K = Km1 + 1
    dtype = jnp.result_type(y, float)
    y = y.astype(dtype)
    eps = _eps(dtype)
    log_coeffs = np.log(np.arange(K - 1, 0, -1)).astype(dtype)

    Bp = _padded_batch(B)
    W = _block_lanes(Bp)
    yt = _pad_to(y, Bp, 0).T  # (K-1, Bp)

    def kernel(y_ref, x_ref):
        s = jnp.zeros((1, W), dtype)
        for k in range(K - 1):
            z = jax.nn.sigmoid(y_ref[k, :] - log_coeffs[k]).reshape(1, W)
            if k == 0:
                xk = jnp.clip((z - eps) / (1 - 2 * eps), 0.0, 1.0)
            else:
                xk = jnp.clip(((1 + eps) - s) / (1 - 2 * eps) * z - eps, 0.0, 1.0)
            x_ref[k, :] = xk[0, :]
            s = s + xk
        x_ref[K - 1, :] = jnp.clip(1.0 - s, 0.0, 1.0)[0, :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, Bp), dtype),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((Km1, W), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (K, W), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(yt)
    return out.T[:B]


def _simplex_fused_pallas(y, am1=None, *, want_x=True, pre_t=False, interpret=False):
    """Single fused inverse pass; optional extras selected at TRACE time:

      * am1 (K,) weights (concrete OR traced) -> also accumulate
        wlog = sum am1_k log x_k (the Dirichlet data term; weights ride as a
        lane-broadcast VMEM operand, so alpha can be a jit argument)
      * want_x=False -> skip writing the (K, B) x output entirely (a kernel
        cannot be DCE'd into; logdensity-only callers save the HBM write)
      * pre_t=True -> y is ALREADY in the kernel's native (K-1, B) layout
        (the transposed linked_logdensity_t path): skips the (B, K-1) ->
        (K-1, B) HBM relayout, which costs about one full extra pass

    Returns (x_or_None, ld_inv, wlog_or_None); x comes back batch-major
    (B, K) either way. The eps algebra lives ONCE here for all variants
    (CLAUDE.md: reference numerics are load-bearing).
    """
    if pre_t:
        Km1, B = y.shape
    else:
        B, Km1 = y.shape
    K = Km1 + 1
    dtype = jnp.result_type(y, float)
    y = y.astype(dtype)
    want_wlog = am1 is not None
    eps = _eps(dtype)
    log_coeffs = np.log(np.arange(K - 1, 0, -1)).astype(dtype)

    Bp = _padded_batch(B)
    W = _block_lanes(Bp)
    yt = _pad_to(y, Bp, 1) if pre_t else _pad_to(y, Bp, 0).T  # (K-1, Bp)
    if want_wlog:
        # weights ride as a VMEM OPERAND (broadcast to lane width): tracer-
        # safe, and alpha changes don't recompile the kernel
        am1_b = jnp.broadcast_to(
            jnp.asarray(am1, dtype)[:, None], (K, W)
        )

    def kernel(*all_refs):
        refs = list(all_refs)
        y_ref = refs.pop(0)
        am1_ref = refs.pop(0) if want_wlog else None
        x_ref = refs.pop(0) if want_x else None
        ld_ref = refs.pop(0)
        wl_ref = refs.pop(0) if want_wlog else None
        s = jnp.zeros((1, W), dtype)
        lp = jnp.zeros((1, W), dtype)
        wl = jnp.zeros((1, W), dtype)
        for k in range(K - 1):
            z = jax.nn.sigmoid(y_ref[k, :] - log_coeffs[k]).reshape(1, W)
            if k == 0:
                xk = jnp.clip((z - eps) / (1 - 2 * eps), 0.0, 1.0)
                zl = xk
                lp = lp + jnp.log(jnp.maximum(zl, eps)) + jnp.log(
                    jnp.maximum(1.0 - zl, eps)
                )
            else:
                xk = jnp.clip(((1 + eps) - s) / (1 - 2 * eps) * z - eps, 0.0, 1.0)
                rem = jnp.maximum(1.0 - s, eps)
                zl = xk / rem
                lp = (
                    lp
                    + jnp.log(jnp.maximum(zl, eps))
                    + jnp.log(jnp.maximum(1.0 - zl, eps))
                    + jnp.log(rem)
                )
            if want_x:
                x_ref[k, :] = xk[0, :]
            if want_wlog:
                # eps-nudge: the reference evaluates logpdf(d, x .+ eps) on
                # the transformed path (src/Bijectors.jl:253) — also keeps
                # 0 * log(0) = NaN out of the alpha=1 coordinates at the
                # clamped boundary (1e10-jump robustness)
                wl = wl + am1_ref[k, :].reshape(1, W) * jnp.log(xk + eps)
            s = s + xk
        x_last = jnp.clip(1.0 - s, 0.0, 1.0)
        if want_x:
            x_ref[K - 1, :] = x_last[0, :]
        if want_wlog:
            wl = wl + am1_ref[K - 1, :].reshape(1, W) * jnp.log(x_last + eps)
            wl_ref[0, :] = wl[0, :]
        ld_ref[0, :] = lp[0, :]  # inverse logdet = -forward logdet

    in_specs = [
        pl.BlockSpec((Km1, W), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    operands = [yt]
    if want_wlog:
        in_specs.append(
            pl.BlockSpec((K, W), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(am1_b)
    out_shape, out_specs = [], []
    if want_x:
        out_shape.append(jax.ShapeDtypeStruct((K, Bp), dtype))
        out_specs.append(
            pl.BlockSpec((K, W), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
    out_shape.append(jax.ShapeDtypeStruct((1, Bp), dtype))
    out_specs.append(
        pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM)
    )
    if want_wlog:
        out_shape.append(jax.ShapeDtypeStruct((1, Bp), dtype))
        out_specs.append(
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM)
        )

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(Bp // W,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*operands)
    outs = list(outs)
    x = outs.pop(0).T[:B] if want_x else None
    ld = outs.pop(0)[0, :B]
    wlog = outs.pop(0)[0, :B] if want_wlog else None
    return x, ld, wlog


def simplex_inverse_logdet_pallas(y, *, interpret: bool = False):
    """y: (B, K-1) -> (x: (B, K), ld_inv: (B,)) in ONE pass."""
    x, ld, _ = _simplex_fused_pallas(y, interpret=interpret)
    return x, ld


def simplex_inverse_logdet_wlog_pallas(
    y, am1, *, want_x: bool = True, pre_t: bool = False, interpret: bool = False
):
    """y: (B, K-1) — or (K-1, B) with pre_t=True — am1: (K,) concrete or
    traced -> (x, ld_inv, wlog) with wlog = sum_k am1[k] log(x_k); x is
    None when want_x=False."""
    return _simplex_fused_pallas(
        y, am1, want_x=want_x, pre_t=pre_t, interpret=interpret
    )


def simplex_forward_logdet_pallas(x, *, interpret: bool = False):
    """x: (B, K) -> (y: (B, K-1), logdet: (B,)) fused single pass,
    matching SimplexBijector.forward / .forward_log_det_jacobian."""
    B, K = x.shape
    dtype = jnp.result_type(x, float)
    x = x.astype(dtype)
    eps = _eps(dtype)
    log_coeffs = np.log(np.arange(K - 1, 0, -1)).astype(dtype)

    Bp = _padded_batch(B)
    W = _block_lanes(Bp)
    xt = _pad_to(x, Bp, 0).T  # (K, Bp); pad rows are zeros -> harmless

    def kernel(x_ref, y_ref, ld_ref):
        # s = prefix sum of x before index k; shared by transform and logdet.
        s = jnp.zeros((1, W), dtype)
        lp = jnp.zeros((1, W), dtype)
        for k in range(K - 1):
            xk = x_ref[k, :].reshape(1, W)
            if k == 0:
                zf = xk * (1 - 2 * eps) + eps
                zl = xk
                lp = lp + jnp.log(jnp.maximum(zl, eps)) + jnp.log(
                    jnp.maximum(1.0 - zl, eps)
                )
            else:
                zf = (xk + eps) * (1 - 2 * eps) / ((1 + eps) - s)
                rem_l = jnp.maximum(1.0 - s, eps)
                zl = xk / rem_l
                lp = (
                    lp
                    + jnp.log(jnp.maximum(zl, eps))
                    + jnp.log(jnp.maximum(1.0 - zl, eps))
                    + jnp.log(rem_l)
                )
            y_ref[k, :] = (jnp.log(zf) - jnp.log1p(-zf) + log_coeffs[k])[0, :]
            s = s + xk
        ld_ref[0, :] = (-lp)[0, :]

    y_out, ld_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K - 1, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
        ),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((K, W), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((K - 1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xt)
    return y_out.T[:B], ld_out[0, :B]
