"""Fused Pallas TPU kernel for the LKJ / correlation-matrix inverse link.

One kernel computes, from the packed unconstrained vector y (length
K(K-1)/2, column-major strict upper — reference corr.jl:344-399):

  * X = W'W, the correlation matrix (W = upper Cholesky factor),
  * logJ, the inverse-link log-det (incl. the VecCorr diag-coefficient term,
    corr.jl:74-81),
  * log diag(W), from which LKJ.logpdf gets logdet X = 2*sum(log diag W).

Layout: batch on the 128-wide LANE axis, the triangle/matrix on SUBLANES.
The XLA path materializes ~20 intermediates shaped (B, K, K) whose last dim
K<<128 pads to 128 lanes (16x HBM waste at K=8); here every intermediate is
a (1, 128) register row and HBM is touched exactly once each way.

Numerics match bijectors/corr.py (_inv_link_chol_lkj + pd_from_upper):
same tanh / stable-logcosh / exp / running-sum algebra, f32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import (
    block_lanes as _block_lanes,
    pad_to as _pad_to,
    padded_batch as _padded_batch,
)

LOG2 = math.log(2.0)


def lkj_logdet_pallas(
    y, K: int, *, chol: bool = False, pre_t: bool = False, interpret: bool = False
):
    """Logdensity-only variant: (logJ, log_diag_W) WITHOUT materializing
    X = W'W — the LKJ density needs only the factor diagonal, and when the
    caller drops x the X triple-product and its HBM write are pure waste
    (XLA would DCE them in the jnp path; a kernel cannot be DCE'd into).

    chol=False: logJ of VecCorrBijector.inverse (incl. the diag-coefficient
    correction, corr.jl:74-81). chol=True: logJ of the Cholesky-variant
    inverse link (corr.jl:485-501) — same recurrence, coefficient 0.
    pre_t=True: y is already (P, B) (the transposed linked_logdensity_t
    path) — skips the (B, P) -> (P, B) HBM relayout, about one full extra
    pass at B=131072. log_diag comes back batch-major (B, K) either way."""
    if pre_t:
        P, B = y.shape
    else:
        B, P = y.shape
    assert P == K * (K - 1) // 2
    dtype = jnp.result_type(y, float)
    y = y.astype(dtype)
    Bp = _padded_batch(B)
    W = _block_lanes(Bp)
    yt = _pad_to(y, Bp, 1) if pre_t else _pad_to(y, Bp, 0).T

    if chol:
        coeff = np.zeros(K, dtype)
    else:
        coeff = np.concatenate(
            [[0.0], np.maximum(np.arange(K - 2, -1, -1), 0)]
        ).astype(dtype)

    def kernel(y_ref, lj_ref, ldw_ref):
        zero = jnp.zeros((1, W), dtype)
        logJ = zero
        ldw_ref[0, :] = zero[0, :]
        for j in range(1, K):
            lr = zero
            base = j * (j - 1) // 2
            for i in range(j):
                yv = y_ref[base + i, :].reshape(1, W)
                a = jnp.abs(yv)
                lc = a + jax.nn.softplus(-2.0 * a) - LOG2
                lr = lr - lc
                logJ = logJ + lr
            ldw_ref[j, :] = lr[0, :]
            logJ = logJ + lr * (1.0 + coeff[j])
        lj_ref[0, :] = logJ[0, :]

    logJ, log_diag = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((K, Bp), dtype),
        ),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((P, W), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(yt)
    return logJ[0, :B], log_diag.T[:B]


def lkj_inverse_pallas(y, K: int, *, interpret: bool = False):
    """y: (B, K(K-1)/2) -> (X: (B, K, K), logJ: (B,), log_diag_W: (B, K)).

    logJ includes the VecCorrBijector diag-coefficient correction
    (corr.jl:74-81), i.e. it is exactly VecCorrBijector.inverse_and_log_det's
    log-det output.
    """
    B, P = y.shape
    assert P == K * (K - 1) // 2
    dtype = jnp.result_type(y, float)
    y = y.astype(dtype)

    Bp = _padded_batch(B)
    W = _block_lanes(Bp)
    yt = _pad_to(y, Bp, 0).T  # (P, Bp)

    # VecCorr diag coefficients (bijectors/corr.py): [0, K-2, K-3, ..., 0]
    coeff = np.concatenate([[0.0], np.maximum(np.arange(K - 2, -1, -1), 0)]).astype(
        dtype
    )

    def kernel(y_ref, x_ref, lj_ref, ldw_ref, w_s):
        zero = jnp.zeros((1, W), dtype)
        logJ = zero
        # column 0 of W is e_0
        w_s[0, :] = jnp.ones((W,), dtype)
        for i in range(1, K):
            w_s[i * K + 0, :] = jnp.zeros((W,), dtype)
        ldw_ref[0, :] = zero[0, :]
        for j in range(1, K):
            lr = zero  # running -sum logcosh down column j
            base = j * (j - 1) // 2
            for i in range(j):
                yv = y_ref[base + i, :].reshape(1, W)
                z = jnp.tanh(yv)
                a = jnp.abs(yv)
                lc = a + jax.nn.softplus(-2.0 * a) - LOG2  # stable logcosh
                w_s[i * K + j, :] = (z * jnp.exp(lr))[0, :]
                lr = lr - lc
                logJ = logJ + lr  # sum of lr_incl over the strict upper
            # diagonal entry W[j,j] = exp(lr); its log is lr
            w_s[j * K + j, :] = jnp.exp(lr)[0, :]
            for i in range(j + 1, K):
                w_s[i * K + j, :] = jnp.zeros((W,), dtype)
            ldw_ref[j, :] = lr[0, :]
            # logJ += lr (diag term) + coeff_j * log W_jj (vec-corr correction)
            logJ = logJ + lr * (1.0 + coeff[j])
        lj_ref[0, :] = logJ[0, :]
        # X = W'W: X[a,b] = sum_{k<=min(a,b)} W[k,a] W[k,b]
        for a in range(K):
            for b in range(a, K):
                acc = zero
                for k in range(a + 1):
                    acc = acc + (
                        w_s[k * K + a, :] * w_s[k * K + b, :]
                    ).reshape(1, W)
                x_ref[a * K + b, :] = acc[0, :]
                if b != a:
                    x_ref[b * K + a, :] = acc[0, :]

    X_flat, logJ, log_diag = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K * K, Bp), dtype),
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((K, Bp), dtype),
        ),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((P, W), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((K * K, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((K * K, W), dtype)],
        interpret=interpret,
    )(yt)
    X = jnp.moveaxis(X_flat.reshape(K, K, Bp)[..., :B], -1, 0)
    return X, logJ[0, :B], log_diag.T[:B]
