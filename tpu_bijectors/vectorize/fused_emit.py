"""Hand-written loop-entry emitters + per-slot partial maps of the
whole-model fused kernel (see fused_kernel.py): simplex stick-breaking,
PD Cholesky algebra, Gaussian/Student-t quadratic forms. Bodies mirror the
per-leaf kernels in kernels/ — the numerics (eps-algebra, clip/max tie
conventions) are load-bearing for the kernel == composed equivalence tests.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .fused_base import LOG2, LOGPI, LOG2PI  # noqa: F401

# ---------------------------------------------------------------------------
# emitters (bodies mirror the per-leaf kernels; numerics are load-bearing)
#
# BLOCK-TRANSCENDENTAL switch (round 3): a (1, W) row op occupies the same
# vregs as a full 8-sublane op but uses 1/8 of each, so gathering the
# transcendental inputs of a loop entry into a compact (rows, W) value and
# running ONE block op LOOKS like a free 8x. Measured on the v5e it is NOT:
# Mosaic lowers the gather (concatenate of computed rows) and the row
# slices back out of the block result as register relayouts whose cost
# EXCEEDS the sublane waste — dironly (10 x Dirichlet(16), B=131072) timed
# ~2x slower with the gathered form. `_BLOCK_T` keeps both forms testable
# (tools/emit_ab_probe.py); the default is the measured winner: per-row
# transcendentals, no relayouts.
# ---------------------------------------------------------------------------

_BLOCK_T = False  # measured loser on v5e; True = gathered block form


def _simplex_sigmoids(rr, K, W, dtype):
    """sigmoid(v_k − log(K−1−k)) for the K−1 rows: one gathered block op
    (_BLOCK_T) or K−1 per-row ops (default; see the switch note above).

    The shift is an exact small-integer log either way, matching the
    host-computed `math.log(K-1-k)` bit-for-bit in f64 and ≤1 ulp in f32.
    """
    if _BLOCK_T:
        Y = jnp.concatenate([rr(k) for k in range(K - 1)], axis=0)
        # Mosaic's tpu.iota only produces integers: iota in i32, cast.
        rows = jax.lax.broadcasted_iota(jnp.int32, (K - 1, 1), 0).astype(dtype)
        sh = jnp.log((K - 1.0) - rows)
        return jax.nn.sigmoid(Y - sh)
    return [
        jax.nn.sigmoid(rr(k) - math.log(K - 1 - k)) for k in range(K - 1)
    ]


def _zrow(Z, k):
    return Z[k] if isinstance(Z, list) else Z[k : k + 1, :]


def _emit_simplex(K, eps):
    # stick-breaking inverse + ld + eps-nudged weighted log term
    # (kernels/simplex.py::_simplex_fused_pallas, want_x=False).
    # _BLOCK_T=True runs the transcendentals as 3 gathered block ops;
    # default is per-row (measured winner — see the switch note). The math
    # is identical either way (lp's reduction order changes within fp
    # tolerance only).

    def emit(rr, rp, W, dtype):
        # params: am1[0..K-1], const
        Z = _simplex_sigmoids(rr, K, W, dtype)
        s = jnp.zeros((1, W), dtype)
        ld_args = []  # unit-weight log args (zl / 1-zl / rem rows)
        xs = []  # eps-nudged sticks, weighted by am1 rows
        for k in range(K - 1):
            z = _zrow(Z, k)
            if k == 0:
                xk = jnp.clip((z - eps) / (1 - 2 * eps), 0.0, 1.0)
                zl = xk
            else:
                xk = jnp.clip(((1 + eps) - s) / (1 - 2 * eps) * z - eps, 0.0, 1.0)
                rem = jnp.maximum(1.0 - s, eps)
                zl = xk / rem
                ld_args.append(rem)
            ld_args.append(jnp.maximum(zl, eps))
            ld_args.append(jnp.maximum(1.0 - zl, eps))
            xs.append(xk + eps)
            s = s + xk
        xs.append(jnp.clip(1.0 - s, 0.0, 1.0) + eps)
        if _BLOCK_T:
            lp = jnp.sum(
                jnp.log(jnp.concatenate(ld_args, axis=0)), axis=0, keepdims=True
            )
            am1 = jnp.concatenate([rp(k) for k in range(K)], axis=0)  # (K, W)
            wl = jnp.sum(
                am1 * jnp.log(jnp.concatenate(xs, axis=0)),
                axis=0,
                keepdims=True,
            )
            return lp + wl + rp(K)  # ld_inv + wlog + const
        acc = rp(K)
        for a in ld_args:
            acc = acc + jnp.log(a)
        for k, x in enumerate(xs):
            acc = acc + rp(k) * jnp.log(x)
        return acc

    return emit


def _lkj_weights(K, chol, eta, dtype):
    """Per-slot total weight w_s such that lp = -sum_s w_s logcosh(y_s) +
    const: the closed-form logJ coefficient (vec: K - i, chol: j - i + 1)
    plus the density's column weight (vec: 2(eta-1) everywhere; chol:
    coef_j = 2 eta - 2 + K - (j+1) for column j)."""
    rows = np.asarray([i for j in range(K) for i in range(j)], np.float64)
    cols = np.asarray([j for j in range(K) for i in range(j)], np.float64)
    base = (cols - rows + 1.0) if chol else (float(K) - rows)
    base = jnp.asarray(base, dtype)
    if chol:
        colw = 2.0 * eta - 2.0 + float(K) - (jnp.asarray(cols, dtype) + 1.0)
    else:
        colw = 2.0 * (eta - 1.0)
    return base + colw


def _pd_diag_exps(rr, K, W, dtype):
    """Diagonal rows → (D, E, Einv) with E = exp(y_diag), Einv = exp(−y):
    one gathered (2K, W) block exp under _BLOCK_T, else per-row exps +
    reciprocals (measured winner; see the switch note)."""
    if _BLOCK_T:
        D = jnp.concatenate(
            [rr(r * (r + 1) // 2 + r) for r in range(K)], axis=0
        )  # (K, W)
        E2 = jnp.exp(jnp.concatenate([D, -D], axis=0))  # (2K, W) block exp
        return (
            [D[r : r + 1, :] for r in range(K)],
            [E2[r : r + 1, :] for r in range(K)],
            [E2[K + r : K + r + 1, :] for r in range(K)],
        )
    # exp(d) / exp(-d) as separate per-row exps — matches kernels/pd.py
    # (inv_diag = exp(-yd)) so the kernel == composed contract holds exactly
    D = [rr(r * (r + 1) // 2 + r) for r in range(K)]
    return D, [jnp.exp(d) for d in D], [jnp.exp(-d) for d in D]


def _emit_pd(K, mode: str):
    # kernels/pd.py::pd_logdensity_pallas body; density assembled as
    # logJ + w_sumd * sum(y_diag) - 0.5 * trace + const.
    def emit(rr, rp, W, dtype):
        # params: C[0..K*K-1] (row-major), w_sumd, const
        zero = jnp.zeros((1, W), dtype)
        D, E, Einv = _pd_diag_exps(rr, K, W, dtype)
        logJ = zero
        sumd = zero
        for r in range(K):
            logJ = logJ + (K + 1.0 - r) * D[r]
            sumd = sumd + D[r]
        L = {}
        inv_diag = [None] * K
        for r in range(K):
            base = r * (r + 1) // 2
            inv_diag[r] = Einv[r]
            for c in range(r):
                L[(r, c)] = rr(base + c)
            L[(r, r)] = E[r]
        logJ = logJ + K * LOG2
        tr = zero
        if mode == "dot":
            for a in range(K):
                for b in range(a, K):
                    acc = zero
                    for k in range(a + 1):
                        acc = acc + L[(a, k)] * L[(b, k)]
                    w = 1.0 if a == b else 2.0
                    tr = tr + w * acc * rp(a * K + b)
        else:
            A = {}
            for i in range(K):
                for j in range(K):
                    acc = rp(i * K + j)
                    for k in range(i):
                        acc = acc - L[(i, k)] * A[(k, j)]
                    aij = acc * inv_diag[i]
                    A[(i, j)] = aij
                    tr = tr + aij * aij
        return logJ + rp(K * K) * sumd - 0.5 * tr + rp(K * K + 1)

    return emit


# ---------------------------------------------------------------------------
# per-slot partial maps (exact gradients, matching jax.jvp of the composed
# path INCLUDING its max/clip tie conventions: d/dx max(x, c) is 0.5 at
# x == c, so masks below average the strict and non-strict indicators)
# ---------------------------------------------------------------------------


def _clipmask01(p, dtype):
    lo = 0.5 * ((p > 0.0).astype(dtype) + (p >= 0.0).astype(dtype))
    hi = 0.5 * ((p < 1.0).astype(dtype) + (p <= 1.0).astype(dtype))
    return lo * hi


def _maxmask(u, c, dtype):
    return 0.5 * ((u > c).astype(dtype) + (u >= c).astype(dtype))


def _partials_pd(K, mode: str):
    # diag (r, r): (K+1-r) + w + [trace term] * L_rr ; offdiag (r, c):
    # [trace term], where trace term = -(C L)_rc (dot, C symmetric) or
    # +(At A')_rc (solve, At = L^-T A) — see pd.py::_pd_logdensity_tangent.
    def partials(rr, rp, W, dtype):
        _, E, Einv = _pd_diag_exps(rr, K, W, dtype)
        L = {}
        inv_diag = [None] * K
        for r in range(K):
            base = r * (r + 1) // 2
            inv_diag[r] = Einv[r]
            for c in range(r):
                L[(r, c)] = rr(base + c)
            L[(r, r)] = E[r]
        w = rp(K * K)
        out = [None] * (K * (K + 1) // 2)
        if mode == "dot":
            for r in range(K):
                base = r * (r + 1) // 2
                for c in range(r + 1):
                    cl = None  # (C L)_{r, c} = sum_{a >= c} C[r, a] L[a, c]
                    for a in range(c, K):
                        term = rp(r * K + a) * L[(a, c)]
                        cl = term if cl is None else cl + term
                    if c == r:
                        out[base + c] = (K + 1.0 - r) + w - cl * L[(r, r)]
                    else:
                        out[base + c] = -cl
        else:
            A = {}
            for i in range(K):
                for j in range(K):
                    acc = rp(i * K + j)
                    for k in range(i):
                        acc = acc - L[(i, k)] * A[(k, j)]
                    A[(i, j)] = acc * inv_diag[i]
            At = {}
            for i in range(K - 1, -1, -1):
                for j in range(K):
                    acc = A[(i, j)]
                    for k in range(i + 1, K):
                        acc = acc - L[(k, i)] * At[(k, j)]
                    At[(i, j)] = acc * inv_diag[i]
            for r in range(K):
                base = r * (r + 1) // 2
                for c in range(r + 1):
                    ata = None  # (At A')_{r, c} = sum_j At[r, j] A[c, j]
                    for j in range(K):
                        term = At[(r, j)] * A[(c, j)]
                        ata = term if ata is None else ata + term
                    if c == r:
                        out[base + c] = (K + 1.0 - r) + w + ata * L[(r, r)]
                    else:
                        out[base + c] = ata
        return out

    return partials


def _emit_gauss_quad(K, tri):
    """Gaussian quadratic-form leaf: lp = -0.5 ||C (v - mu)||^2 + const,
    with C lower-triangular (MvNormalTril: C = L^-1) or upper-triangular
    (MvNormalCanon: C = chol(J)^T). `tri` is static — statically-zero
    C entries are never read. params: C (K*K row-major), mu (K), const."""

    def cols_of(i):
        if tri == "lower":
            return range(i + 1)
        if tri == "upper":
            return range(i, K)
        return range(K)

    def emit(rr, rp, W, dtype):
        KK = K * K
        r = [rr(i) - rp(KK + i) for i in range(K)]
        tr = jnp.zeros((1, W), dtype)
        for i in range(K):
            w = None
            for j in cols_of(i):
                term = rp(i * K + j) * r[j]
                w = term if w is None else w + term
            tr = tr + w * w
        return -0.5 * tr + rp(KK + K)

    return emit


def _partials_gauss_quad(K, tri):
    # d lp / d v_j = -(C^T C (v - mu))_j = -(C^T w)_j
    def cols_of(i):
        if tri == "lower":
            return range(i + 1)
        if tri == "upper":
            return range(i, K)
        return range(K)

    def partials(rr, rp, W, dtype):
        KK = K * K
        r = [rr(i) - rp(KK + i) for i in range(K)]
        w = [None] * K
        for i in range(K):
            acc = None
            for j in cols_of(i):
                term = rp(i * K + j) * r[j]
                acc = term if acc is None else acc + term
            w[i] = acc
        out = [None] * K
        for j in range(K):
            acc = None
            for i in range(K):
                if j not in cols_of(i):
                    continue
                term = rp(i * K + j) * w[i]
                acc = term if acc is None else acc + term
            out[j] = -acc if acc is not None else jnp.zeros((1, W), dtype)
        return out

    return partials


def _emit_mvt(K):
    """Multivariate Student-t leaf (identity link): with w = C (v - mu),
    q = ||w||^2, lp = const - 0.5 (df + K) log1p(q / df). C = L^-1 lower.
    params: C (K*K row-major, lower), mu (K), df, const."""

    def emit(rr, rp, W, dtype):
        KK = K * K
        r = [rr(i) - rp(KK + i) for i in range(K)]
        q = jnp.zeros((1, W), dtype)
        for i in range(K):
            w = None
            for j in range(i + 1):
                term = rp(i * K + j) * r[j]
                w = term if w is None else w + term
            q = q + w * w
        df = rp(KK + K)
        return rp(KK + K + 1) - 0.5 * (df + K) * jnp.log1p(q / df)

    return emit


def _partials_mvt(K):
    # d lp / d v_j = -((df + K) / (df + q)) * (C^T w)_j
    def partials(rr, rp, W, dtype):
        KK = K * K
        r = [rr(i) - rp(KK + i) for i in range(K)]
        w = [None] * K
        q = jnp.zeros((1, W), dtype)
        for i in range(K):
            acc = None
            for j in range(i + 1):
                term = rp(i * K + j) * r[j]
                acc = term if acc is None else acc + term
            w[i] = acc
            q = q + acc * acc
        df = rp(KK + K)
        s = -(df + K) / (df + q)
        out = [None] * K
        for j in range(K):
            acc = None
            for i in range(j, K):
                term = rp(i * K + j) * w[i]
                acc = term if acc is None else acc + term
            out[j] = s * acc
        return out

    return partials


def _partials_simplex(K, eps):
    # forward pass stores the recurrence state, then a reverse adjoint
    # sweep over the running sum produces d lp / d y_k exactly (same
    # clamp/max tie conventions as jax.jvp of the scanned path).

    def partials(rr, rp, W, dtype):
        inv12 = 1.0 / (1.0 - 2.0 * eps)
        Z = _simplex_sigmoids(rr, K, W, dtype)
        z = [None] * (K - 1)
        s_at = [None] * (K - 1)  # carry BEFORE step k
        x = [None] * (K - 1)
        m = [None] * (K - 1)
        s = jnp.zeros((1, W), dtype)
        for k in range(K - 1):
            z[k] = _zrow(Z, k)
            if k == 0:
                pre = (z[k] - eps) * inv12
            else:
                pre = ((1.0 + eps) - s) * inv12 * z[k] - eps
            s_at[k] = s
            x[k] = jnp.clip(pre, 0.0, 1.0)
            m[k] = _clipmask01(pre, dtype)
            s = s + x[k]
        x_last = jnp.clip(1.0 - s, 0.0, 1.0)
        m_last = _clipmask01(1.0 - s, dtype)

        # direct partials of lp wrt x_k (A) and wrt s_k (B)
        A = [None] * (K - 1)
        B = [None] * (K - 1)
        for k in range(K - 1):
            if k == 0:
                rem = None
                zl = x[0]
                dzl_dx = 1.0
            else:
                rem_raw = 1.0 - s_at[k]
                rem = jnp.maximum(rem_raw, eps)
                zl = x[k] / rem
                dzl_dx = 1.0 / rem
            u1 = _maxmask(zl, eps, dtype) / jnp.maximum(zl, eps)
            u2 = _maxmask(1.0 - zl, eps, dtype) / jnp.maximum(1.0 - zl, eps)
            A[k] = (u1 - u2) * dzl_dx + rp(k) / (x[k] + eps)
            if k >= 1:
                mr = _maxmask(rem_raw, eps, dtype)
                B[k] = -mr * ((u1 - u2) * (-zl / rem) + 1.0 / rem)
        # reverse sweep: sbar = d lp / d s_{k+1} accumulated
        sbar = -m_last * (rp(K - 1) / (x_last + eps))
        out = [None] * (K - 1)
        for k in range(K - 2, -1, -1):
            xbar = A[k] + sbar
            if k == 0:
                dx_dz = m[0] * inv12
            else:
                dx_dz = m[k] * ((1.0 + eps) - s_at[k]) * inv12
            out[k] = xbar * dx_dz * z[k] * (1.0 - z[k])
            if k >= 1:
                sbar = sbar + B[k] + xbar * (m[k] * (-z[k] * inv12))
        return out

    return partials

