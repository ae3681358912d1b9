"""Whole-model fused logdensity kernel: the ENTIRE prior's transform +
log-density as ONE Pallas pass over the transposed (dim, batch) state.

Why: with per-leaf kernels, XLA must materialize each kernel's operand, so
the (dim, B) state is read/copied once per leaf (~3 extra full passes for
the bench model — measured: per-leaf transposed and batch-major layouts time
identically at ~330 us because the slice+pad+relayout fuses into that
unavoidable copy). One kernel reads the state exactly once: the HBM
traffic floor is dim*B*4 bytes in + B*4 out (~100 us at B=131072,
dim=151 on a v5e), with every leaf's recurrence register-resident.

Trace-time compilation: `_plan(u)` walks the unconstrainer tree and maps
each leaf onto either a SLAB entry (per-row coefficients of one shared
closed form — see _COEF_KEYS — evaluated over the full (dim, W) block at
8/8 sublane utilization: ONE softplus, ONE exp, ONE log1p pass covers
every scalar family and the LKJ logcosh slots at once) or a LOOP entry
(cross-row recurrences — simplex stick-breaking, PD Cholesky algebra —
with per-row ref reads; same eps-algebra/numerics as the per-leaf kernels
in kernels/). Distribution parameters (traced jit arguments welcome) ride
in the coefficient matrix / a stacked lane-broadcast operand; host-side
constants (normalizers, log sigmas) are folded outside the kernel.
Unsupported structure -> plan is None -> the composed per-leaf path runs.

Supported leaves (incl. IID blocks of any scalar family): 21 scalar
families — Normal/StudentT/Cauchy/Laplace/Logistic/Gumbel (identity
link), LogNormal/Gamma/Exponential/InverseGamma/HalfNormal/HalfCauchy/
Weibull/Chi/Rayleigh/Frechet (log link, telescoped), Beta/Uniform/
LogitNormal (logit link), Pareto/Levy (shifted-log link) — plus
MvNormalDiag / MvLogNormal (per-row slab rows, telescoped),
MvNormalTril / MvNormalCanon / MvStudentT (triangular-matvec quadratic
forms against a host-precomputed factor inverse), Dirichlet (simplex),
LKJ (vec-corr), LKJCholesky (vec-chol), Wishart / InverseWishart
(PD link). Any OTHER scalar family goes through the generic traced
entry (`_traced_scalar_entry`): auto-whitelisted when jaxpr partial
evaluation proves its v-dependent part Mosaic-safe (truncated bases,
Kumaraswamy/Arcsine/BetaPrime/Triangular/JohnsonSU/..., scalar
mixtures); erf-in-v and unrolled-series densities decline.

Differentiation: custom_jvp — Pallas primal; the tangent is a fused JVP
kernel paired via linear_call with a fused TRANSPOSE kernel (jax.vjp — the
NUTS leapfrog — is one kernel each way), both reusing the slab partial /
loop partials maps.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial as _partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.extend.core import ClosedJaxpr, Jaxpr

LOG2 = math.log(2.0)
LOGPI = math.log(math.pi)
LOG2PI = math.log(2.0 * math.pi)


class _Unsupported(Exception):
    pass


@dataclasses.dataclass(frozen=True)
class _Entry:
    row0: int  # first vT row
    rows: int  # rows consumed
    prow0: int  # first params row (loop entries only; slab entries take 0)
    n_params: int
    emit: object = None  # loop entries: (readrow, readparam, W, dtype) -> (1, W)
    params: object = None  # loop entries: (dtype) -> list of jnp scalars/vectors
    partials: object = None  # loop entries: (...) -> [rows x (1, W)]
    # partials[i] = d lp / d v_{row0+i} — the per-slot gradient map. Because
    # lp is a sum over leaves and each leaf's lp is an explicit function of
    # its own rows, ONE partials map serves both directions: the JVP kernel
    # contracts it with dv, the transpose kernel scales it by the output
    # cotangent (linear_call pairs the two).
    slab: object = None  # slab entries: (dtype) -> {coef key: (rows,) array}
    # Slab entries are evaluated by the SLAB ENGINE: one full-block
    # (dim, W) pass with per-row coefficient columns (see _COEF_KEYS /
    # _slab_value) — every transcendental runs on all 8 sublanes per VREG
    # instead of one (1, W) row at a time. Loop entries (cross-row
    # recurrences: simplex, PD) keep per-row ref reads.


# Per-row coefficient kinds of the slab engine. With D = V - m, U = |D|,
# every kernel-supported scalar family's linked log-density (and the
# LKJ/chol-LKJ per-slot logcosh terms) is exactly
#
#   lp_row = c0 + c1*V + cq*D^2 + where(D>=0, c3p, c3n)*U
#          + c4*softplus(sa*U + sb) + c5*exp(ea*V + eb)
#          + c6*log1p((la*D)^2)
#
# using softplus(x) = max(x, 0) + softplus(-|x|) to fold signed softplus
# args into the U form (so sa <= 0 always: the softplus never overflows),
# and logcosh(y) = |y| + softplus(-2|y|) - log 2. Rows not owned by a slab
# entry carry all-zero coefficients AND a 0 in the trailing OWNERSHIP
# column: their V is where-masked to 0 before any term is formed, so every
# term is exactly 0 even when the raw state value is +/-inf (a bare
# zero-coefficient weighting would give 0*inf = NaN there and break the
# kernel==composed contract for loop-entry rows at infinite states).
_COEF_KEYS = (
    "m", "c0", "c1", "cq", "c3p", "c3n", "c4", "sa", "sb", "c5", "ea", "eb",
    "c6", "la",
)
_CI = {k: i for i, k in enumerate(_COEF_KEYS)}
NK = len(_COEF_KEYS)
_MASK_COL = NK  # trailing slab-ownership column of the (dim, NK+1) cf block
NCF = NK + 1


_ALL_KEYS = frozenset(_COEF_KEYS)


def _slab_mask_v(V, cf):
    """Zero the loop-entry rows of V (ownership column 0) so slab terms on
    those rows are exact 0 regardless of the state value."""
    return jnp.where(cf[:, _MASK_COL][:, None] > 0, V, 0.0)


def _slab_value(V, cf, used=_ALL_KEYS):
    """(dim, W) slab log-density: per-row coefficients broadcast over lanes.

    `used` is the trace-time set of coefficient keys any slab entry assigns
    (see _prep): terms whose weight column is statically all-zero are not
    emitted at all, so e.g. a Normal/LKJ-only model skips the exp and log1p
    passes entirely — the transcendentals are the kernel's bound, not HBM."""
    col = lambda k: cf[:, _CI[k]][:, None]
    V = _slab_mask_v(V, cf)
    D = (V - col("m")) if "m" in used else V
    U = jnp.abs(D)
    acc = col("c0")
    if "c1" in used:
        acc = acc + col("c1") * V
    if "cq" in used:
        acc = acc + col("cq") * (D * D)
    if "c3p" in used or "c3n" in used:
        sel3 = jnp.where(D >= 0, col("c3p"), col("c3n"))
        acc = acc + sel3 * U
    if "c4" in used:
        sp_arg = col("sa") * U
        if "sb" in used:
            sp_arg = sp_arg + col("sb")
        acc = acc + col("c4") * jax.nn.softplus(sp_arg)
    if "c5" in used:
        e_arg = col("ea") * V
        if "eb" in used:
            e_arg = e_arg + col("eb")
        acc = acc + col("c5") * jnp.exp(e_arg)
    if "c6" in used:
        t = col("la") * D
        acc = acc + col("c6") * jnp.log1p(t * t)
    return jnp.broadcast_to(acc, V.shape)


def _slab_partial(V, cf, used=_ALL_KEYS):
    """(dim, W) d lp / d V of the slab form. Matches the composed path's
    tie conventions where they are defined by jnp.abs (sign(0) = 0); the
    signed-softplus decomposition makes the partial 0 at the measure-zero
    point D == 0 for Beta/Pareto/HalfCauchy (the composed path's smooth
    sigmoid form is nonzero there) — irrelevant off that exact point.

    Honors the same statically-used key set as _slab_value: unused
    sigmoid/exp passes are never emitted."""
    col = lambda k: cf[:, _CI[k]][:, None]
    V = _slab_mask_v(V, cf)
    D = (V - col("m")) if "m" in used else V
    U = jnp.abs(D)
    sgn = jnp.sign(D)
    g = jnp.zeros((cf.shape[0], 1), V.dtype)
    if "c1" in used:
        g = g + col("c1")
    if "cq" in used:
        g = g + 2.0 * col("cq") * D
    if "c3p" in used or "c3n" in used:
        sel3 = jnp.where(D >= 0, col("c3p"), col("c3n"))
        g = g + sel3 * sgn
    if "c4" in used:
        sp_arg = col("sa") * U
        if "sb" in used:
            sp_arg = sp_arg + col("sb")
        g = g + col("c4") * col("sa") * sgn * jax.nn.sigmoid(sp_arg)
    if "c5" in used:
        e_arg = col("ea") * V
        if "eb" in used:
            e_arg = e_arg + col("eb")
        g = g + col("c5") * col("ea") * jnp.exp(e_arg)
    if "c6" in used:
        la = col("la")
        t = la * D
        g = g + col("c6") * (2.0 * la * la * D) / (1.0 + t * t)
    return jnp.broadcast_to(g, V.shape)


# ---------------------------------------------------------------------------
# emitters (bodies mirror the per-leaf kernels; numerics are load-bearing)
# ---------------------------------------------------------------------------


def _emit_simplex(K, eps):
    # stick-breaking inverse + ld + eps-nudged weighted log term
    # (kernels/simplex.py::_simplex_fused_pallas, want_x=False)
    log_coeffs = [math.log(K - 1 - k) for k in range(K - 1)]

    def emit(rr, rp, W, dtype):
        # params: am1[0..K-1], const
        s = jnp.zeros((1, W), dtype)
        lp = jnp.zeros((1, W), dtype)
        wl = jnp.zeros((1, W), dtype)
        for k in range(K - 1):
            z = jax.nn.sigmoid(rr(k) - log_coeffs[k])
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
            wl = wl + rp(k) * jnp.log(xk + eps)
            s = s + xk
        x_last = jnp.clip(1.0 - s, 0.0, 1.0)
        wl = wl + rp(K - 1) * jnp.log(x_last + eps)
        return lp + wl + rp(K)  # ld_inv + wlog + const

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


def _emit_pd(K, mode: str):
    # kernels/pd.py::pd_logdensity_pallas body; density assembled as
    # logJ + w_sumd * sum(y_diag) - 0.5 * trace + const.
    def emit(rr, rp, W, dtype):
        # params: C[0..K*K-1] (row-major), w_sumd, const
        zero = jnp.zeros((1, W), dtype)
        logJ = zero
        sumd = zero
        L = {}
        inv_diag = [None] * K
        for r in range(K):
            base = r * (r + 1) // 2
            yd = rr(base + r)
            logJ = logJ + (K + 1.0 - r) * yd
            sumd = sumd + yd
            inv_diag[r] = jnp.exp(-yd)
            for c in range(r):
                L[(r, c)] = rr(base + c)
            L[(r, r)] = jnp.exp(yd)
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
        L = {}
        inv_diag = [None] * K
        for r in range(K):
            base = r * (r + 1) // 2
            yd = rr(base + r)
            inv_diag[r] = jnp.exp(-yd)
            for c in range(r):
                L[(r, c)] = rr(base + c)
            L[(r, r)] = jnp.exp(yd)
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
    log_coeffs = [math.log(K - 1 - k) for k in range(K - 1)]

    def partials(rr, rp, W, dtype):
        inv12 = 1.0 / (1.0 - 2.0 * eps)
        z = [None] * (K - 1)
        s_at = [None] * (K - 1)  # carry BEFORE step k
        x = [None] * (K - 1)
        m = [None] * (K - 1)
        s = jnp.zeros((1, W), dtype)
        for k in range(K - 1):
            z[k] = jax.nn.sigmoid(rr(k) - log_coeffs[k])
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


# ---------------------------------------------------------------------------
# plan building
# ---------------------------------------------------------------------------


# Mosaic-safe elementwise/structural primitives: the v-dependent part of a
# traced scalar entry may only contain these (anything param-only — gammaln
# normalizers, cdf bounds of a truncation, bessel constants — is hoisted
# into the params operand by partial evaluation, so it never hits this
# check). Reductions over a small trailing axis (mixtures) are allowed.
_SAFE_PRIMS = frozenset({
    "add", "add_any", "sub", "mul", "div", "rem", "neg", "abs", "sign",
    "max", "min",
    "exp", "exp2", "log", "log1p", "expm1", "logistic", "tanh", "sqrt",
    "rsqrt", "cbrt", "square", "pow", "integer_pow", "floor", "ceil",
    "round", "sin", "cos", "tan", "atan", "atan2", "asin", "acos",
    "sinh", "cosh", "asinh", "acosh", "atanh", "log2", "exp2",
    "gt", "lt", "ge", "le", "eq", "ne", "and", "or", "not", "xor",
    "select_n", "clamp", "is_finite", "nextafter", "sign", "copy",
    "convert_element_type", "broadcast_in_dim", "reshape", "squeeze",
    "concatenate", "split", "slice", "stop_gradient", "transpose",
    "reduce_sum", "reduce_max", "reduce_min", "reduce_and", "reduce_or",
    "cumsum", "rev", "iota", "pad",
})
_STRUCTURAL_PRIMS = frozenset({
    "jit", "pjit", "custom_jvp_call", "custom_vjp_call",
    "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr", "closed_call",
    "core_call", "remat", "checkpoint",
})


def _scan_safe(closed_jaxpr, budget=128):
    """Raise _Unsupported unless every primitive in the jaxpr (recursing
    through structural wrappers) is Mosaic-safe and the total op count is
    within budget (keeps kernel compile time and VMEM pressure bounded)."""
    seen = 0

    def subjaxprs(eqn):
        out = []
        for v in eqn.params.values():
            if isinstance(v, (Jaxpr, ClosedJaxpr)):
                out.append(v)
            elif isinstance(v, (list, tuple)):
                out.extend(x for x in v if isinstance(x, (Jaxpr, ClosedJaxpr)))
        return out

    def walk(j):
        nonlocal seen
        for eqn in j.eqns:
            name = eqn.primitive.name
            subs = subjaxprs(eqn)
            if name in _STRUCTURAL_PRIMS and subs:
                for s in subs:
                    walk(s.jaxpr if isinstance(s, ClosedJaxpr) else s)
                continue
            if name not in _SAFE_PRIMS:
                raise _Unsupported
            seen += 1
            if seen > budget:
                raise _Unsupported

    walk(closed_jaxpr.jaxpr)


def _pe_split_admit(leaves0, treedef, lp_fn, ex_shape, out_shape, deriv):
    """Shared partial-eval admission for the generic traced entries.

    Traces `lp_fn(v, tree_unflatten(treedef, leaves))` with v (shape
    `ex_shape`) marked UNKNOWN: everything that depends only on the
    distribution/link parameters — a truncation's cdf(bounds) normalizer,
    gammaln/betaln normalizers, i0e constants — is hoisted into the params
    operand as residuals (traced jit args welcome; concrete params too —
    omnistaging stages both, the split is on dataflow, not concreteness);
    only the v-dependent residual jaxpr goes into the kernel body, and the
    entry is admitted only if `_scan_safe` proves both its value jaxpr and
    its derivative jaxpr (`deriv`: "jvp" for elementwise scalar bodies,
    "grad" — incl. the transpose — for whole-event vector bodies)
    elementwise Mosaic-safe.

    The traced output must have exactly `out_shape` ((): scalar body;
    (1,): a one-row batch whose length-1 axis is scalarized) — anything
    else (e.g. a batched-parameter leaf broadcasting v into a per-group
    density vector) declines loudly here instead of silently truncating.

    Returns (cell, specs, n_params, params, consts_of): `params(dtype)`
    runs in _prep (outer trace: the known jaxpr may compute erf/gammaln
    there freely), computes the residuals, and stashes the unknown-jaxpr
    evaluator in `cell` for emit/partials (kernel trace) — which must NOT
    re-trace, since the dist fields may be outer tracers. Residuals ride
    FLATTENED as lane-broadcast rows; the stashed fn reshapes each
    per-element const back to its aval shape."""
    from jax._src.interpreters import partial_eval as pe
    from jax.core import eval_jaxpr

    def split(dtype):
        def cast(l):
            a = jnp.asarray(l)
            return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

        ls = [cast(l) for l in leaves0]

        def fn(v, *lv):
            return lp_fn(v, jax.tree_util.tree_unflatten(treedef, lv))

        cj = jax.make_jaxpr(fn)(jnp.zeros(ex_shape, dtype), *ls)
        if tuple(cj.out_avals[0].shape) != out_shape:
            raise _Unsupported
        known, unknown, out_unk, res_avals = pe.partial_eval_jaxpr_nounits(
            cj, [True] + [False] * len(ls), False
        )
        if out_unk != [True]:
            raise _Unsupported
        return ls, known, unknown, res_avals

    try:
        _, _, unk0, res_avals0 = split(jnp.float32)
        if any(
            a.size > 16 or not jnp.issubdtype(a.dtype, jnp.floating)
            for a in res_avals0
        ):
            raise _Unsupported
        specs = [(int(a.size), tuple(a.shape)) for a in res_avals0]
        _scan_safe(unk0)

        def kfn0(v, *res):
            return eval_jaxpr(unk0.jaxpr, unk0.consts, *res, v)[0].reshape(())

        res_ex = [jnp.zeros(a.shape, a.dtype) for a in res_avals0]
        ex = jnp.zeros(ex_shape, jnp.float32)
        if deriv == "jvp":
            dj = jax.make_jaxpr(
                lambda v, *r: jax.jvp(
                    lambda vv: kfn0(vv, *r), (v,), (jnp.ones_like(v),)
                )[1]
            )(ex, *res_ex)
        else:
            dj = jax.make_jaxpr(
                lambda v, *r: jax.grad(lambda vv: kfn0(vv, *r))(v)
            )(ex, *res_ex)
        _scan_safe(dj)
    except _Unsupported:
        raise
    except Exception:
        raise _Unsupported
    n_params = sum(s for s, _ in specs)

    cell = {}

    def params(dtype):
        ls, known, unknown, res_avals = split(dtype)
        assert [(int(a.size), tuple(a.shape)) for a in res_avals] == specs
        res = eval_jaxpr(known.jaxpr, known.consts, *ls)
        shapes = [tuple(a.shape) for a in res_avals]

        def fn(v, *r):
            rs = [
                ri if s == () else ri.reshape(s) for ri, s in zip(r, shapes)
            ]
            return eval_jaxpr(unknown.jaxpr, unknown.consts, *rs, v)[0].reshape(())

        cell["fn"] = fn
        return [jnp.asarray(r, dtype) for r in res]

    def consts_of(rp, W):
        cs, j = [], 0
        for sz, shp in specs:
            if shp == ():
                cs.append(rp(j).reshape(W))
                j += 1
            else:
                rows = [rp(j + t).reshape(W) for t in range(sz)]
                cs.append(jnp.stack(rows, axis=-1))  # (W, sz)
                j += sz
        return cs

    return cell, specs, n_params, params, consts_of


def _traced_scalar_entry(d, link, n, row0, prow0):
    """Generic traced per-row loop entry for ANY scalar (dist, link) leaf
    whose linked density has a Mosaic-safe v-dependent part (see
    `_pe_split_admit`). Auto-whitelists e.g. truncated(ANY elementary base)
    (reference: truncation just renormalizes, Distributions.truncated),
    Triangular/Arcsine/Kumaraswamy/BetaPrime-style families and scalar
    mixtures; auto-declines erf-in-v families (SkewNormal) and
    unrolled-series densities (noncentral) via the op budget. All n rows
    of an IID block run as ONE traced-body pass (rows stacked, consts
    tiled, one jvp for all partials)."""
    leaves0, treedef = jax.tree_util.tree_flatten((d, link))

    def lp1(v, dl):
        d2, l2 = dl
        hook = getattr(d2, "fused_linked_logdensity", None)
        if hook is not None:
            out = hook(l2, v, want_x=False)
            if out is not None:
                return out[1]
        x, ld = l2.inverse_and_log_det(v)
        return d2.logpdf(x) + ld

    cell, specs, n_params, params, consts_of = _pe_split_admit(
        leaves0, treedef, lp1, (), (), "jvp"
    )

    def _consts_flat(rp, W):
        # consts tiled to the flattened (n * W) element axis: the traced
        # body runs ONCE over all n rows of the block (full sublane
        # utilization), not once per row.
        return [
            jnp.tile(c, n) if c.ndim == 1 else jnp.tile(c, (n, 1))
            for c in consts_of(rp, W)
        ]

    def _vflat(rr, W):
        if n == 1:
            return rr(0).reshape(W)
        return jnp.concatenate([rr(i) for i in range(n)], axis=0).reshape(n * W)

    def emit(rr, rp, W, dtype):
        fn = cell["fn"]
        out = jax.vmap(fn)(_vflat(rr, W), *_consts_flat(rp, W))
        return jnp.sum(out.reshape(n, W), axis=0).reshape(1, W)

    def partials(rr, rp, W, dtype):
        fn = cell["fn"]
        cs = _consts_flat(rp, W)
        v = _vflat(rr, W)
        _, dv = jax.jvp(
            lambda vv: jax.vmap(fn)(vv, *cs), (v,), (jnp.ones_like(v),)
        )
        dv = dv.reshape(n, W)
        return [dv[i].reshape(1, W) for i in range(n)]

    return _Entry(row0, n, prow0, n_params, emit, params, partials)


def _traced_vector_entry(leaf, row0, prow0):
    """Generic traced entry for small VECTOR leaves (linked length L <= 16)
    with no hand-written kernel form — e.g. JointOrderStatistics (ordered
    link: cumsum/rev recurrences). Same partial-eval + primitive-scan
    admission as `_traced_scalar_entry` (see `_pe_split_admit`; the traced
    body is evaluated on a one-row batch and must return exactly ONE
    density, so batched-parameter leaves decline rather than silently
    evaluating group 0 only). The traced function maps the whole (L,)
    linked event to its scalar linked density; partials come from ONE
    reverse pass (`jax.grad`), whose transpose jaxpr is scanned for safety
    too. In-kernel the L rows are stacked to (W, L) and the body vmapped
    over lanes."""
    L = int(leaf.linked_vec_length)
    if L < 2 or L > 16:
        raise _Unsupported
    leaves0, treedef = jax.tree_util.tree_flatten(leaf)

    def lp1(v, leaf2):
        return leaf2.linked_logdensity(v[None, :])

    cell, specs, n_params, params, consts_of = _pe_split_admit(
        leaves0, treedef, lp1, (L,), (1,), "grad"
    )

    def _vstack(rr, W):
        # (W, L): lanes major, the traced event on the minor axis
        return jnp.stack([rr(i).reshape(W) for i in range(L)], axis=-1)

    def emit(rr, rp, W, dtype):
        fn = cell["fn"]
        out = jax.vmap(fn)(_vstack(rr, W), *consts_of(rp, W))
        return out.reshape(1, W)

    def partials(rr, rp, W, dtype):
        fn = cell["fn"]
        cs = consts_of(rp, W)
        G = jax.vmap(lambda v, *c: jax.grad(lambda vv: fn(vv, *c))(v))(
            _vstack(rr, W), *cs
        )  # (W, L)
        return [G[:, i].reshape(1, W) for i in range(L)]

    return _Entry(row0, L, prow0, n_params, emit, params, partials)


def _scalar_entry(dist, link, n, row0, prow0):
    """Slab-coefficient wiring for every kernel-supported scalar family
    (the closed form is documented at _COEF_KEYS). The coefficients encode
    EXACTLY the composed path's math (the family's `fused_linked_logdensity`
    hook, or plain logpdf for identity links) up to float reassociation —
    load-bearing for the kernel == composed equivalence tests."""
    from ..bijectors.base import Identity
    from ..dists import univariate as uv

    d = dist
    t = type(d)
    if t is uv.Truncated:
        return _traced_scalar_entry(d, link, n, row0, prow0)

    def guard(pred, *param_vals):
        # scalar params, or per-element (n,) params (arraydist IID blocks:
        # the slab's per-row coefficient columns absorb them directly)
        if not pred or any(
            jnp.shape(p) not in ((), (n,)) for p in param_vals
        ):
            raise _Unsupported

    def mk(fn):
        def slab(dtype):
            return {
                k: jnp.broadcast_to(jnp.asarray(v, dtype), (n,))
                for k, v in fn(dtype).items()
            }

        return _Entry(row0, n, prow0, 0, slab=slab)

    ident = type(link) is Identity

    # --- real line (identity link: linked density = logpdf) ---
    if t is uv.Normal:
        guard(ident, d.loc, d.scale)

        def cf(dtype, loc=d.loc, scale=d.scale):
            sig = jnp.asarray(scale, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(loc, dtype), "cq": -0.5 * inv_s * inv_s,
                    "c0": -0.5 * LOG2PI - jnp.log(sig)}

        return mk(cf)
    if t is uv.StudentT:
        guard(ident, d.df, d.loc, d.scale)

        def cf(dtype):
            from jax.scipy import special as jsp

            v = jnp.asarray(d.df, dtype)
            sig = jnp.asarray(d.scale, dtype)
            inv_s = 1.0 / sig
            lognorm = (
                jsp.gammaln(0.5 * (v + 1.0))
                - jsp.gammaln(0.5 * v)
                - 0.5 * (jnp.log(v) + LOGPI)
            )
            return {"m": jnp.asarray(d.loc, dtype), "c6": -0.5 * (v + 1.0),
                    "la": inv_s / jnp.sqrt(v), "c0": lognorm - jnp.log(sig)}

        return mk(cf)
    if t is uv.Cauchy:
        guard(ident, d.loc, d.scale)

        def cf(dtype):
            sig = jnp.asarray(d.scale, dtype)
            return {"m": jnp.asarray(d.loc, dtype), "c6": -1.0,
                    "la": 1.0 / sig, "c0": -LOGPI - jnp.log(sig)}

        return mk(cf)
    if t is uv.Laplace:
        guard(ident, d.loc, d.scale)

        def cf(dtype):
            sig = jnp.asarray(d.scale, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(d.loc, dtype), "c3p": -inv_s,
                    "c3n": -inv_s, "c0": -LOG2 - jnp.log(sig)}

        return mk(cf)
    if t is uv.Logistic:
        guard(ident, d.loc, d.scale)

        def cf(dtype):
            # -z - 2 sp(-z) == -(|z| + 2 sp(-|z|)) via sp(x) = max(x,0)+sp(-|x|)
            sig = jnp.asarray(d.scale, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(d.loc, dtype), "c3p": -inv_s,
                    "c3n": -inv_s, "c4": -2.0, "sa": -inv_s,
                    "c0": -jnp.log(sig)}

        return mk(cf)
    if t is uv.Gumbel:
        guard(ident, d.loc, d.scale)

        def cf(dtype):
            sig = jnp.asarray(d.scale, dtype)
            inv_s = 1.0 / sig
            mi = jnp.asarray(d.loc, dtype) * inv_s
            return {"c1": -inv_s, "c5": -1.0, "ea": -inv_s, "eb": mi,
                    "c0": mi - jnp.log(sig)}

        return mk(cf)

    # --- positive half-line (log link, telescoped hooks) ---
    if t is uv.LogNormal:
        guard(uv._is_log_link(link), d.mu, d.sigma)

        def cf(dtype):
            sig = jnp.asarray(d.sigma, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(d.mu, dtype), "cq": -0.5 * inv_s * inv_s,
                    "c0": -0.5 * LOG2PI - jnp.log(sig)}

        return mk(cf)
    if t is uv.Gamma:
        guard(uv._is_log_link(link), d.concentration, d.rate)

        def cf(dtype):
            from jax.scipy import special as jsp

            a = jnp.asarray(d.concentration, dtype)
            r = jnp.asarray(d.rate, dtype)
            return {"c1": a, "c5": -r, "ea": 1.0,
                    "c0": a * jnp.log(r) - jsp.gammaln(a)}

        return mk(cf)
    if t is uv.Exponential:
        guard(uv._is_log_link(link), d.rate)

        def cf(dtype):
            r = jnp.asarray(d.rate, dtype)
            return {"c1": 1.0, "c5": -r, "ea": 1.0, "c0": jnp.log(r)}

        return mk(cf)
    if t is uv.InverseGamma:
        guard(uv._is_log_link(link), d.concentration, d.scale)

        def cf(dtype):
            from jax.scipy import special as jsp

            a = jnp.asarray(d.concentration, dtype)
            b = jnp.asarray(d.scale, dtype)
            return {"c1": -a, "c5": -b, "ea": -1.0,
                    "c0": a * jnp.log(b) - jsp.gammaln(a)}

        return mk(cf)
    if t is uv.HalfNormal:
        guard(uv._is_log_link(link), d.scale)

        def cf(dtype):
            ls = jnp.log(jnp.asarray(d.scale, dtype))
            return {"c1": 1.0, "c5": -0.5, "ea": 2.0, "eb": -2.0 * ls,
                    "c0": (LOG2 - 0.5 * LOG2PI) - ls}

        return mk(cf)
    if t is uv.HalfCauchy:
        guard(uv._is_log_link(link), d.scale)

        def cf(dtype):
            # const + v - sp(2(v-ls)) with sp folded into the U form
            ls = jnp.log(jnp.asarray(d.scale, dtype))
            return {"m": ls, "c1": 1.0, "c3p": -2.0, "c4": -1.0, "sa": -2.0,
                    "c0": (LOG2 - LOGPI) - ls}

        return mk(cf)
    if t is uv.Weibull:
        guard(uv._is_log_link(link), d.concentration, d.scale)

        def cf(dtype):
            k = jnp.asarray(d.concentration, dtype)
            c1_ = k * jnp.log(jnp.asarray(d.scale, dtype))
            return {"c1": k, "c5": -1.0, "ea": k, "eb": -c1_,
                    "c0": jnp.log(k) - c1_}

        return mk(cf)
    if t is uv.Chi:
        guard(uv._is_log_link(link), d.df)

        def cf(dtype):
            from jax.scipy import special as jsp

            df = jnp.asarray(d.df, dtype)
            k2 = 0.5 * df
            return {"c1": df, "c5": -0.5, "ea": 2.0,
                    "c0": -(k2 - 1.0) * LOG2 - jsp.gammaln(k2)}

        return mk(cf)
    if t is uv.Rayleigh:
        guard(uv._is_log_link(link), d.scale)

        def cf(dtype):
            ls = jnp.log(jnp.asarray(d.scale, dtype))
            return {"c1": 2.0, "c5": -0.5, "ea": 2.0, "eb": -2.0 * ls,
                    "c0": -2.0 * ls}

        return mk(cf)
    if t is uv.Frechet:
        guard(uv._is_log_link(link), d.shape_, d.scale)

        def cf(dtype):
            a = jnp.asarray(d.shape_, dtype)
            als = a * jnp.log(jnp.asarray(d.scale, dtype))
            return {"c1": -a, "c5": -1.0, "ea": -a, "eb": als,
                    "c0": jnp.log(a) + als}

        return mk(cf)

    # --- unit interval / bounded (logit link, telescoped hooks) ---
    if t is uv.Beta:
        guard(uv._is_interval_logit_link(link, 0.0, 1.0), d.a, d.b)

        def cf(dtype):
            # -a sp(-v) - b sp(v) == -(b 1[v>0] + a 1[v<0])|v| - (a+b) sp(-|v|)
            from jax.scipy import special as jsp

            a = jnp.asarray(d.a, dtype)
            b = jnp.asarray(d.b, dtype)
            return {"c3p": -b, "c3n": -a, "c4": -(a + b), "sa": -1.0,
                    "c0": -(jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))}

        return mk(cf)
    if t is uv.LogitNormal:
        guard(uv._is_interval_logit_link(link, 0.0, 1.0), d.mu, d.sigma)

        def cf(dtype):
            sig = jnp.asarray(d.sigma, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(d.mu, dtype), "cq": -0.5 * inv_s * inv_s,
                    "c0": -0.5 * LOG2PI - jnp.log(sig)}

        return mk(cf)
    if t is uv.Uniform:
        guard(uv._is_interval_logit_link(link, d.low, d.high), d.low, d.high)

        def cf(dtype):
            # -|v| - 2 sp(-|v|): parameter-free
            return {"c3p": -1.0, "c3n": -1.0, "c4": -2.0, "sa": -1.0}

        return mk(cf)

    # --- lower-bounded (shifted-log link, telescoped hooks) ---
    if t is uv.Pareto:
        guard(uv._is_shifted_log_link(link, d.scale), d.alpha, d.scale)

        def cf(dtype):
            # log a - lm + v - (a+1) sp(v - lm), sp folded into the U form
            a = jnp.asarray(d.alpha, dtype)
            lm = jnp.log(jnp.asarray(d.scale, dtype))
            return {"m": lm, "c1": 1.0, "c3p": -(a + 1.0), "c4": -(a + 1.0),
                    "sa": -1.0, "c0": jnp.log(a) - lm}

        return mk(cf)
    if t is uv.Levy:
        guard(uv._is_shifted_log_link(link, d.mu), d.mu, d.sigma)

        def cf(dtype):
            s = jnp.asarray(d.sigma, dtype)
            return {"c1": -0.5, "c5": -0.5 * s, "ea": -1.0,
                    "c0": 0.5 * (jnp.log(s) - LOG2PI)}

        return mk(cf)
    # no slab form: generic traced entry (auto-whitelisted by _scan_safe)
    return _traced_scalar_entry(d, link, n, row0, prow0)


def _leaf_entry(leaf, row0, prow0, eps):
    from .. import kernels
    from ..bijectors.base import Block, Identity
    from ..bijectors.corr import VecCholeskyBijector, VecCorrBijector
    from ..bijectors.pd import PDVecBijector
    from ..bijectors.simplex import SimplexBijector
    from ..dists import matrix as mx
    from ..dists import multivariate as mv
    from ..dists import univariate as uv
    from ..dists.multivariate import Dirichlet

    d, b = leaf.dist, leaf.link
    if leaf.event_shape == () and leaf.linked_shape == ():
        return _scalar_entry(d, b, 1, row0, prow0)
    t = type(d)
    # real-vector / positive-orthant families: unwrap the elementwise Block
    eb = b.bijector if (type(b) is Block and b.ndims == 1) else None
    eb_ident = type(eb) is Identity
    if t in (mv.MvNormalDiag, mv.MvLogNormal):
        # Per-row-independent Gaussians -> slab rows. MvLogNormal's linked
        # density telescopes exactly to the underlying normal's logpdf on v
        # (logpdf(e^v) + sum v: the -sum log x Jacobian of the base and the
        # +sum v link log-det cancel; reference src/vector/multivariate/
        # mvlognormal.jl / transformed_distribution.jl:93-101).
        ok_link = eb_ident if t is mv.MvNormalDiag else (
            eb is not None and uv._is_log_link(eb)
        )
        if not ok_link or jnp.ndim(d.loc) != 1 or jnp.ndim(d.scale_diag) > 1:
            raise _Unsupported
        K = int(jnp.shape(d.loc)[-1])

        def slab(dtype, d=d, K=K):
            mu = jnp.asarray(d.loc, dtype)
            sig = jnp.broadcast_to(jnp.asarray(d.scale_diag, dtype), (K,))
            inv_s = 1.0 / sig
            return {"m": mu, "cq": -0.5 * inv_s * inv_s,
                    "c0": -0.5 * LOG2PI - jnp.log(sig)}

        return _Entry(row0, K, prow0, 0, slab=slab)
    if t is mv.MvNormalTril and eb_ident:
        # lp = -0.5 ||L^-1 (v - mu)||^2 - sum log diag L - K/2 log 2pi
        # (multivariate.py::MvNormalTril.logpdf); C = L^-1 is host-side.
        if jnp.ndim(d.loc) != 1 or jnp.ndim(d.scale_tril) != 2:
            raise _Unsupported
        K = int(jnp.shape(d.loc)[-1])
        if K > kernels.MAX_K["mvn"]:
            raise _Unsupported

        def params(dtype, d=d, K=K):
            L = jnp.tril(jnp.asarray(d.scale_tril, dtype))
            C = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(K, dtype=dtype), lower=True
            )
            const = -0.5 * K * LOG2PI - jnp.sum(
                jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1
            )
            return [jnp.ravel(C), jnp.asarray(d.loc, dtype), const]

        return _Entry(
            row0, K, prow0, K * K + K + 1, _emit_gauss_quad(K, "lower"),
            params, _partials_gauss_quad(K, "lower"),
        )
    if t is mv.MvNormalCanon and eb_ident:
        # J = L L^T, lp = -0.5 ||L^T (v - mu)||^2 + sum log diag L - K/2
        # log 2pi with mu = J^-1 h (multivariate.py::MvNormalCanon.logpdf).
        if jnp.ndim(d.h) != 1 or jnp.ndim(d.prec) != 2:
            raise _Unsupported
        K = int(jnp.shape(d.h)[-1])
        if K > kernels.MAX_K["mvn"]:
            raise _Unsupported

        def params(dtype, d=d, K=K):
            from ..utils import cholesky_lower

            L = cholesky_lower(jnp.asarray(d.prec, dtype))
            mu = jax.scipy.linalg.cho_solve((L, True), jnp.asarray(d.h, dtype))
            const = -0.5 * K * LOG2PI + jnp.sum(
                jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1
            )
            return [jnp.ravel(L.T), mu, const]

        return _Entry(
            row0, K, prow0, K * K + K + 1, _emit_gauss_quad(K, "upper"),
            params, _partials_gauss_quad(K, "upper"),
        )
    if t is mv.MvStudentT and eb_ident:
        # lp = const - 0.5 (df + K) log1p(q / df), q = ||L^-1 (v - mu)||^2
        # (multivariate.py::MvStudentT.logpdf).
        if (
            jnp.ndim(d.loc) != 1
            or jnp.ndim(d.scale_tril) != 2
            or jnp.ndim(d.df) != 0
        ):
            raise _Unsupported
        K = int(jnp.shape(d.loc)[-1])
        if K > kernels.MAX_K["mvn"]:
            raise _Unsupported

        def params(dtype, d=d, K=K):
            from jax.scipy import special as jsp

            L = jnp.tril(jnp.asarray(d.scale_tril, dtype))
            C = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(K, dtype=dtype), lower=True
            )
            v = jnp.asarray(d.df, dtype)
            const = (
                jsp.gammaln(0.5 * (v + K))
                - jsp.gammaln(0.5 * v)
                - 0.5 * K * (jnp.log(v) + LOGPI)
                - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
            )
            return [jnp.ravel(C), jnp.asarray(d.loc, dtype), v, const]

        return _Entry(
            row0, K, prow0, K * K + K + 2, _emit_mvt(K),
            params, _partials_mvt(K),
        )
    if t is Dirichlet and type(b) is SimplexBijector:
        K = int(jnp.shape(d.alpha)[-1])
        if jnp.ndim(d.alpha) != 1 or K > kernels.MAX_K["simplex"]:
            raise _Unsupported

        def params(dtype):
            from jax.scipy import special as jsp

            a = jnp.asarray(d.alpha, dtype)
            lognorm = jnp.sum(jsp.gammaln(a)) - jsp.gammaln(jnp.sum(a))
            return [a - 1.0, -lognorm]

        return _Entry(row0, K - 1, prow0, K + 1, _emit_simplex(K, eps), params, _partials_simplex(K, eps))
    if (t is mx.LKJ and type(b) is VecCorrBijector) or (
        t is mx.LKJCholesky and type(b) is VecCholeskyBijector
    ):
        # For the logdensity-only path the whole LKJ contribution telescopes
        # to ONE weighted logcosh reduction over the packed slab -- no column
        # recurrence at all: logJ = -sum_s cJ_s lc_s with cJ_s = K - i_s
        # (vec, corr.jl:474-483) or j - i + 1 (chol, corr.jl:485-501), and
        # every column's final running sum is -sum_{s in col} lc_s, so the
        # density term is another weighted sum. Slab form: logcosh(y) =
        # |y| + sp(-2|y|) - log 2 maps onto (c3, c4/sa, c0); d lp/d y_s =
        # -w_s tanh(y_s) falls out of the same coefficients (the slab
        # partial's sign(y)(1 - 2 sigmoid(-2|y|)) IS tanh).
        chol = t is mx.LKJCholesky
        K = int(d.dim)
        if jnp.ndim(d.eta) or K > kernels.MAX_K["lkj"]:
            raise _Unsupported
        P = K * (K - 1) // 2

        def slab(dtype, chol=chol, K=K, P=P):
            eta = jnp.asarray(d.eta, dtype)
            w = _lkj_weights(K, chol, eta, dtype)
            const = -mx._lkj_log_normalizer(K, eta, dtype)
            e0 = jnp.zeros((P,), dtype).at[0].set(1.0)
            return {"c3p": -w, "c3n": -w, "c4": -w,
                    "sa": jnp.full((P,), -2.0, dtype),
                    "c0": w * LOG2 + const * e0}

        return _Entry(row0, P, prow0, 0, slab=slab)
    if t is mx.Wishart and type(b) is PDVecBijector:
        if jnp.ndim(d.scale) != 2 or jnp.ndim(d.df) != 0:
            raise _Unsupported
        K = int(jnp.shape(d.scale)[-1])
        if K > kernels.MAX_K["pd"]:
            raise _Unsupported

        def params(dtype):
            from ..utils import cholesky_lower

            v = jnp.asarray(d.df, dtype)
            Sc = cholesky_lower(jnp.asarray(d.scale, dtype))
            Sinv = jax.scipy.linalg.cho_solve((Sc, True), jnp.eye(K, dtype=dtype))
            logdetS = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(Sc, axis1=-2, axis2=-1)), -1
            )
            const = (
                -0.5 * v * K * LOG2 - 0.5 * v * logdetS - mx._mv_lgamma(0.5 * v, K)
            )
            return [jnp.ravel(Sinv), v - K - 1.0, const]

        return _Entry(
            row0, K * (K + 1) // 2, prow0, K * K + 2, _emit_pd(K, "dot"),
            params, _partials_pd(K, "dot"),
        )
    if t is mx.InverseWishart and type(b) is PDVecBijector:
        if jnp.ndim(d.psi) != 2 or jnp.ndim(d.df) != 0:
            raise _Unsupported
        K = int(jnp.shape(d.psi)[-1])
        if K > kernels.MAX_K["pd"]:
            raise _Unsupported

        def params(dtype):
            from ..utils import cholesky_lower

            v = jnp.asarray(d.df, dtype)
            Pc = cholesky_lower(jnp.asarray(d.psi, dtype))
            logdetP = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(Pc, axis1=-2, axis2=-1)), -1
            )
            const = (
                0.5 * v * logdetP - 0.5 * v * K * LOG2 - mx._mv_lgamma(0.5 * v, K)
            )
            return [jnp.ravel(Pc), -(v + K + 1.0), const]

        return _Entry(
            row0, K * (K + 1) // 2, prow0, K * K + 2, _emit_pd(K, "solve"),
            params, _partials_pd(K, "solve"),
        )
    # no hand-written form: generic traced VECTOR entry (auto-whitelisted
    # by the same partial-eval + primitive scan as the scalar one)
    return _traced_vector_entry(leaf, row0, prow0)


_PLAN_CACHE: dict = {}  # (id(u), eps) -> (weakref.ref(u), plan-or-None)
_PLAN_CACHE_MAX = 64


def _plan(u, eps):
    """List of _Entry covering every linked row, or None if any leaf is
    unsupported. Static — depends only on tree structure and shapes.

    Memoized per LIVE unconstrainer object: plan entries close over the
    leaf dist params (which may be tracers when model params ride as jit
    args), so the only staleness-safe key is object identity guarded by a
    weakref — the same live `u` always holds the same params, and a dead
    `u` can never be aliased by a recycled id because the weakref check
    fails. This removes the ~5x plan recomputation per transposed-NUTS
    compile (_prep for value/jvp/vjp kernels + the model-level gate)."""
    import weakref

    key = (id(u), float(eps))
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[0]() is u:
        return hit[1]
    plan = _plan_uncached(u, eps)
    if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        # drop dead entries first; if none are dead, drop everything (the
        # cache is a compile-time convenience, never load-bearing)
        dead = [k for k, v in _PLAN_CACHE.items() if v[0]() is None]
        for k in dead:
            del _PLAN_CACHE[k]
        if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.clear()
    try:
        _PLAN_CACHE[key] = (weakref.ref(u), plan)
    except TypeError:
        pass  # non-weakrefable unconstrainer: just skip memoization
    return plan


def _plan_uncached(u, eps):
    from .core import (
        IIDUnconstrainer,
        LeafUnconstrainer,
        TransformedUnconstrainer,
        TreeUnconstrainer,
    )

    entries = []

    def visit(node, row0):
        prow0 = sum(e.n_params for e in entries)
        if isinstance(node, TreeUnconstrainer):
            for c, (s, _) in zip(node.children, node.linked_offsets):
                visit(c, row0 + s)
            return
        if isinstance(node, TransformedUnconstrainer):
            # linked density telescopes to the base's (core.py::
            # TransformedUnconstrainer.linked_logdensity_t) — same rows
            visit(node.base, row0)
            return
        if isinstance(node, IIDUnconstrainer):
            inner = node.inner
            if not isinstance(inner, LeafUnconstrainer):
                raise _Unsupported
            if inner.event_shape == () and inner.linked_shape == ():
                entries.append(
                    _scalar_entry(inner.dist, inner.link, node.n, row0, prow0)
                )
                return
            # IID blocks of STRUCTURED leaves (per-group LKJ/Wishart/
            # Dirichlet/MvNormal...): n independent copies at shifted row
            # offsets. All copies share ONE params block (same dist), so
            # copy i > 0 contributes no params rows and reads the first
            # copy's prow0; slab copies just re-emit their coefficient
            # rows at the shifted offset.
            e0 = _leaf_entry(inner, row0, prow0, eps)
            entries.append(e0)
            per = inner.linked_vec_length
            for i in range(1, node.n):
                entries.append(
                    dataclasses.replace(
                        e0,
                        row0=row0 + i * per,
                        n_params=0,
                        params=(lambda dtype: []) if e0.params is not None else None,
                    )
                )
            return
        if isinstance(node, LeafUnconstrainer):
            entries.append(_leaf_entry(node, row0, prow0, eps))
            return
        raise _Unsupported

    try:
        visit(u, 0)
    except _Unsupported:
        return None
    return entries


# ---------------------------------------------------------------------------
# kernel assembly + dispatch
# ---------------------------------------------------------------------------


def _prep(u, vT):
    """Shared plan/coefficient/params assembly for the three kernels."""
    from ..kernels.layout import block_lanes, pad_to, padded_batch
    from ..utils import _eps

    dim, B = vT.shape
    dtype = jnp.result_type(vT, float)
    eps = _eps(dtype)
    plan = _plan(u, eps)
    if plan is None:
        raise _Unsupported
    assert sum(e.rows for e in plan) == dim
    loop = [e for e in plan if e.slab is None]
    # loop-entry params ride as one stacked lane-broadcast operand (row
    # indices = prow0, which skips slab entries: their n_params is 0)
    parts = [
        jnp.ravel(jnp.asarray(p, dtype)) for e in loop for p in e.params(dtype)
    ]
    if not parts:
        parts = [jnp.zeros((1,), dtype)]  # keep the operand non-empty
    pvec = jnp.concatenate(parts)
    Pn = pvec.shape[0]
    # slab coefficient matrix (dim, NK); loop rows stay all-zero (their
    # slab terms evaluate to exactly 0 — see _COEF_KEYS). `used` is the
    # trace-time union of assigned keys: _slab_value/_slab_partial skip
    # whole transcendental passes whose weight column is statically zero.
    cf = jnp.zeros((dim, NCF), dtype)
    used = set()
    for e in plan:
        if e.slab is None:
            continue
        cf = cf.at[e.row0 : e.row0 + e.rows, _MASK_COL].set(1.0)
        for k, v in e.slab(dtype).items():
            used.add(k)
            cf = cf.at[e.row0 : e.row0 + e.rows, _CI[k]].set(v)
    used = frozenset(used)
    Bp = padded_batch(B)
    W = block_lanes(Bp)
    # VMEM guard: v (+dv) block + params + coefficient block + double buffering
    while W > 128 and (2 * dim + Pn + 4) * W * 4 * 3 > 12 * 2**20:
        W //= 2
    while Bp % W:
        W //= 2
    pb = jnp.broadcast_to(pvec[:, None], (Pn, W))
    return loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used


def _loop_readers(e, v_ref, p_ref, W):
    rr = _partial(lambda e, i: v_ref[e.row0 + i, :].reshape(1, W), e)
    rp = _partial(lambda e, j: p_ref[e.prow0 + j, :].reshape(1, W), e)
    return rr, rp


def mega_logdensity_t(u, vT, *, interpret: bool = False):
    """Run the fused whole-model kernel. Caller must have checked
    eligibility (plan not None); raises _Unsupported otherwise.

    One pass: the slab engine evaluates every scalar/LKJ row of the block
    at full VREG utilization; loop entries (simplex, PD — cross-row
    recurrences) read their rows individually (per-ROW ref loads: Mosaic
    lowers arbitrary-sublane row reads well; unaligned MULTI-row register
    slices cost 2x, measured)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used = _prep(u, vT)
    vp = pad_to(vT.astype(dtype), Bp, 1)

    def kernel(v_ref, p_ref, cf_ref, lp_ref):
        acc = jnp.sum(
            _slab_value(v_ref[:, :], cf_ref[:, :], used), axis=0
        ).reshape(1, W)
        for e in loop:
            rr, rp = _loop_readers(e, v_ref, p_ref, W)
            acc = acc + e.emit(rr, rp, W, dtype)
        lp_ref[0, :] = acc[0, :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Bp), dtype),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((dim, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pn, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, NCF), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vp, pb, cf)
    return out[0, :B]


def mega_jvp_t(u, vT, dvT, *, interpret: bool = False):
    """Fused tangent kernel: dlp = sum_rows (d lp / d v) . dv, one pass over
    (vT, dvT). Linear in dvT; paired with mega_vjp_t through linear_call."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used = _prep(u, vT)
    vp = pad_to(vT.astype(dtype), Bp, 1)
    dvp = pad_to(dvT.astype(dtype), Bp, 1)

    def kernel(v_ref, dv_ref, p_ref, cf_ref, out_ref):
        g = _slab_partial(v_ref[:, :], cf_ref[:, :], used)
        acc = jnp.sum(g * dv_ref[:, :], axis=0).reshape(1, W)
        for e in loop:
            rr, rp = _loop_readers(e, v_ref, p_ref, W)
            ps = e.partials(rr, rp, W, dtype)
            for i, pi in enumerate(ps):
                acc = acc + pi * dv_ref[e.row0 + i, :].reshape(1, W)
        out_ref[0, :] = acc[0, :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Bp), dtype),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((dim, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pn, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, NCF), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vp, dvp, pb, cf)
    return out[0, :B]


def mega_vjp_t(u, vT, gbar, *, interpret: bool = False):
    """Fused transpose kernel: dvT = (d lp / d v) * gbar — the whole-model
    reverse pass as one Pallas pass (what NUTS's jax.vjp runs). The slab
    partial fills the entire out block (loop rows get exact 0 there), then
    loop entries overwrite their own rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used = _prep(u, vT)
    vp = pad_to(vT.astype(dtype), Bp, 1)
    gb = pad_to(gbar.astype(dtype).reshape(1, B), Bp, 1)

    def kernel(v_ref, g_ref, p_ref, cf_ref, out_ref):
        g = g_ref[0, :].reshape(1, W)
        out_ref[:, :] = _slab_partial(v_ref[:, :], cf_ref[:, :], used) * g
        for e in loop:
            rr, rp = _loop_readers(e, v_ref, p_ref, W)
            ps = e.partials(rr, rp, W, dtype)
            for i, pi in enumerate(ps):
                out_ref[e.row0 + i, :] = (pi * g)[0, :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((dim, Bp), dtype),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((dim, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pn, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, NCF), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dim, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vp, gb, pb, cf)
    return out[:, :B]


@jax.custom_jvp
def _mega_diffable(u, vT):
    return mega_logdensity_t(u, vT)


def _mega_diffable_jvp(primals, tangents):
    from jax.custom_derivatives import SymbolicZero
    from jax._src.custom_derivatives import linear_call

    from .core import TreeUnconstrainer

    u, vT = primals
    du, dvT = tangents
    composed = TreeUnconstrainer._linked_logdensity_t_children
    on_tpu = jax.default_backend() == "tpu"
    du_leaves = jax.tree_util.tree_leaves(
        du, is_leaf=lambda x: isinstance(x, SymbolicZero)
    )
    du_zero = all(isinstance(l, SymbolicZero) for l in du_leaves)
    dvT_zero = isinstance(dvT, SymbolicZero)

    primal = mega_logdensity_t(u, vT) if on_tpu else composed(u, vT)
    tangent = jnp.zeros_like(primal)
    if not dvT_zero:
        if on_tpu:
            # fused linear tangent with a fused custom TRANSPOSE: under
            # jax.vjp (the NUTS leapfrog) the whole-model reverse pass is
            # ONE Pallas kernel instead of the composed per-leaf machinery
            tangent = tangent + linear_call(
                lambda res, dv: mega_jvp_t(res[0], res[1], dv),
                lambda res, ct: mega_vjp_t(res[0], res[1], ct),
                (u, vT),
                dvT,
            )
        else:
            zu = jax.tree_util.tree_map(
                lambda x: jnp.zeros_like(jnp.asarray(x)), u
            )
            tangent = tangent + jax.jvp(composed, (u, vT), (zu, dvT))[1]
    if not du_zero:
        # parameter tangents (rare in samplers): composed path, zero dvT
        inst = jax.tree_util.tree_map(
            lambda t, x: (
                jnp.zeros_like(jnp.asarray(x)) if isinstance(t, SymbolicZero) else t
            ),
            du,
            u,
            is_leaf=lambda x: isinstance(x, SymbolicZero),
        )
        tangent = tangent + jax.jvp(
            composed, (u, vT), (inst, jnp.zeros_like(vT))
        )[1]
    return primal, tangent


_mega_diffable.defjvp(_mega_diffable_jvp, symbolic_zeros=True)


def try_mega(u, vT):
    """Dispatch hook for TreeUnconstrainer.linked_logdensity_t: the fused
    kernel when eligible (trace-time static decision), else None."""
    from .. import kernels
    from ..utils import _eps

    if not kernels.enabled():
        return None
    if jax.default_backend() != "tpu":
        return None
    if vT.ndim != 2 or vT.shape[-1] < kernels.MIN_BATCH:
        return None
    dtype = jnp.result_type(vT, float)
    if dtype != jnp.float32:
        return None
    if _plan(u, _eps(dtype)) is None:
        return None
    return _mega_diffable(u, vT)
