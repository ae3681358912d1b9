"""Shared base of the whole-model fused kernel (vectorize/fused_kernel.py):
the plan `_Entry` record and the SLAB ENGINE closed form.

Split out of fused_kernel.py (round 3) so the plan builder
(`fused_plan.py`), emitters (`fused_emit.py`), traced entries
(`fused_traced.py`) and kernel assembly (`fused_kernel.py`) each stay
reviewable; public API (`try_mega`, `_plan`) is unchanged and lives in
`fused_kernel.py`.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

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

# Term groups for BANDED slab evaluation (round 4): each transcendental
# pass runs only over the 8-aligned union row range of the slab entries
# that assign its weight key, instead of the full (dim, W) block — on the
# bench model the exp pass served 8 LogNormal rows out of 151 (95% waste).
# Auxiliary columns (m, sa, sb, ea, eb, la) ride with their weight key's
# group. "cheap" terms (no transcendental) share one band.
_GROUP_OF = {
    "c0": "cheap", "c1": "cheap", "cq": "cheap", "c3p": "cheap",
    "c3n": "cheap", "m": "cheap",
    "c4": "sp", "sa": "sp", "sb": "sp",
    "c5": "exp", "ea": "exp", "eb": "exp",
    "c6": "l1p", "la": "l1p",
}
_GROUP_KEYS = {
    "cheap": frozenset({"m", "c0", "c1", "cq", "c3p", "c3n"}),
    "sp": frozenset({"m", "c4", "sa", "sb"}),
    "exp": frozenset({"c5", "ea", "eb"}),
    "l1p": frozenset({"m", "c6", "la"}),
}


def _zguard(c, term):
    """Exact 0 for zero-coefficient rows even at V = +/-inf: a band spans
    rows of MIXED families, so e.g. a Normal-owned `cq` column is 0 on a
    Laplace/Dirichlet row — 0 * inf would NaN the whole lane there. The
    where selects per ROW (c is (rows, 1)-broadcast), so finite-coefficient
    rows keep the exact term (incl. legitimate +/-inf limits)."""
    return jnp.where(c == 0.0, jnp.zeros_like(term), term)


def _slab_group_value(group, V, cf, used):
    """One term group of the slab closed form, evaluated on a row BAND
    (V, cf already sliced). Same math as _slab_value restricted to the
    group's terms — the kernel sums each group's band and adds them."""
    col = lambda k: cf[:, _CI[k]][:, None]
    V = _slab_mask_v(V, cf)
    D = (V - col("m")) if "m" in used else V
    acc = jnp.zeros((cf.shape[0], 1), V.dtype)
    if group == "cheap":
        U = jnp.abs(D)
        acc = acc + col("c0")
        out = jnp.broadcast_to(acc, V.shape)
        if "c1" in used:
            out = out + _zguard(col("c1"), col("c1") * V)
        if "cq" in used:
            out = out + _zguard(col("cq"), col("cq") * (D * D))
        if "c3p" in used or "c3n" in used:
            sel3 = jnp.where(D >= 0, col("c3p"), col("c3n"))
            out = out + _zguard(sel3, sel3 * U)
        return out
    if group == "sp":
        U = jnp.abs(D)
        sp_arg = col("sa") * U
        if "sb" in used:
            sp_arg = sp_arg + col("sb")
        return _zguard(col("c4"), col("c4") * jax.nn.softplus(sp_arg))
    if group == "exp":
        e_arg = col("ea") * V
        if "eb" in used:
            e_arg = e_arg + col("eb")
        return _zguard(col("c5"), col("c5") * jnp.exp(e_arg))
    t = col("la") * D
    return _zguard(col("c6"), col("c6") * jnp.log1p(t * t))


def _slab_group_partial(group, V, cf, used):
    """d(group terms)/dV on a row band — matches _slab_partial restricted
    to the group (same tie conventions)."""
    col = lambda k: cf[:, _CI[k]][:, None]
    V = _slab_mask_v(V, cf)
    D = (V - col("m")) if "m" in used else V
    if group == "cheap":
        sgn = jnp.sign(D)
        g = jnp.zeros((cf.shape[0], 1), V.dtype)
        if "c1" in used:
            g = g + col("c1")
        out = jnp.broadcast_to(g, V.shape)
        if "cq" in used:
            out = out + _zguard(col("cq"), 2.0 * col("cq") * D)
        if "c3p" in used or "c3n" in used:
            sel3 = jnp.where(D >= 0, col("c3p"), col("c3n"))
            out = out + sel3 * sgn
        return out
    if group == "sp":
        U = jnp.abs(D)
        sgn = jnp.sign(D)
        sp_arg = col("sa") * U
        if "sb" in used:
            sp_arg = sp_arg + col("sb")
        return _zguard(
            col("c4"), col("c4") * col("sa") * sgn * jax.nn.sigmoid(sp_arg)
        )
    if group == "exp":
        e_arg = col("ea") * V
        if "eb" in used:
            e_arg = e_arg + col("eb")
        return _zguard(col("c5"), col("c5") * col("ea") * jnp.exp(e_arg))
    la = col("la")
    t = la * D
    return _zguard(col("c6"), col("c6") * (2.0 * la * la * D) / (1.0 + t * t))


def _slab_mask_v(V, cf):
    """Zero the loop-entry rows of V (ownership column 0) so slab terms on
    those rows are exact 0 regardless of the state value."""
    return jnp.where(cf[:, _MASK_COL][:, None] > 0, V, 0.0)


def _used_groups(used):
    out = ["cheap"]
    if "c4" in used:
        out.append("sp")
    if "c5" in used:
        out.append("exp")
    if "c6" in used:
        out.append("l1p")
    return out


def _slab_value(V, cf, used=_ALL_KEYS):
    """(dim, W) slab log-density: per-row coefficients broadcast over lanes.

    Full-block form = the sum of every used term group over the whole
    block (the kernels evaluate groups on their static row BANDS instead —
    see _slab_group_value / fused_kernel._prep; this wrapper keeps the
    closed form in ONE place for tests/tools). `used` is the trace-time
    set of assigned coefficient keys: terms whose weight column is
    statically all-zero are never emitted — the transcendentals are the
    kernel's bound, not HBM."""
    acc = None
    for g in _used_groups(used):
        t = _slab_group_value(g, V, cf, used)
        acc = t if acc is None else acc + t
    return jnp.broadcast_to(acc, V.shape)


def _slab_partial(V, cf, used=_ALL_KEYS):
    """(dim, W) d lp / d V of the slab form (full-block sum of the group
    partials — see _slab_group_partial). Matches the composed path's tie
    conventions where they are defined by jnp.abs (sign(0) = 0); the
    signed-softplus decomposition makes the partial 0 at the measure-zero
    point D == 0 for Beta/Pareto/HalfCauchy (the composed path's smooth
    sigmoid form is nonzero there) — irrelevant off that exact point."""
    acc = None
    for g in _used_groups(used):
        t = _slab_group_partial(g, V, cf, used)
        acc = t if acc is None else acc + t
    return jnp.broadcast_to(acc, V.shape)
