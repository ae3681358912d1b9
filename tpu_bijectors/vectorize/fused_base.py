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
    # _slab_group_val_par) — every transcendental runs on all 8 sublanes per VREG
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

# Term groups for BANDED slab evaluation (round 4): each term's pass runs
# only over the 8-aligned union row range of the slab entries that assign
# its WEIGHT key, instead of the full (dim, W) block. Round-4 probe
# (tools/transcend_probe.py, TRANSCEND_PROBE.json) overturned the r3
# assumption that transcendentals bound the kernel: on the v5e the EUP is
# nearly free (exp/log +~1.5 us per full-block pass) while each serial VPU
# ALU op costs ~7 us/pass — so the win is not "fewer softplus calls" but
# "fewer select/fma passes over rows that don't use the term". Hence ONE
# GROUP PER WEIGHT KEY (lin/quad/absv/sp/exp/l1p): on the bench model the
# quadratic's 4 ops run over the 16 Normal/LogNormal rows instead of all
# 151, and the |D| machinery only over the 135 Dirichlet/LKJ rows.
# Auxiliary columns (m, sa, sb, ea, eb, la) ride with their weight key's
# group(s); `c0` has no V dependence at all and is lifted OUT of the
# kernel entirely (summed at trace time, added to lp afterwards).
_WEIGHT_OF = {
    "lin": frozenset({"c1"}),
    "quad": frozenset({"cq"}),
    "absv": frozenset({"c3p", "c3n"}),
    "sp": frozenset({"c4"}),
    "exp": frozenset({"c5"}),
    "l1p": frozenset({"c6"}),
}


def _zguard(c, term):
    """Exact 0 for zero-coefficient rows even at V = +/-inf: a band spans
    rows of MIXED families, so e.g. a Normal-owned `cq` column is 0 on a
    Laplace/Dirichlet row — 0 * inf would NaN the whole lane there. The
    where selects per ROW (c is (rows, 1)-broadcast), so finite-coefficient
    rows keep the exact term (incl. legitimate +/-inf limits)."""
    return jnp.where(c == 0.0, jnp.zeros_like(term), term)


# A/B switch for tools/segment_share_probe.py: True computes the masked-V /
# D / |D| / sign machinery once per segment and shares it across the
# segment's groups; False evaluates each group independently (recomputing
# those pieces). MEASURED on the v5e (artifacts/SEGMENT_SHARE_AB.json,
# paired in-process): with the round-5 per-segment static flags (skip_mask
# + per-segment key sets) the INDEPENDENT form wins — value 142.2 vs
# 150.0 us, value-and-grad 212.0 vs 223.4 us at B=131072 — plausibly
# register-pressure relief (the shared form keeps D/U/S live across both
# groups; the recomputation is cheap and pipelines better). Outputs are
# bitwise identical either way (probe diffs 0.0), so this is purely a
# measured default.
_SEGMENT_SHARE = False


def _slab_segment_val_par(
    groups, V, cf, used, *, value=True, partial=False, skip_mask=False
):
    """ALL term groups covering one disjoint row segment (V, cf already
    sliced to the segment), with the masked-V / D / |D| / sign machinery
    computed ONCE and shared across the groups (round 5: on every mixed
    model the absv and sp groups cover the same Dirichlet/LKJ rows, and
    each serial VPU pass over a 135-row band costs ~6 us on the v5e —
    TRANSCEND_PROBE.json — so the duplicated mask/subtract/abs passes were
    pure waste; the per-group arithmetic and op order are unchanged, so
    kernel==composed pinning is unaffected). Returns (val_acc, par_acc) —
    summed over the groups; either is None when not requested. Requesting
    both additionally shares each group's transcendental between the value
    and its derivative (softplus' = sigmoid via the SAME exp: the one-pass
    value-and-grad kernel pays one EUP op per row, not two)."""
    if not _SEGMENT_SHARE and len(groups) > 1:
        val_acc = par_acc = None
        for g in groups:
            v_, p_ = _slab_segment_val_par(
                (g,), V, cf, used,
                value=value, partial=partial, skip_mask=skip_mask,
            )
            if v_ is not None:
                val_acc = v_ if val_acc is None else val_acc + v_
            if p_ is not None:
                par_acc = p_ if par_acc is None else par_acc + p_
        return val_acc, par_acc
    col = lambda k: cf[:, _CI[k]][:, None]
    # skip_mask: the caller proved (statically, from the plan) that every
    # row of this segment is slab-owned — the ownership mask is the
    # identity there, so the select pass is skipped. `used` is likewise
    # the segment's OWN assigned-key set: on segments whose entries never
    # assign m/sb/eb, those columns are structurally zero and the
    # subtract/add passes are skipped exactly.
    Vm = V if skip_mask else _slab_mask_v(V, cf)
    D = (Vm - col("m")) if "m" in used else Vm
    # shared |D|: sp always needs it; absv's value-only form uses it too
    # (the abs form measured cheaper than sign+mul+mul on chip — r4)
    need_u = ("sp" in groups) or ("absv" in groups and not partial)
    U = jnp.abs(D) if need_u else None
    # shared sign(D): any partial of absv/sp (tie convention sign(0) = 0)
    need_s = partial and (("absv" in groups) or ("sp" in groups))
    S = jnp.sign(D) if need_s else None
    val_acc = par_acc = None

    def acc(val, par):
        nonlocal val_acc, par_acc
        if val is not None:
            val_acc = val if val_acc is None else val_acc + val
        if par is not None:
            par_acc = par if par_acc is None else par_acc + par

    for group in groups:
        val = par = None
        if group == "lin":
            c1 = col("c1")
            if value:
                val = _zguard(c1, c1 * Vm)
            if partial:
                par = jnp.broadcast_to(c1, Vm.shape)
        elif group == "quad":
            cq = col("cq")
            t = cq * D  # shared between value (t*D) and derivative (2t)
            if value:
                val = _zguard(cq, t * D)
            if partial:
                par = _zguard(cq, 2.0 * t)
        elif group == "absv":
            sel3 = jnp.where(D >= 0, col("c3p"), col("c3n"))
            if value and partial:
                # shared form: s is the derivative and s*D == sel3*|D|
                s = sel3 * S
                val = _zguard(sel3, s * D)
                par = s
            elif value:
                val = _zguard(sel3, sel3 * U)
            else:
                par = sel3 * S
        elif group == "sp":
            c4 = col("c4")
            sp_arg = col("sa") * U
            if "sb" in used:
                sp_arg = sp_arg + col("sb")
            if value and partial:
                # shared exp: sp_arg <= 0 by construction (sa <= 0, see
                # _COEF_KEYS), so e = exp(sp_arg) in (0, 1]: softplus is
                # log1p(e), sigmoid is e/(1+e) — one EUP exp serves both
                e = jnp.exp(sp_arg)
                val = _zguard(c4, c4 * jnp.log1p(e))
                par = _zguard(c4, c4 * col("sa") * S * (e / (1.0 + e)))
            elif value:
                val = _zguard(c4, c4 * jax.nn.softplus(sp_arg))
            else:
                par = _zguard(
                    c4, c4 * col("sa") * S * jax.nn.sigmoid(sp_arg)
                )
        elif group == "exp":
            c5 = col("c5")
            e_arg = col("ea") * Vm
            if "eb" in used:
                e_arg = e_arg + col("eb")
            e = jnp.exp(e_arg)
            if value:
                val = _zguard(c5, c5 * e)
            if partial:
                par = _zguard(c5, c5 * col("ea") * e)
        elif group == "l1p":
            c6 = col("c6")
            la = col("la")
            t = la * D
            t2 = t * t
            if value:
                val = _zguard(c6, c6 * jnp.log1p(t2))
            if partial:
                par = _zguard(c6, c6 * (2.0 * la * la * D) / (1.0 + t2))
        else:
            raise KeyError(group)
        acc(val, par)
    return val_acc, par_acc


def _slab_group_val_par(group, V, cf, used, *, value=True, partial=False):
    """One term group on a row band (single-group view of
    `_slab_segment_val_par`; the kernels call the segment form so shared
    machinery is computed once per segment, not once per group)."""
    return _slab_segment_val_par((group,), V, cf, used, value=value, partial=partial)


def _slab_group_value(group, V, cf, used):
    """Value of one term group on a row band (see _slab_segment_val_par)."""
    return _slab_group_val_par(group, V, cf, used, value=True)[0]


def _slab_group_partial(group, V, cf, used):
    """d(group terms)/dV on a row band (tie conventions: sign(0) = 0
    via jnp.sign — see the NOTE below)."""
    return _slab_group_val_par(
        group, V, cf, used, value=False, partial=True
    )[1]


def _slab_mask_v(V, cf):
    """Zero the loop-entry rows of V (ownership column 0) so slab terms on
    those rows are exact 0 regardless of the state value."""
    return jnp.where(cf[:, _MASK_COL][:, None] > 0, V, 0.0)


# NOTE on tie conventions of the partials (_slab_group_val_par): they
# match the composed path's where defined by jnp.abs (sign(0) = 0); the
# signed-softplus decomposition makes the sp partial 0 at the measure-zero
# point D == 0 for Beta/Pareto/HalfCauchy (the composed path's smooth
# sigmoid form is nonzero there) — irrelevant off that exact point.
# There is deliberately NO full-block wrapper: the kernels are the only
# consumers of the slab closed form, and they evaluate each weight-key
# group on its own row band (fused_kernel._prep / _disjoint_segments);
# equivalence is pinned against the composed per-leaf path by
# tests/test_transposed_layout.py, not against a second in-repo copy.
