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

from functools import partial as _partial  # noqa: F401

import jax
import jax.numpy as jnp

from .fused_base import (  # noqa: F401 — re-exported for tests/tools
    NCF,
    NK,
    _ALL_KEYS,
    _CI,
    _COEF_KEYS,
    _Entry,
    _MASK_COL,
    _Unsupported,
    _slab_mask_v,
)
from .fused_plan import _plan, _plan_uncached  # noqa: F401
from .fused_traced import (  # noqa: F401 — re-exported for tests
    _SAFE_PRIMS,
    _pe_split_admit,
    _scan_safe,
    _traced_scalar_entry,
    _traced_vector_entry,
)

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
    # trace-time union of assigned keys; `bands` maps each WEIGHT-KEY term
    # group (fused_base._WEIGHT_OF: lin/quad/absv/sp/exp/l1p) to the
    # 8-aligned union row range of the entries assigning it — every term's
    # select/fma/EUP pass runs only over its band instead of the full
    # (dim, W) block (round 4; measured on chip the per-op VPU pass cost
    # dominates, TRANSCEND_PROBE.json — on the bench model the quadratic
    # serves 16 of 151 rows and the |D| machinery 135). Extra 8-alignment
    # rows inside a band see exactly the old full-block semantics (zero
    # coefficients / ownership mask). Aux columns (m/sa/la/...) never
    # anchor a band — their owning entries also assign a weight key on the
    # same rows. `c0` has no V dependence: its row sum is lifted out of
    # the kernel entirely (c0sum, added to lp post-kernel).
    from .fused_base import _WEIGHT_OF

    _key_group = {k: g for g, ks in _WEIGHT_OF.items() for k in ks}
    cf = jnp.zeros((dim, NCF), dtype)
    used = set()
    raw_bands: dict = {}
    entry_keys = []  # (row0, rows, keys) per slab entry — static flags below
    for e in plan:
        if e.slab is None:
            continue
        cf = cf.at[e.row0 : e.row0 + e.rows, _MASK_COL].set(1.0)
        ks = e.slab(dtype)
        entry_keys.append((e.row0, e.rows, frozenset(ks)))
        for k, v in ks.items():
            used.add(k)
            cf = cf.at[e.row0 : e.row0 + e.rows, _CI[k]].set(v)
            g = _key_group.get(k)
            if g is not None:
                lo, hi = raw_bands.get(g, (dim, 0))
                raw_bands[g] = (min(lo, e.row0), max(hi, e.row0 + e.rows))
    used = frozenset(used)
    bands = tuple(
        (g, (lo // 8 * 8, min(dim, -(-hi // 8) * 8)))
        for g, (lo, hi) in sorted(raw_bands.items())
    )
    # per-SEGMENT static flags (round 5): each disjoint segment carries the
    # union of keys its overlapping slab entries assign (so e.g. the
    # m-subtraction / sb-add run only on segments whose entries use them —
    # the coefficient columns are structurally zero elsewhere, so skipping
    # is exact) and skip_mask=True when NO loop-entry rows fall inside (the
    # ownership mask only zeroes loop rows' V; on all-slab segments it is
    # the identity). Alignment rows between entries always belong to SOME
    # entry (the plan tiles [0, dim)), so the flags are sound.
    loop_ranges = [(e.row0, e.row0 + e.rows) for e in plan if e.slab is None]
    segs = []
    for a, b, gs in _disjoint_segments(bands, dim):
        seg_used = frozenset(
            k
            for r0, rn, ks in entry_keys
            if r0 < b and r0 + rn > a
            for k in ks
        )
        skip_mask = not any(lo < b and hi > a for lo, hi in loop_ranges)
        segs.append((a, b, gs, seg_used, skip_mask))
    segs = tuple(segs)
    c0sum = jnp.sum(cf[:, _CI["c0"]])
    Bp = padded_batch(B)
    W = block_lanes(Bp)
    # VMEM guard: v (+dv) block + params + coefficient block + double buffering
    while W > 128 and (2 * dim + Pn + 4) * W * 4 * 3 > 12 * 2**20:
        W //= 2
    while Bp % W:
        W //= 2
    pb = jnp.broadcast_to(pvec[:, None], (Pn, W))
    return loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used, segs, c0sum


def _disjoint_segments(bands, dim):
    """Partition [0, dim) into disjoint row segments, each labeled with the
    band groups covering it. Lets the gradient-writing kernels accumulate
    every segment's partials in REGISTERS and write each out-block row
    range exactly once — instead of a zeros-init of the whole (dim, W)
    block followed by one VMEM read-modify-write per overlapping band
    (absv and sp share their rows on every mixed model)."""
    edges = sorted({0, dim} | {e for _, (lo, hi) in bands for e in (lo, hi)})
    segs = []
    for a, b in zip(edges, edges[1:]):
        gs = tuple(g for g, (lo, hi) in bands if lo <= a and b <= hi)
        segs.append((a, b, gs))
    return segs


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

    loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used, segs, c0sum = _prep(u, vT)
    vp = pad_to(vT.astype(dtype), Bp, 1)

    def kernel(v_ref, p_ref, cf_ref, lp_ref):
        from .fused_base import _slab_segment_val_par

        acc = jnp.zeros((1, W), dtype)
        for a, b, gs, su, sm in segs:
            if not gs:
                continue
            # one shared masked-V/D/|D| computation serves every group
            # covering this segment (fused_base._slab_segment_val_par);
            # su/sm: per-segment static key set + mask skip (see _prep)
            val_acc, _ = _slab_segment_val_par(
                gs, v_ref[a:b, :], cf_ref[a:b, :], su, value=True,
                skip_mask=sm,
            )
            acc = acc + jnp.sum(val_acc, axis=0).reshape(1, W)
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
    # c0 (no V dependence) is lifted out of the kernel: one (B,) add here
    # replaces a (band, W) broadcast-add pass inside it
    return out[0, :B] + c0sum


def mega_jvp_t(u, vT, dvT, *, interpret: bool = False):
    """Fused tangent kernel: dlp = sum_rows (d lp / d v) . dv, one pass over
    (vT, dvT). Linear in dvT; paired with mega_vjp_t through linear_call."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used, segs, _ = _prep(u, vT)
    vp = pad_to(vT.astype(dtype), Bp, 1)
    dvp = pad_to(dvT.astype(dtype), Bp, 1)

    def kernel(v_ref, dv_ref, p_ref, cf_ref, out_ref):
        from .fused_base import _slab_segment_val_par

        acc = jnp.zeros((1, W), dtype)
        for a, b, gs, su, sm in segs:
            if not gs:
                continue
            _, par_acc = _slab_segment_val_par(
                gs, v_ref[a:b, :], cf_ref[a:b, :], su,
                value=False, partial=True, skip_mask=sm,
            )
            acc = acc + jnp.sum(
                par_acc * dv_ref[a:b, :], axis=0
            ).reshape(1, W)
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

    loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used, segs, _ = _prep(u, vT)
    vp = pad_to(vT.astype(dtype), Bp, 1)
    gb = pad_to(gbar.astype(dtype).reshape(1, B), Bp, 1)

    def kernel(v_ref, g_ref, p_ref, cf_ref, out_ref):
        from .fused_base import _slab_segment_val_par

        g = g_ref[0, :].reshape(1, W)
        for a, b, gs, su, sm in segs:
            if not gs:
                out_ref[a:b, :] = jnp.zeros((b - a, W), dtype)
                continue
            _, par = _slab_segment_val_par(
                gs, v_ref[a:b, :], cf_ref[a:b, :], su,
                value=False, partial=True, skip_mask=sm,
            )
            out_ref[a:b, :] = par * g
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


def mega_value_and_grad_t(u, vT, *, interpret: bool = False):
    """FUSED value + full gradient in ONE Pallas pass: (lp (B,), g (dim, B))
    with g = d(sum lp)/d vT — exactly what every NUTS/HMC leapfrog needs.

    Via jax.vjp the same quantities cost a primal kernel plus a transpose
    kernel (the state is read from HBM twice and the partials recomputed);
    this kernel reads the state once and writes lp and g together — HBM
    floor 2 passes instead of 3+ (measured ~353 us -> ~2 passes' worth on
    the bench model, tools/simplex_slab_probe.py). The slab/loop partials
    maps are shared with the value emitters, so XLA CSE reuses the
    sigmoid/softplus subexpressions inside the one kernel body.

    Not differentiable (a leapfrog consumes lp/g as values); AD-composed
    paths keep using `_mega_diffable` (custom_jvp + linear_call)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .fused_base import _slab_segment_val_par

    loop, dim, B, Bp, W, Pn, dtype, pb, cf, pad_to, used, segs, c0sum = _prep(u, vT)
    vp = pad_to(vT.astype(dtype), Bp, 1)

    def kernel(v_ref, p_ref, cf_ref, lp_ref, g_ref):
        acc = jnp.zeros((1, W), dtype)
        for a, b, gs, su, sm in segs:
            if not gs:
                g_ref[a:b, :] = jnp.zeros((b - a, W), dtype)
                continue
            # combined form: value and derivative share the masked V / D /
            # |D| / sign machinery ACROSS the segment's groups AND each
            # group's softplus/sigmoid exp (one EUP op per row serves both
            # — measured win, TRANSCEND_PROBE.json spsig_sh2 vs spsig)
            val_acc, par_acc = _slab_segment_val_par(
                gs, v_ref[a:b, :], cf_ref[a:b, :], su,
                value=True, partial=True, skip_mask=sm,
            )
            acc = acc + jnp.sum(val_acc, axis=0).reshape(1, W)
            g_ref[a:b, :] = par_acc
        for e in loop:
            rr, rp = _loop_readers(e, v_ref, p_ref, W)
            acc = acc + e.emit(rr, rp, W, dtype)
            ps = e.partials(rr, rp, W, dtype)
            for i, pi in enumerate(ps):
                g_ref[e.row0 + i, :] = pi[0, :]
        lp_ref[0, :] = acc[0, :]

    lp, g = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, Bp), dtype),
            jax.ShapeDtypeStruct((dim, Bp), dtype),
        ),
        grid=(Bp // W,),
        in_specs=[
            pl.BlockSpec((dim, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pn, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, NCF), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(vp, pb, cf)
    return lp[0, :B] + c0sum, g[:, :B]


def try_mega_value_and_grad(u, vT):
    """Leapfrog fast-path dispatch: (lp, g) from the fused one-pass kernel
    when eligible, else None (caller falls back to jax.vjp). The band is
    the vg-specific one (kernels.MEGA_VG_OFF_BAND): the one-pass kernel
    wins over a wider range than the value kernel."""
    from .. import kernels
    from ..utils import _eps

    if not kernels.enabled():
        return None
    if jax.default_backend() != "tpu":
        return None
    lo, hi = kernels.MEGA_VG_OFF_BAND
    if vT.ndim != 2 or (lo <= vT.shape[-1] < hi):
        return None
    dtype = jnp.result_type(vT, float)
    if dtype != jnp.float32:
        return None
    if _plan(u, _eps(dtype)) is None:
        return None
    return mega_value_and_grad_t(u, vT)


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


def _mega_batch_ok(B: int) -> bool:
    """Measured dispatch band (MEGA_CROSSOVER.json, tools/mega_crossover.py):
    the whole-model kernel wins at every B BELOW the per-leaf gate (the
    per-leaf kernels are off there and the jnp path is ~2x slower) and
    again at large B; the composed per-leaf path wins in a mid band.
    kernels.MEGA_OFF_BAND = (lo, hi) is that measured exclusion band."""
    from .. import kernels

    lo, hi = kernels.MEGA_OFF_BAND
    return not (lo <= B < hi)


def try_mega(u, vT):
    """Dispatch hook for TreeUnconstrainer.linked_logdensity_t: the fused
    kernel when eligible (trace-time static decision), else None."""
    from .. import kernels
    from ..utils import _eps

    if not kernels.enabled():
        return None
    if jax.default_backend() != "tpu":
        return None
    if vT.ndim != 2 or not _mega_batch_ok(vT.shape[-1]):
        return None
    dtype = jnp.result_type(vT, float)
    if dtype != jnp.float32:
        return None
    if _plan(u, _eps(dtype)) is None:
        return None
    return _mega_diffable(u, vT)
