"""Generic TRACED entries of the whole-model fused kernel (see
fused_kernel.py): jaxpr partial evaluation splits a leaf's linked density
into a param-only part (hoisted outside the kernel as residuals) and a
v-dependent part admitted into the kernel body only when `_scan_safe`
proves it Mosaic-safe.
"""

from __future__ import annotations

from functools import partial as _partial  # noqa: F401

import jax
import jax.numpy as jnp
from jax.extend.core import ClosedJaxpr, Jaxpr

from .fused_base import _Entry, _Unsupported

# ---------------------------------------------------------------------------
# plan building
# ---------------------------------------------------------------------------


# Admission whitelist = primitives MEASURED to lower through Mosaic on the
# real TPU (fused_decomp._LOWERABLE, pinned to PRIM_LOWERING.json) plus the
# primitives fused_decomp rewrites into lowerable compositions at kernel
# trace time. Anything param-only — gammaln normalizers, cdf bounds of a
# truncation, bessel constants — is hoisted into the params operand by
# partial evaluation, so it never hits this check. Round-3 lesson: CPU
# interpret mode is NOT evidence of lowerability (TPUSWEEP_r03.txt:4 —
# whitelisted `asinh` crashed on chip); the scan therefore runs on jaxprs
# traced THROUGH `eval_decomposed`, i.e. on exactly what Mosaic compiles.
from .fused_decomp import (  # noqa: E402
    _DECOMP,
    _LOWERABLE,
    _STRUCTURAL_PRIMS,
    _eqn_lowerable,
    eval_decomposed,
)

_SAFE_PRIMS = _LOWERABLE | frozenset(_DECOMP)  # admission set (pre-decomp)


def _scan_safe(closed_jaxpr, budget=256, max_rank=1):
    """Raise _Unsupported unless every primitive in the jaxpr (recursing
    through structural wrappers) is measured-lowerable on the real Mosaic
    backend and the total op count is within budget (keeps kernel compile
    time and VMEM pressure bounded). Call this on DECOMPOSED jaxprs only
    (built by tracing through `eval_decomposed`).

    `max_rank` bounds the rank of every intermediate aval: the lowering
    probe (PRIM_LOWERING.json) ran shape-sensitive prims (broadcast_in_dim,
    reshape, concatenate, ...) on rank-2 instances only, and the kernel
    vmaps these bodies over the lane axis — so a rank-2 intermediate in an
    unbatched body becomes rank-3 in the kernel and can still hit Mosaic's
    'unsupported shape cast' compile crash (the r3-1 class). Bodies with
    higher-rank intermediates decline to the composed path instead."""
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
            if not _eqn_lowerable(eqn):
                raise _Unsupported
            for v in (*eqn.invars, *eqn.outvars):
                aval = getattr(v, "aval", None)
                shape = getattr(aval, "shape", None)
                if shape is not None and len(shape) > max_rank:
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

        def kfn0(v, *res):
            out = eval_decomposed(unk0, *res, v)[0]
            # no-op () -> () reshapes must not be emitted: Mosaic's
            # verifier rejects the scalar vector.broadcast they lower to
            # under the transpose pass (seen on chip, r4 sweep)
            return out if jnp.ndim(out) == 0 else out.reshape(())

        res_ex = [jnp.zeros(a.shape, a.dtype) for a in res_avals0]
        ex = jnp.zeros(ex_shape, jnp.float32)
        # safety is proven on the DECOMPOSED value and derivative jaxprs —
        # i.e. on exactly the ops the kernel body will hand to Mosaic
        # (tracing kfn0 applies fused_decomp's rewrites + inlining)
        _scan_safe(jax.make_jaxpr(kfn0)(ex, *res_ex))
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
        _scan_safe(dj, budget=512)
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
            out = eval_decomposed(unknown, *rs, v)[0]
            return out if jnp.ndim(out) == 0 else out.reshape(())

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
    body runs UNBATCHED on the (L,) event and must return exactly ONE
    density — a batched-parameter leaf broadcasts to (G,) and fails the
    scalar reshape, declining rather than silently evaluating group 0
    only). The traced function maps the whole (L,)
    linked event to its scalar linked density; partials come from ONE
    reverse pass (`jax.grad`), whose transpose jaxpr is scanned for safety
    too. In-kernel the L rows are stacked to (W, L) and the body vmapped
    over lanes."""
    L = int(leaf.linked_vec_length)
    if L < 2 or L > 16:
        raise _Unsupported
    leaves0, treedef = jax.tree_util.tree_flatten(leaf)

    def lp1(v, leaf2):
        # UNBATCHED (L,) -> scalar body: a (1, L) internal batch would put
        # rank-2 intermediates under the kernel's per-lane vmap, and the
        # resulting rank-3 broadcasts have no Mosaic lowering ("unsupported
        # shape cast", first seen on chip in the r4 sweep — CPU interpret
        # mode accepts them, another instance of the r3 lesson)
        out = leaf2.linked_logdensity(v)
        return out if jnp.ndim(out) == 0 else jnp.reshape(out, ())

    cell, specs, n_params, params, consts_of = _pe_split_admit(
        leaves0, treedef, lp1, (L,), (), "grad"
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
