"""Measured Mosaic primitive whitelist + trace-time decompositions for the
generic traced entries of the whole-model fused kernel (fused_traced.py).

Round-3 lesson (TPUSWEEP_r03.txt:4): the old `_SAFE_PRIMS` whitelisted
primitives CPU interpret mode accepts but the real Mosaic TPU backend
cannot lower — `asinh` crashed a JohnsonSU-containing model at XLA compile
time on the v5e with a user-facing NotImplementedError instead of falling
back to the composed path. The reference's asinh-based links run wherever
the reference runs (/root/reference/src/bijectors/corr.jl:303,328), so
plan eligibility here must be SOUND on the deployment target.

Two mechanisms restore soundness:

1. `_LOWERABLE` is pinned to the MEASURED set: tools/prim_lowering_probe.py
   AOT-compiles a one-op Pallas kernel per primitive on the attached TPU
   (lowering is where Mosaic raises) and writes PRIM_LOWERING.json;
   tests/test_fused_traced_safety.py enfores that this set matches the
   artifact whenever it is present. v5e result (2026-08-20): asinh, acosh,
   atanh, sinh, cosh, expm1, cbrt, cumsum, rev, f32 iota, atan(2), asin,
   acos, erf(c), lgamma, digamma all FAIL to lower.

2. Unsupported primitives with an exact composition of lowerable ones are
   DECOMPOSED at kernel trace time by `eval_decomposed` — a jaxpr
   interpreter that inlines structural calls (pjit / custom_jvp / remat)
   and rewrites each `_DECOMP` equation in place. Safety is then proven on
   the DECOMPOSED jaxprs (value and derivative): exactly what Mosaic will
   compile is what gets scanned. Primitives with no exact composition
   (atan/asin/acos/atan2, erf/erfc, lgamma/digamma) stay out of the
   whitelist, so a leaf using them declines to the composed per-leaf path
   at plan-build time — graceful degradation, never a compile-time crash.

Numerics: every decomposition is exact-algebra or better-than-f32-ulp
rational/log1p forms (no precision cliff vs the XLA originals); each is
pinned against its lax original (value AND grad) in
tests/test_fused_traced_safety.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.extend.core import ClosedJaxpr, Jaxpr, Literal

from .fused_base import _Unsupported

# Primitives measured to lower through Mosaic on the real v5e
# (PRIM_LOWERING.json, tools/prim_lowering_probe.py). "iota" is
# param-conditional: Mosaic's tpu.iota only produces integers, so int32
# iota is safe (fused_emit.py uses it on chip) while f32 iota fails
# verification — see _eqn_lowerable.
_LOWERABLE = frozenset({
    "abs", "add", "add_any", "and", "broadcast_in_dim", "ceil", "clamp",
    "concatenate", "convert_element_type", "cos", "div", "eq",
    "erf_inv", "exp", "exp2", "floor", "ge", "gt", "integer_pow",
    "is_finite", "le", "log", "log1p", "logistic", "lt", "max", "min",
    "mul", "ne", "neg", "nextafter", "not", "or", "pad", "pow",
    "reduce_and", "reduce_max", "reduce_min", "reduce_or", "reduce_sum",
    "rem", "reshape", "round", "rsqrt", "select_n", "sign", "sin", "slice",
    "split", "sqrt", "square", "squeeze", "stop_gradient", "sub", "tan",
    "tanh", "transpose", "xor",
})

# Structural call primitives: inlined by eval_decomposed / recursed by the
# safety scan.
_STRUCTURAL_PRIMS = frozenset({
    "jit", "pjit", "custom_jvp_call", "custom_vjp_call",
    "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr", "closed_call",
    "core_call", "remat", "remat2", "checkpoint",
})

# Inlining a custom_jvp/custom_vjp call DISCARDS its rule: AD then runs
# through the decomposed primal. That is only sound when either (a) the
# rule equals AD-of-primal (jax-library rules like softplus/logsumexp are
# consistent by design), or (b) the primal carries ops the admission scan
# rejects anyway (while/scan/cond or a pallas_call), so the leaf DECLINES
# to the composed path and the discarded rule never matters. Every
# in-repo custom rule must be classified here; tests/
# test_fused_traced_safety.py::test_custom_rule_registry_is_exhaustive
# walks the package and fails on any unclassified rule — adding a
# scan-free in-repo rule (e.g. an eps-guard with a straight-through
# tangent) without deciding its class is a test failure, not a silent
# wrong gradient in the fused kernel.
#   "pallas-primal": primal dispatches a Pallas kernel -> scan-rejected (b)
#   "loop-primal":   primal carries while/scan (root finds) -> scan-rejected (b)
#   "inline-safe":   author-verified AD-through-primal == rule (a); none yet
# Custom-rule calls whose primal lives OUTSIDE tpu_bijectors (jax-library
# functions) are a separate hazard: the exhaustiveness test above only
# classifies in-repo rules, yet inlining discards library rules identically
# — and a library rule that exists to FIX an edge-point tangent
# (xlogy-style 0*log(0)) would silently become AD-through-primal NaN inside
# the kernel while the composed path stays finite. `eval_decomposed`
# therefore declines (raises _Unsupported) on any out-of-repo custom call
# not in this author-verified list of rules that are interior-smooth and
# AD-through-primal-consistent (their custom rules exist for trace economy
# / stability, not to change any tangent value on the admitted domain):
_INLINE_SAFE_LIBRARY_RULES = frozenset({
    "softplus",    # jax.nn: rule == d/dx log1p(exp x) = sigmoid everywhere
    "logsumexp",   # jax.scipy.special: rule == softmax-weighted sum
    "expit",       # jax.scipy.special: rule == sigmoid', smooth everywhere
    "sigmoid",     # jax.nn alias of expit
    "logistic",    # lax name of the same function
})

_CUSTOM_RULE_CLASSES = {
    "_vec_corr_logdet_pallas": "pallas-primal",
    "_chol_logdet_pallas": "pallas-primal",
    "_lkj_logdet_pallas_t": "pallas-primal",
    "_vec_corr_inverse_all_pallas": "pallas-primal",
    "_pd_inverse_all_pallas": "pallas-primal",
    "_pd_logdensity_pallas_diffable": "pallas-primal",
    "_pd_tr_grad": "pallas-primal",
    "_pd_logdensity_pallas_t": "pallas-primal",
    "_simplex_inverse_pallas_diffable": "pallas-primal",
    "simplex_inverse_logdet_wlog": "pallas-primal",
    "simplex_logdet_wlog_nox": "pallas-primal",
    "simplex_logdet_wlog_nox_t": "pallas-primal",
    "_simplex_forward_logdet_pallas_diffable": "pallas-primal",
    "_simplex_inverse_logdet_pallas_diffable": "pallas-primal",
    "_generic_quantile": "loop-primal",
    "find_alpha": "loop-primal",
    "_mega_diffable": "pallas-primal",
}


def _eqn_lowerable(eqn) -> bool:
    name = eqn.primitive.name
    if name in _LOWERABLE:
        return True
    if name == "iota":
        return eqn.params.get("dtype") == jnp.int32
    return False


# ---------------------------------------------------------------------------
# decompositions (exact compositions of _LOWERABLE primitives)
# ---------------------------------------------------------------------------


def _d_expm1(x, **_):
    # Taylor on |x| < 1/4 (next term x^8/8! -> rel err < 2e-9 at the seam),
    # exp(x) - 1 elsewhere (rel err <= ~4.5 eps at the seam, shrinking
    # fast). Branch operand zeroed under the where so its grad is clean.
    small = jnp.abs(x) < 0.25
    xs = jnp.where(small, x, 0.0)
    p = xs * (1.0 + xs * (1.0 / 2 + xs * (1.0 / 6 + xs * (
        1.0 / 24 + xs * (1.0 / 120 + xs * (1.0 / 720 + xs * (1.0 / 5040)))))))
    return jnp.where(small, p, jnp.exp(x) - 1.0)


def _d_asinh(x, **_):
    # log1p reflection form: a + a^2/(1+sqrt(a^2+1)) == a + (sqrt(a^2+1)-1)
    # exactly, so small-|x| accuracy matches log1p; reflection keeps the
    # large-negative branch cancellation-free. The where-based reflection
    # (not sign()*...) keeps the tangent exact at x == 0. For a past
    # sqrt(floatmax) (~1.8e19 f32) a*a overflows to inf (inf/inf -> NaN
    # where lax.asinh stays finite), so the large branch switches to the
    # exact-at-that-magnitude log(2a) = log(a) + log 2 (rel err < 3e-39);
    # the small-branch operand is clamped under the where so the overflow
    # never contaminates the selected value or its tangent.
    neg = x < 0
    a = jnp.where(neg, -x, x)
    big_at = jnp.sqrt(jnp.finfo(jnp.result_type(x, float)).max) * 0.5
    big = a > big_at
    ac = jnp.where(big, 1.0, a)   # clamp per branch: the unselected side
    al = jnp.where(big, a, 1.0)   # must stay NaN/inf-free incl. tangents
    t = jnp.where(
        big,
        jnp.log(al) + 0.6931471805599453,
        jnp.log1p(ac + ac * ac / (1.0 + jnp.sqrt(ac * ac + 1.0))),
    )
    return jnp.where(neg, -t, t)


def _d_acosh(x, **_):
    # t*(x+1) overflows f32 past ~1.3e19 (lax.acosh stays finite via its
    # log(2x) branch) — same guarded split as _d_asinh
    big_at = jnp.sqrt(jnp.finfo(jnp.result_type(x, float)).max) * 0.5
    big = x > big_at
    xc = jnp.where(big, 1.0, x)
    xl = jnp.where(big, x, 1.0)
    t = xc - 1.0
    return jnp.where(
        big,
        jnp.log(xl) + 0.6931471805599453,
        jnp.log1p(t + jnp.sqrt(t * (xc + 1.0))),
    )


def _d_atanh(x, **_):
    return 0.5 * (jnp.log1p(x) - jnp.log1p(-x))


def _d_sinh(x, **_):
    return 0.5 * (_d_expm1(x) - _d_expm1(-x))


def _d_cosh(x, **_):
    e = jnp.exp(x)
    return 0.5 * (e + 1.0 / e)


def _d_cbrt(x, **_):
    neg = x < 0
    a = jnp.where(neg, -x, x)
    r = lax.pow(a, jnp.asarray(1.0 / 3.0, x.dtype))
    return jnp.where(neg, -r, r)


def _d_log2(x, **_):
    return jnp.log(x) * jnp.asarray(1.4426950408889634, x.dtype)


def _d_cumsum(x, *, axis, reverse=False, **_):
    # Hillis-Steele prefix over a STATIC small axis: log2(L) rounds of
    # shift-by-concatenation (zeros + slice) — no tpu.cumsum, no rev.
    L = x.shape[axis]
    if L > 64:
        raise _Unsupported
    k = 1
    while k < L:
        z = jnp.zeros_like(lax.slice_in_dim(x, 0, k, axis=axis))
        if reverse:
            sh = jnp.concatenate(
                [lax.slice_in_dim(x, k, L, axis=axis), z], axis=axis
            )
        else:
            sh = jnp.concatenate(
                [z, lax.slice_in_dim(x, 0, L - k, axis=axis)], axis=axis
            )
        x = x + sh
        k *= 2
    return x


def _d_rev(x, *, dimensions, **_):
    # static concat of single-index slices (axes here are small event axes,
    # L <= 16 by the traced-vector-entry admission rule)
    for d in dimensions:
        L = x.shape[d]
        if L > 32:
            raise _Unsupported
        if L > 1:
            x = jnp.concatenate(
                [lax.slice_in_dim(x, i, i + 1, axis=d) for i in range(L - 1, -1, -1)],
                axis=d,
            )
    return x


def _d_iota(*, dtype, shape, dimension, **_):
    r = lax.broadcasted_iota(jnp.int32, shape, dimension)
    return lax.convert_element_type(r, dtype)


_DECOMP = {
    "copy": lambda x, **_: x,  # identity — decomposed away, nothing to probe
    "expm1": _d_expm1,
    "asinh": _d_asinh,
    "acosh": _d_acosh,
    "atanh": _d_atanh,
    "sinh": _d_sinh,
    "cosh": _d_cosh,
    "cbrt": _d_cbrt,
    "log2": _d_log2,
    "cumsum": _d_cumsum,
    "rev": _d_rev,
    "iota": _d_iota,
}


# ---------------------------------------------------------------------------
# decomposing jaxpr interpreter
# ---------------------------------------------------------------------------


def _call_jaxpr_of(eqn):
    """The inner jaxpr of a structural call eqn, as a ClosedJaxpr."""
    for k in ("call_jaxpr", "jaxpr", "fun_jaxpr"):
        sub = eqn.params.get(k)
        if isinstance(sub, ClosedJaxpr):
            return sub
        if isinstance(sub, Jaxpr):
            return ClosedJaxpr(sub, [])
    raise _Unsupported


def _check_inline_safe(eqn):
    """Custom-rule calls are inlined with their rule DISCARDED; that is only
    sound for (a) in-repo rules — classified in `_CUSTOM_RULE_CLASSES` and
    policed by the exhaustiveness test — and (b) the author-verified
    library rules in `_INLINE_SAFE_LIBRARY_RULES`. Anything else (an
    unclassified jax-library rule that may exist to fix an edge tangent)
    declines the leaf to the composed path instead of silently dropping the
    rule."""
    sub = _call_jaxpr_of(eqn)
    jx = sub.jaxpr if isinstance(sub, ClosedJaxpr) else sub
    src = getattr(getattr(jx, "debug_info", None), "func_src_info", None) or ""
    # func_src_info looks like "softplus at /path/to/file.py:123"
    fn_name, _, path = src.partition(" at ")
    if "tpu_bijectors" in path:
        return
    if fn_name.strip() in _INLINE_SAFE_LIBRARY_RULES:
        return
    raise _Unsupported


def eval_decomposed(closed: ClosedJaxpr, *args):
    """Evaluate a ClosedJaxpr with `_DECOMP` rewrites applied in place and
    structural calls inlined (custom_jvp/vjp rules are discarded: AD then
    differentiates through the decomposed primal, which is correct for the
    closed-form densities the traced entries admit — anything whose custom
    rule exists because the primal is non-differentiable carries while/scan
    ops and is rejected by the safety scan anyway). Returns the flat list
    of outputs.

    This is the evaluator the KERNEL body runs, so the safety scan in
    fused_traced is applied to jaxprs traced THROUGH this function — what
    Mosaic compiles is exactly what was proven lowerable."""
    env = {}

    def read(a):
        return a.val if isinstance(a, Literal) else env[a]

    jaxpr = closed.jaxpr
    if len(jaxpr.invars) != len(args):
        raise _Unsupported
    for v, c in zip(jaxpr.constvars, closed.consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        invals = [read(v) for v in eqn.invars]
        if name in _DECOMP:
            outs = [_DECOMP[name](*invals, **eqn.params)]
        elif name in _STRUCTURAL_PRIMS:
            if name.startswith("custom_"):
                _check_inline_safe(eqn)
            outs = eval_decomposed(_call_jaxpr_of(eqn), *invals)
        else:
            ans = eqn.primitive.bind(*invals, **eqn.params)
            outs = list(ans) if eqn.primitive.multiple_results else [ans]
        if len(outs) != len(eqn.outvars):
            raise _Unsupported
        for v, o in zip(eqn.outvars, outs):
            env[v] = o
    return [read(v) for v in jaxpr.outvars]
