"""Soundness of the generic traced entries' Mosaic admission (round-4 fix
for TPUSWEEP_r03.txt:4 — `asinh` was whitelisted but not lowerable on the
real TPU, crashing eligible models at compile time instead of degrading).

Three contracts:
1. `fused_decomp._LOWERABLE` is pinned to the on-chip probe artifact
   (PRIM_LOWERING.json, written by tools/prim_lowering_probe.py on the
   v5e): nothing is whitelisted that was not measured to lower.
2. Every `_DECOMP` rewrite matches its lax original — value AND gradient —
   over a stress grid, and its decomposed jaxpr contains only lowerable
   primitives.
3. Admission behavior: an asinh-carrying density (JohnsonSU) is ADMITTED
   (decomposed), cumsum/rev vector bodies are ADMITTED, and a density with
   no lowerable composition (atan) DECLINES to the composed path (raises
   _Unsupported at plan time — never a compile-time crash; reference
   behavior: every link usable on the deployment target,
   /root/reference/src/bijectors/corr.jl:303).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from tpu_bijectors.vectorize import fused_decomp as fd
from tpu_bijectors.vectorize.fused_base import _Unsupported
from tpu_bijectors.vectorize.fused_traced import _scan_safe

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PRIM_LOWERING.json")


def test_whitelist_is_subset_of_measured_artifact():
    if not os.path.exists(ART):
        pytest.skip("no PRIM_LOWERING.json artifact in this checkout")
    with open(ART) as fh:
        art = json.load(fh)
    ok = set(art["ok"])
    unmeasured = fd._LOWERABLE - ok
    assert not unmeasured, (
        f"whitelisted but never measured to lower on chip: {sorted(unmeasured)}"
    )
    # and everything the probe measured as FAILING must not be whitelisted
    bad = fd._LOWERABLE & set(art["fail"])
    assert not bad, f"whitelisted prims measured to FAIL lowering: {sorted(bad)}"
    # iota is param-conditional: the int32 composition must be measured OK
    assert "iota_i32" in ok


# (name, lax original, decomposition, grid) — grids avoid true domain
# boundaries but cover the numerically-hard regions (|x| >> 1, |x| << 1).
_X_WIDE = np.concatenate([
    -(10.0 ** np.arange(6, -8, -1.0)), [0.0], 10.0 ** np.arange(-8, 7, 1.0)
])
_X_GT1 = 1.0 + 10.0 ** np.arange(-7, 4, 0.5)
_X_UNIT = np.tanh(_X_WIDE)  # (-1, 1)

# (name, lax original, decomposition, grid, value rtol, analytic derivative)
# Gradients are arbitrated by the ANALYTIC derivative, not AD of the
# original: e.g. jax's expm1 JVP rule is (ans+1)*g, which cancels digits at
# large negative x — the decomposed exp(x)*g is the more accurate of the two.
UNARY = [
    ("expm1", jnp.expm1, fd._d_expm1, np.clip(_X_WIDE, -30, 30), 5e-9,
     lambda x: np.exp(x)),
    ("asinh", jnp.arcsinh, fd._d_asinh, _X_WIDE, 1e-7,
     lambda x: 1.0 / np.sqrt(x * x + 1.0)),
    ("acosh", jnp.arccosh, fd._d_acosh, _X_GT1, 1e-7,
     lambda x: 1.0 / np.sqrt(x * x - 1.0)),
    ("atanh", jnp.arctanh, fd._d_atanh, _X_UNIT * (1 - 1e-9), 1e-7,
     lambda x: 1.0 / (1.0 - x * x)),
    ("sinh", jnp.sinh, fd._d_sinh, np.clip(_X_WIDE, -30, 30), 5e-9,
     lambda x: np.cosh(x)),
    ("cosh", jnp.cosh, fd._d_cosh, np.clip(_X_WIDE, -30, 30), 1e-9,
     lambda x: np.sinh(x)),
    ("cbrt", jnp.cbrt, fd._d_cbrt, _X_WIDE, 1e-7,
     lambda x: np.where(
         x == 0, np.inf, np.abs(np.where(x == 0, 1.0, x)) ** (-2.0 / 3.0) / 3.0
     )),
    ("log2", jnp.log2, fd._d_log2, np.abs(_X_WIDE) + 1e-9, 1e-9,
     lambda x: 1.0 / (x * np.log(2.0))),
]


@pytest.mark.parametrize(
    "name,ref,dec,grid,rtol,gref", UNARY, ids=[u[0] for u in UNARY]
)
def test_decomposition_matches_original(name, ref, dec, grid, rtol, gref):
    x = jnp.asarray(grid, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(dec(x)), np.asarray(ref(x)), rtol=rtol, atol=1e-300
    )
    g_dec = np.asarray(jax.vmap(jax.grad(lambda v: dec(v)))(x))
    g_true = gref(np.asarray(x))
    mask = np.isfinite(g_true)  # cbrt'(0) = inf on both sides
    # 5e-8 floor: exp-difference forms (cosh' = (e^x - e^-x)/2) cancel a few
    # ulps at |x| ~ 1e-8 — inherent to the composition, immaterial in f32
    np.testing.assert_allclose(g_dec[mask], g_true[mask], rtol=max(rtol, 5e-8))
    assert np.array_equal(np.isfinite(g_dec), mask), f"{name} grad finiteness"


def test_custom_rule_registry_is_exhaustive():
    """eval_decomposed inlines custom_jvp/vjp calls, discarding their
    rules (AD then runs through the decomposed primal). The soundness
    argument — every in-repo rule's primal carries while/scan or a
    pallas_call the admission scan rejects — must be STRUCTURAL, not
    incidental (round-4 review): every jax.custom_jvp/custom_vjp object
    defined in this package must be classified in
    fused_decomp._CUSTOM_RULE_CLASSES. Adding a new rule without deciding
    whether inlining its primal is safe fails here."""
    import importlib
    import pkgutil

    from jax import custom_jvp
    from jax.custom_derivatives import custom_vjp

    import tpu_bijectors

    found = {}
    for m in pkgutil.walk_packages(tpu_bijectors.__path__, "tpu_bijectors."):
        try:
            mod = importlib.import_module(m.name)
        except Exception:
            continue
        for attr, obj in vars(mod).items():
            if isinstance(obj, (custom_jvp, custom_vjp)):
                fn = getattr(obj, "fun", None)
                if fn is not None and getattr(fn, "__module__", "").startswith(
                    "tpu_bijectors"
                ):
                    found[attr] = m.name
    unclassified = sorted(set(found) - set(fd._CUSTOM_RULE_CLASSES))
    assert not unclassified, (
        f"custom rules without an inlining-safety class in "
        f"fused_decomp._CUSTOM_RULE_CLASSES: "
        f"{[(n, found[n]) for n in unclassified]} — decide: 'pallas-primal'"
        f" / 'loop-primal' (admission scan rejects the inlined primal) or"
        f" 'inline-safe' (verified AD-through-primal == rule)"
    )
    # and the registry must not drift stale (names that no longer exist)
    stale = sorted(set(fd._CUSTOM_RULE_CLASSES) - set(found))
    assert not stale, f"stale _CUSTOM_RULE_CLASSES entries: {stale}"


def test_asinh_acosh_f32_overflow_region():
    """Round-4 review regression: the log1p forms compute a*a, which
    overflows f32 past sqrt(floatmax) (~1.8e19) to inf/inf -> NaN while
    lax.asinh/acosh stay finite via their log(2x) branch. The decomps
    must switch to log(x) + log 2 there — value AND tangent (the tangent
    is arbitrated analytically: lax.asinh's own 1/sqrt(x^2+1) rule
    underflows to 0 in this region, ours returns the exact 1/x)."""
    xs = jnp.asarray([1.8e19, 2e19, -2e19, 3.4e38, -3.4e38], jnp.float32)
    va = np.asarray(fd._d_asinh(xs))
    ref = np.asarray(jax.vmap(lax.asinh)(xs))
    np.testing.assert_allclose(va, ref, rtol=1e-6)
    ga = np.asarray(jax.vmap(jax.grad(fd._d_asinh))(xs))
    gref = 1.0 / np.sqrt(np.asarray(xs, np.float64) ** 2 + 1.0)
    # atol floor: at x = 3.4e38 the true 1/x (~2.9e-39) is SUBNORMAL in
    # f32 and flushes to 0 — immaterial; the NaN this test guards against
    # would fail equal_nan-free allclose regardless
    np.testing.assert_allclose(ga, gref, rtol=1e-4, atol=1.2e-38)
    xc = jnp.asarray([2e19, 3.4e38], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fd._d_acosh(xc)), np.asarray(jax.vmap(lax.acosh)(xc)),
        rtol=1e-6,
    )
    gc = np.asarray(jax.vmap(jax.grad(fd._d_acosh))(xc))
    np.testing.assert_allclose(
        gc, 1.0 / np.asarray(xc, np.float64), rtol=1e-4, atol=1.2e-38
    )
    # tangent at 0 stays exact (the unselected log branch must not leak)
    assert float(jax.grad(fd._d_asinh)(jnp.float32(0.0))) == 1.0


def test_decomposition_grad_at_exact_zero():
    """Reflection-based decomps must keep the exact tangent at x == 0 (MAP
    and pathfinder inits are exact zeros; a where/sign formulation that
    zeroes the tangent there would stall those coordinates)."""
    for name, ref, dec in [
        ("asinh", jnp.arcsinh, fd._d_asinh),
        ("expm1", jnp.expm1, fd._d_expm1),
        ("sinh", jnp.sinh, fd._d_sinh),
        ("atanh", jnp.arctanh, fd._d_atanh),
    ]:
        g = float(jax.grad(dec)(0.0))
        assert g == pytest.approx(float(jax.grad(ref)(0.0)), abs=1e-12), name


def test_cumsum_rev_decompositions():
    rng = np.random.default_rng(23)
    for L in (1, 2, 3, 4, 7, 16):
        x = jnp.asarray(rng.standard_normal((5, L)))
        for reverse in (False, True):
            # Hillis-Steele sums in a different association order than the
            # sequential original: bit-identity is not expected, ~eps is
            np.testing.assert_allclose(
                np.asarray(fd._d_cumsum(x, axis=1, reverse=reverse)),
                np.asarray(lax.cumsum(x, axis=1, reverse=reverse)),
                rtol=1e-12, atol=1e-13,
            )
        np.testing.assert_allclose(
            np.asarray(fd._d_rev(x, dimensions=(1,))),
            np.asarray(lax.rev(x, dimensions=(1,))),
            rtol=0,
        )
    # gradient flows through the shift-concat form exactly
    x = jnp.asarray(rng.standard_normal(8))
    g = jax.grad(lambda v: jnp.sum(fd._d_cumsum(v * v, axis=0)))(x)
    np.testing.assert_allclose(
        np.asarray(g),
        np.asarray(jax.grad(lambda v: jnp.sum(jnp.cumsum(v * v)))(x)),
        rtol=1e-14,
    )


def test_decomposed_jaxprs_scan_clean():
    """Tracing each decomposition yields only measured-lowerable prims —
    the same invariant `_pe_split_admit` now enforces on whole bodies."""
    for name, _, dec, grid, _tol, _g in UNARY:
        cj = jax.make_jaxpr(dec)(jnp.asarray(grid[:4], jnp.float32))
        _scan_safe(cj)
        dj = jax.make_jaxpr(
            lambda v: jax.jvp(dec, (v,), (jnp.ones_like(v),))[1]
        )(jnp.asarray(grid[:4], jnp.float32))
        _scan_safe(dj, budget=512)
    cj = jax.make_jaxpr(
        lambda v: fd._d_cumsum(v, axis=0) + fd._d_rev(v, dimensions=(0,))
    )(jnp.zeros(8, jnp.float32))
    _scan_safe(cj)


def test_eval_decomposed_inlines_and_rewrites():
    def f(v, c):
        return jnp.arcsinh(v) + jax.jit(lambda a: jnp.expm1(a))(v) * c

    cj = jax.make_jaxpr(f)(jnp.float32(0.3), jnp.float32(2.0))
    got = fd.eval_decomposed(cj, jnp.float32(0.3), jnp.float32(2.0))[0]
    np.testing.assert_allclose(float(got), float(f(0.3, 2.0)), rtol=1e-6)
    decomposed = jax.make_jaxpr(
        lambda v, c: fd.eval_decomposed(cj, v, c)[0]
    )(jnp.float32(0.3), jnp.float32(2.0))
    _scan_safe(decomposed)  # asinh/expm1 must be gone
    names = {e.primitive.name for e in decomposed.jaxpr.eqns}
    assert "asinh" not in names and "expm1" not in names


def test_admission_asinh_admits_atan_declines():
    """JohnsonSU's asinh-carrying density is admitted via decomposition;
    an atan-carrying body declines (no lowerable composition); a model
    with a declining leaf (SkewNormal: erf-in-v) still evaluates through
    the composed path — plan None, never a compile-time crash."""
    from tpu_bijectors import dists
    from tpu_bijectors.bijectors.base import Identity
    from tpu_bijectors.utils import _eps
    from tpu_bijectors.vectorize import unconstrain
    from tpu_bijectors.vectorize.fused_kernel import _plan_uncached
    from tpu_bijectors.vectorize.fused_traced import (
        _pe_split_admit,
        _traced_scalar_entry,
    )

    js = dists.JohnsonSU(0.1, 1.2, 0.3, 1.1)
    entry = _traced_scalar_entry(js, Identity(), 1, 0, 0)  # must not raise
    assert entry.rows == 1

    p0 = jnp.float32(1.3)
    leaves0, treedef = jax.tree_util.tree_flatten((p0,))
    with pytest.raises(_Unsupported):
        _pe_split_admit(
            leaves0, treedef, lambda v, p: jnp.arctan(v * p[0]), (), (), "jvp"
        )

    d = dists.NamedProduct.of(
        a=dists.SkewNormal(0.0, 1.0, 2.0), b=dists.Normal()
    )
    u = unconstrain(d)
    assert _plan_uncached(u, _eps(jnp.float32)) is None  # declined, no crash
    v = jnp.asarray([0.3, -0.2])
    assert np.isfinite(float(u.linked_logdensity(v[None, :])[0]))
