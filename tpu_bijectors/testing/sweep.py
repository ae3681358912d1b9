"""Distribution-level property sweep: the TPU-native `test_all`.

Port of the reference's shipped harness entry point
(/root/reference/src/vector/test_utils.jl:246-277 — `VectorBijectors.test_all`)
— one call runs the full §4.2 property set against `unconstrain(d)`:

1. roundtrip            — samples: from_vec∘to_vec ≈ id, linked ditto, and
                          inverse logdet == -forward logdet  (:284-312)
2. roundtrip_inverse    — random unconstrained vectors: from_linked_vec lands
                          in-support and to_linked∘from_linked ≈ id (:325-374)
3. trace stability      — the JAX analogue of `@inferred` type stability:
                          `jit(from_linked_vec)` traces exactly once across
                          repeated calls (static shapes, no retrace) (:385-413)
4. static lengths       — vec_length / linked_vec_length match actual shapes
                          without sampling (:480-497)
5. optic sparsity       — non-entangled linked coordinates depend only on
                          their claimed input (AD Jacobian support) (:419-473)
6. logjac vs AD oracle  — linked logdet against slogdet of the jacfwd
                          Jacobian in both directions, using square free
                          charts for dimension-changing links (the reference's
                          to_vec_for_logjac_test shims, :92-244 + :573-633)
7. logpdf consistency   — logpdf(x) - logdetJ == logpdf_with_trans(d, x, true)
8. gradient correctness — jax.grad(linked_logdensity) and grad of the
                          inverse-link logdet vs central differences (the
                          reference's test_ad tier, :639-717) — catches
                          silently-zero gradients in link rules
9. full Jacobian        — jacfwd == jacrev of from_linked_vec (wrong
                          custom transpose rules) and both vs elementwise
                          central differences — localizes a property-8
                          style disagreement to the exact matrix element
                          (reference test_ad compares whole Jacobians per
                          backend, :639-717)

The reference's zero-allocation check (:504-543) has no analogue under XLA
(everything is compiled); its role is covered by check 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dists.base import Distribution
from ..vectorize.core import (
    IIDUnconstrainer,
    LeafUnconstrainer,
    TransformedUnconstrainer,
    TreeUnconstrainer,
    Unconstrainer,
    unconstrain,
)


_KAPPA_CACHE = {}


def _measured_kappa(dtype) -> float:
    """Measure the evaluation-roundoff constant κ (δf ≈ κ·eps·(1+|f|)) of a
    representative linked-density transcendental chain on the CURRENT
    backend at sweep start, replacing the one-off v5e constant 64 (VERDICT
    r4 weak-3: a different chip or a hotter chain would silently get the
    wrong FD bar). Method = tools/namedproduct_grad_probe.py's separation:
    central differences at h = √eps, where truncation error is O(eps)
    (negligible) while evaluation roundoff contributes |FD−AD| ≈ δf/h —
    so κ ≈ max_i |FD_i − g_i| · h / (eps · (1+|f|)). The probe chain is
    the sweep's own hottest mixed model (Normal + Dirichlet + LKJ).
    Clamped to [16, 4096] (16 keeps a margin above pure-arithmetic chains;
    the cap bounds the bar if a backend misbehaves so badly the sweep
    should fail instead). Cached per (backend, dtype); printed once so
    every sweep log records the bar it used."""
    key = (jax.default_backend(), jnp.dtype(dtype).name)
    if key in _KAPPA_CACHE:
        return _KAPPA_CACHE[key]
    from .. import dists

    d = dists.NamedProduct.of(
        mu=dists.Normal(), w=dists.Dirichlet(jnp.ones(4)), c=dists.LKJ(3, 2.0)
    )
    u = unconstrain(d)
    dim = u.linked_vec_length
    rng = np.random.default_rng(23)
    y = jnp.asarray(rng.standard_normal(dim) * 0.3, dtype)
    eps = float(jnp.finfo(dtype).eps)
    h = eps**0.5
    g = np.asarray(
        jax.grad(lambda v: jnp.sum(u.linked_logdensity(v)))(y), np.float64
    )
    E = jnp.eye(dim, dtype=dtype) * h
    fd = np.asarray(
        (u.linked_logdensity(y + E) - u.linked_logdensity(y - E)) / (2.0 * h),
        np.float64,
    )
    f0 = 1.0 + abs(float(jnp.max(jnp.abs(u.linked_logdensity(y[None, :])))))
    kappa = float(np.abs(fd - g).max() * h / (eps * f0))
    kappa = min(max(kappa, 16.0), 4096.0)
    print(
        f"[sweep] measured FD noise kappa={kappa:.1f} "
        f"(backend={key[0]}, dtype={key[1]})"
    )
    _KAPPA_CACHE[key] = kappa
    return kappa


def _free_chart(u: Unconstrainer, x):
    """Sample -> free coordinates with dim == linked_vec_length (square-
    Jacobian trick). Returns None when no valid chart exists (the AD logjac
    check is then skipped for this distribution)."""
    from ..utils import tril_to_vec, triu_to_vec

    if isinstance(u, LeafUnconstrainer):
        kind = u.dist.support.kind
        if kind == "simplex":
            return u.to_vec(x)[..., :-1]
        if kind == "corr":
            return triu_to_vec(x, k=1)
        if kind == "pd":
            return tril_to_vec(x)
        if kind == "chol_corr":
            mode = getattr(u.dist, "mode", "L")
            return tril_to_vec(x, k=1) if mode == "L" else triu_to_vec(x, k=1)
        v = u.to_vec(x)
        if v.shape[-1] != u.linked_vec_length:
            return None  # unknown dimension-changing link
        return v
    if isinstance(u, IIDUnconstrainer):
        inner = _free_chart(u.inner, x)  # broadcasts over the leading block axis
        if inner is None:
            return None
        return jnp.reshape(inner, inner.shape[:-2] + (-1,))
    if isinstance(u, TreeUnconstrainer):
        parts = []
        items = list(x) if u.names is None else [x[n] for n in u.names]
        for c, xi in zip(u.children, items):
            p = _free_chart(c, xi)
            if p is None:
                return None
            parts.append(p)
        return jnp.concatenate(parts, axis=-1)
    if isinstance(u, TransformedUnconstrainer):
        # only valid when the whole path is dimension-preserving: the ravel
        # chart's logdet then matches the reported (base + transform) logdet
        if u.vec_length != u.linked_vec_length:
            return None
        return u.to_vec(x)
    return None


def _check_in_support(u: Unconstrainer, x, atol=None):
    if atol is None:
        dt = jax.tree_util.tree_leaves(x)[0].dtype
        atol = max(1e-6, 2e3 * float(jnp.finfo(dt).eps))  # ~2.4e-4 in f32
    if isinstance(u, LeafUnconstrainer):
        ok = u.dist.in_support(x, atol)
        return bool(jnp.all(ok))
    if isinstance(u, IIDUnconstrainer):
        return _check_in_support(u.inner, x, atol)
    if isinstance(u, TreeUnconstrainer):
        items = list(x) if u.names is None else [x[n] for n in u.names]
        return all(_check_in_support(c, xi, atol) for c, xi in zip(u.children, items))
    if isinstance(u, TransformedUnconstrainer):
        return True  # support of a transformed dist is the transform's image
    return True


def _tree_allclose(a, b, atol, rtol=1e-7):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=rtol)


def _leaf_ranges(u, vo: int = 0, lo: int = 0):
    """[(vec_start, vec_len, linked_start, linked_len)] per leaf, in order."""
    from ..vectorize.core import IIDUnconstrainer, TreeUnconstrainer

    if isinstance(u, IIDUnconstrainer):
        out = []
        for i in range(u.n):
            out.extend(
                _leaf_ranges(
                    u.inner,
                    vo + i * u.inner.vec_length,
                    lo + i * u.inner.linked_vec_length,
                )
            )
        return out
    if isinstance(u, TreeUnconstrainer):
        out = []
        for c, (s, _), (ls, _) in zip(u.children, u.offsets, u.linked_offsets):
            out.extend(_leaf_ranges(c, vo + s, lo + ls))
        return out
    return [(vo, u.vec_length, lo, u.linked_vec_length)]


def test_all(
    d: Distribution,
    *,
    seed: int = 23,
    n_roundtrip: int = 32,
    n_inverse: int = 16,
    inverse_scale: float = 1.0,
    atol: float = 1e-7,
    check_logjac_ad: bool = True,
    check_optics: bool = True,
    check_logpdf: bool = True,
    check_grad: bool = True,
    skip=(),
):
    """Run the full property sweep on distribution `d`. Raises on failure."""
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    u = unconstrain(d)
    discrete = getattr(d, "support", None) is not None and d.support.kind == "discrete"

    # dtype-aware tolerances: f64 keeps the reference's ~1e-5/1e-6 bars
    # (test_utils.jl:251-254); f32 (the TPU performance mode) scales by eps
    eps = float(jnp.finfo(jnp.result_type(float)).eps)
    rt_tol = max(100.0 * atol, 1e3 * eps)  # 1e-5 in f64, ~1.2e-4 in f32
    ld_tol = max(10.0 * atol, 1e3 * eps)  # 1e-6 in f64

    # 4. static lengths (checked first — later tests rely on them)
    assert isinstance(u.vec_length, int) and isinstance(u.linked_vec_length, int)

    # 1. roundtrip on real samples
    if "roundtrip" not in skip:
        x = d.sample(key, (n_roundtrip,))
        v = u.to_vec(x)
        assert v.shape[-1] == u.vec_length, (v.shape, u.vec_length)
        _tree_allclose(u.from_vec(v), x, atol=atol)
        lv, ld = u.to_linked_vec(x)
        assert lv.shape[-1] == u.linked_vec_length
        assert jnp.shape(ld) == jnp.shape(lv)[:-1]
        x_rt, ld_inv = u.from_linked_vec(lv)
        if discrete:
            # identity link: exact round-trip, logdet 0
            _tree_allclose(x_rt, x, atol=0)
            np.testing.assert_allclose(np.asarray(ld), 0.0)
        else:
            _tree_allclose(x_rt, x, atol=rt_tol, rtol=rt_tol)
            np.testing.assert_allclose(
                np.asarray(ld_inv), -np.asarray(ld), atol=ld_tol, rtol=ld_tol
            )

    # 2. inverse roundtrip from random unconstrained + in-support
    if "inverse" not in skip and not discrete:
        y = jnp.asarray(rng.standard_normal((n_inverse, u.linked_vec_length)) * inverse_scale)
        xs, ld = u.from_linked_vec(y)
        assert _check_in_support(u, xs), f"from_linked_vec left support for {type(d).__name__}"
        y_rt, ld2 = u.to_linked_vec(xs)
        np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=rt_tol, rtol=rt_tol)
        np.testing.assert_allclose(np.asarray(ld2), -np.asarray(ld), atol=ld_tol, rtol=ld_tol)

    # 3. trace stability: jit compiles once, no retrace on second call
    if "trace" not in skip and not discrete:
        traces = 0

        def f(v):
            nonlocal traces
            traces += 1
            return u.from_linked_vec(v)

        jf = jax.jit(f)
        y0 = jnp.zeros(u.linked_vec_length)
        jax.block_until_ready(jf(y0)[1])
        jax.block_until_ready(jf(y0 + 0.1)[1])
        assert traces == 1, f"from_linked_vec retraced ({traces} traces)"

    # 5. optic provenance + Jacobian-support sparsity (reference
    # test_utils.jl:419-473): runs for EVERY non-discrete case, including
    # dim-changing and entangled leaves — J is rectangular
    # (linked_len, vec_len), evaluated at a valid sample.
    if check_optics and "optics" not in skip and not discrete:
        ov = u.optic_vec()
        lov = u.linked_optic_vec()
        assert len(ov) == u.vec_length
        assert len(lov) == u.linked_vec_length
        y = jnp.asarray(rng.standard_normal(u.linked_vec_length) * 0.3)
        xs, _ = u.from_linked_vec(y)
        xvec = np.asarray(u.to_vec(xs))
        # (a) plain optics extract exactly their vec element
        for j, o in enumerate(ov):
            np.testing.assert_allclose(
                np.asarray(o.get(xs)), xvec[j], rtol=1e-12,
                err_msg=f"optic_vec[{j}]={o} does not address to_vec slot {j}",
            )
        # (b) linked provenance: row i of d(to_linked_vec)/d(vec) may only
        # touch the matching column (named optic) or its own leaf's columns
        # (None = entangled within the leaf)
        J = np.asarray(
            jax.jacfwd(lambda vv: u.to_linked_vec(u.from_vec(vv))[0])(
                jnp.asarray(xvec)
            )
        )
        tol = 1e-9 * max(1.0, np.abs(J).max())
        ranges = _leaf_ranges(u)
        for i, lo_i in enumerate(lov):
            vs, vl = next(
                (vs, vl) for vs, vl, ls, ll in ranges if ls <= i < ls + ll
            )
            support = set(np.nonzero(np.abs(J[i]) > tol)[0].tolist())
            if lo_i is None:
                assert support <= set(range(vs, vs + vl)), (
                    f"entangled linked slot {i} leaks outside its leaf: "
                    f"support={sorted(support)} leaf=[{vs},{vs + vl})"
                )
            else:
                j = ov.index(lo_i)
                assert support <= {j}, (
                    f"linked slot {i} claims sole dependence on {lo_i} "
                    f"(col {j}) but depends on {sorted(support)}"
                )

    # 6. logjac vs AD Jacobian oracle, both directions
    if check_logjac_ad and "logjac" not in skip and not discrete:
        y = jnp.asarray(rng.standard_normal(u.linked_vec_length) * 0.3 * inverse_scale)
        x0, ld0 = u.from_linked_vec(y)
        chart = _free_chart(u, x0)
        if chart is not None:

            def fwd(yv):
                xs, _ = u.from_linked_vec(yv)
                return _free_chart(u, xs)

            J = jax.jacfwd(fwd)(y)
            _, logdet = jnp.linalg.slogdet(J)
            np.testing.assert_allclose(
                np.asarray(logdet), np.asarray(ld0), atol=ld_tol, rtol=ld_tol,
                err_msg="from_linked logdet != slogdet(AD Jacobian)",
            )

    # 8. gradient of the linked logdensity (and of the inverse-link logdet)
    # vs central differences — the reference's `test_ad` tier checks every
    # backend's ∇logJ against a ForwardDiff oracle for the whole case matrix
    # (/root/reference/src/vector/test_utils.jl:639-717). This is the
    # property that catches silently-zero gradients (e.g. a quantile link
    # without an implicit-diff rule).
    #
    # FD step/tolerance model (round 4, KNOWN_BROKEN.md R3-2): the FD side
    # carries EVALUATION roundoff δf ≈ κ·eps·(1 + |f|) with κ ≈ 64 measured
    # on the v5e (TPU transcendental chains run ~10-100 ulps hotter than
    # CPU — tools/namedproduct_grad_probe.py pinned a 9.2%-relative FD
    # excursion at h = eps^(1/3) while f32 AD matched the f64 oracle to
    # 1e-7). h* = (κ eps (1+|f|))^(1/3) balances truncation against δf/h,
    # and the bound carries the matching roundoff floor 2(κ eps (1+|f|))^(2/3).
    # In f64 both terms sit far below the 1e-6 gtol floor — the CPU suite's
    # rigor is unchanged; only the f32 hardware tier gets an honest bar.
    if check_grad and "grad" not in skip and not discrete:
        y = jnp.asarray(
            rng.standard_normal(u.linked_vec_length) * 0.3 * inverse_scale
        )
        dim = u.linked_vec_length
        kappa = _measured_kappa(y.dtype)
        gtol = max(1e-6, 200.0 * eps ** (2.0 / 3.0))
        for name, f in (
            ("linked_logdensity", u.linked_logdensity),
            ("inverse logdet", lambda v: u.from_linked_vec(v)[1]),
        ):
            f0 = 1.0 + abs(float(jnp.max(jnp.abs(f(y[None, :])))))
            h = (kappa * eps * f0) ** (1.0 / 3.0)
            fd_floor = 2.0 * (kappa * eps * f0) ** (2.0 / 3.0)
            E = jnp.eye(dim, dtype=y.dtype) * h
            g = np.asarray(jax.grad(lambda v: jnp.sum(f(v)))(y))
            fd = np.asarray((f(y + E) - f(y - E)) / (2.0 * h))
            scale = 1.0 + np.abs(fd).max()
            np.testing.assert_allclose(
                g, fd, atol=gtol * scale + fd_floor, rtol=gtol,
                err_msg=(
                    f"grad({name}) disagrees with central differences for "
                    f"{type(d).__name__} (zero-gradient link rule missing?)"
                ),
            )

    # 9. full per-element Jacobian of the inverse link: jacfwd == jacrev
    # (catches a wrong custom transpose/VJP even where the summed gradient
    # of property 8 cancels) and both match central differences elementwise
    # — the reference's test_ad compares whole Jacobians per backend
    # (/root/reference/src/vector/test_utils.jl:639-717). Localizes a
    # disagreement to the (output element, input element) pair.
    if check_grad and "jacobian" not in skip and not discrete:
        y = jnp.asarray(
            rng.standard_normal(u.linked_vec_length) * 0.3 * inverse_scale
        )
        dim = u.linked_vec_length

        def gvec(v):
            return u.to_vec(u.from_linked_vec(v)[0])

        Jf = np.asarray(jax.jacfwd(gvec)(y))
        Jr = np.asarray(jax.jacrev(gvec)(y))
        np.testing.assert_allclose(
            Jf, Jr, atol=max(1e-12, 10.0 * eps) * (1.0 + np.abs(Jf).max()),
            rtol=100.0 * eps,
            err_msg=(
                f"jacfwd != jacrev of from_linked_vec for {type(d).__name__}"
                " (wrong custom transpose rule?)"
            ),
        )
        kappa = _measured_kappa(y.dtype)
        f0 = 1.0 + float(np.abs(np.asarray(gvec(y))).max())
        h = (kappa * eps * f0) ** (1.0 / 3.0)
        fd_floor = 2.0 * (kappa * eps * f0) ** (2.0 / 3.0)
        gtol = max(1e-6, 200.0 * eps ** (2.0 / 3.0))
        E = jnp.eye(dim, dtype=y.dtype) * h
        Jfd = np.asarray((gvec(y + E) - gvec(y - E)) / (2.0 * h)).T
        np.testing.assert_allclose(
            Jf, Jfd, atol=gtol * (1.0 + np.abs(Jfd).max()) + fd_floor,
            rtol=gtol,
            err_msg=(
                f"AD Jacobian of from_linked_vec disagrees with central "
                f"differences for {type(d).__name__}"
            ),
        )

    # 7. logpdf_with_trans consistency through the unconstrainer
    if check_logpdf and "logpdf" not in skip and not discrete and isinstance(u, LeafUnconstrainer):
        from ..registry import logpdf_with_trans

        x = d.sample(jax.random.PRNGKey(seed + 1))
        _, ld = u.to_linked_vec(x)
        lp = d.logpdf(x)
        if jnp.ndim(lp) > 0:
            lp = jnp.sum(lp)  # scalar-event dists return elementwise logpdf
        np.testing.assert_allclose(
            float(lp - ld),
            float(logpdf_with_trans(d, x, True)),
            atol=ld_tol,
            rtol=ld_tol,
        )

    return True


test_all.__test__ = False  # it IS the harness, not a pytest case
