"""Transposed (dim, batch) linked_logdensity_t — the TPU-native serving
orientation (batch on lanes end to end; vectorize/core.py docstrings).

CPU checks: semantic equality with the batch-major path across structure
kinds (scalar/IID/Tree/Transformed/factor-fused leaves), gradient equality
through the transposed custom_jvp rules (which take the jnp primal branch
off-TPU), and interpret-mode equivalence of the pre_t kernel variants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.vectorize import unconstrain


def _models():
    return {
        "scalars": dists.NamedProduct.of(
            mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 5),
            sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 3),
            p=dists.Beta(2.0, 3.0),
        ),
        "bench": dists.NamedProduct.of(
            mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 4),
            sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 4),
            w=dists.Dirichlet(jnp.ones(6)),
            corr=dists.LKJ(5, 2.0),
        ),
        "matrixy": dists.NamedProduct.of(
            chol=dists.LKJCholesky(4, 1.5),
            wish=dists.Wishart(7.0, jnp.eye(4)),
            iwish=dists.InverseWishart(7.0, jnp.eye(4)),
        ),
        "nested": dists.Product(
            (
                dists.Dirichlet(jnp.ones(4)),
                dists.NamedProduct.of(
                    a=dists.Gamma(2.0, 1.0), b=dists.Uniform(-1.0, 2.0)
                ),
            )
        ),
        "iid_mv": dists.IIDProduct(dists.Dirichlet(jnp.ones(4)), 3),
    }


@pytest.mark.parametrize("name", list(_models().keys()))
def test_linked_logdensity_t_matches(rng, name):
    d = _models()[name]
    u = unconstrain(d)
    v = jnp.asarray(0.7 * rng.standard_normal((17, u.linked_vec_length)))
    lp = u.linked_logdensity(v)
    lp_t = u.linked_logdensity_t(v.T)
    np.testing.assert_allclose(np.asarray(lp_t), np.asarray(lp), rtol=1e-12)


def test_linked_logdensity_t_jitted(rng):
    d = _models()["bench"]
    u = unconstrain(d)
    v = jnp.asarray(0.5 * rng.standard_normal((9, u.linked_vec_length)))
    lp = jax.jit(lambda vT: unconstrain(d).linked_logdensity_t(vT))(v.T)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(u.linked_logdensity(v)), rtol=1e-12)


def test_transposed_wrappers_grads_match(rng):
    """jax.grad through the _t custom_jvp wrappers (jnp primal branch on
    CPU) vs grad of the batch-major jnp references."""
    from tpu_bijectors.bijectors.corr import (
        _chol_logdet_jnp,
        _lkj_logdet_pallas_t,
        _vec_corr_logdet_jnp,
    )

    K, P = 5, 10
    yT = jnp.asarray(1.1 * rng.standard_normal((P, 8)))
    w = jnp.asarray(rng.standard_normal((8, K)))
    for chol, ref in ((False, _vec_corr_logdet_jnp), (True, _chol_logdet_jnp)):

        def f_t(yT):
            lj, ldw = _lkj_logdet_pallas_t(yT, K, chol)
            return jnp.sum(lj) + jnp.sum(w * ldw)

        def f_ref(yT):
            lj, ldw = ref(yT.T)
            return jnp.sum(lj) + jnp.sum(w * ldw)

        np.testing.assert_allclose(
            jax.grad(f_t)(yT), jax.grad(f_ref)(yT), rtol=1e-9, atol=1e-11
        )

    from tpu_bijectors.bijectors.simplex import (
        _simplex_inverse_logdet_wlog_jnp,
        simplex_logdet_wlog_nox_t,
    )

    K = 6
    yT = jnp.asarray(1.3 * rng.standard_normal((K - 1, 8)))
    am1 = jnp.asarray(rng.uniform(0.5, 3.0, K))

    def g_t(yT, am1):
        ld, wl = simplex_logdet_wlog_nox_t(yT, am1)
        return jnp.sum(ld) + 2.0 * jnp.sum(wl)

    def g_ref(yT, am1):
        _, ld, wl = _simplex_inverse_logdet_wlog_jnp(yT.T, am1)
        return jnp.sum(ld) + 2.0 * jnp.sum(wl)

    for fn_t, fn_r in ((g_t, g_ref),):
        gy, ga = jax.grad(fn_t, argnums=(0, 1))(yT, am1)
        gyr, gar = jax.grad(fn_r, argnums=(0, 1))(yT, am1)
        np.testing.assert_allclose(gy, gyr, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(ga, gar, rtol=1e-9, atol=1e-11)

    from tpu_bijectors.bijectors.pd import _pd_logdensity_jnp, _pd_logdensity_pallas_t

    K, P = 4, 10
    yT = jnp.asarray(0.5 * rng.standard_normal((P, 8)))
    Cm = rng.standard_normal((K, K))
    for mode, C in (("dot", jnp.asarray(Cm @ Cm.T)), ("solve", jnp.asarray(np.tril(Cm)))):

        def h_t(yT, C):
            lj, sd, tr = _pd_logdensity_pallas_t(yT, K, C, mode)
            return jnp.sum(lj) + jnp.sum(sd) - 0.5 * jnp.sum(tr)

        def h_ref(yT, C):
            lj, sd, tr = _pd_logdensity_jnp(yT.T, C, mode)
            return jnp.sum(lj) + jnp.sum(sd) - 0.5 * jnp.sum(tr)

        gy, gC = jax.grad(h_t, argnums=(0, 1))(yT, C)
        gyr, gCr = jax.grad(h_ref, argnums=(0, 1))(yT, C)
        np.testing.assert_allclose(gy, gyr, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(gC, gCr, rtol=1e-9, atol=1e-11)


def _mega_model():
    return dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(0.5, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.1, 0.5), 4),
        g=dists.Gamma(2.0, 1.5),
        e=dists.Exponential(0.8),
        ig=dists.InverseGamma(3.0, 2.0),
        w=dists.Dirichlet(jnp.ones(7) * 1.3),
        corr=dists.LKJ(6, 2.0),
        lc=dists.LKJCholesky(5, 1.5),
        wish=dists.Wishart(8.0, jnp.eye(5)),
        iwish=dists.InverseWishart(8.0, jnp.eye(4)),
        # every remaining kernel-supported scalar family, incl. IID blocks
        t=dists.StudentT(4.5, 0.3, 1.7),
        c=dists.Cauchy(-0.4, 0.9),
        lap=dists.IIDProduct(dists.Laplace(0.2, 1.3), 3),
        lo=dists.Logistic(0.1, 0.8),
        gu=dists.Gumbel(-0.3, 1.1),
        hn=dists.HalfNormal(1.4),
        hc=dists.HalfCauchy(0.7),
        wb=dists.Weibull(1.8, 2.1),
        chi=dists.Chi(3.0),
        ray=dists.Rayleigh(1.2),
        fr=dists.Frechet(2.3, 1.4),
        b=dists.IIDProduct(dists.Beta(2.5, 1.6), 2),
        un=dists.Uniform(-2.0, 5.0),
        ln=dists.LogitNormal(0.2, 0.9),
        par=dists.Pareto(2.2, 1.5),
        lv=dists.Levy(0.4, 1.3),
        # per-row-independent multivariates -> slab rows (exact same algebra)
        mvd=dists.MvNormalDiag(jnp.asarray([0.3, -0.2, 1.1]), jnp.asarray([0.8, 1.4, 0.5])),
        mvln=dists.MvLogNormal(jnp.asarray([0.1, -0.4]), jnp.asarray([0.6, 1.2])),
        # arraydist: per-element-parameter slab coefficients
        ad=dists.arraydist(dists.Normal(jnp.asarray([-1.0, 0.0, 2.0]), jnp.asarray([0.5, 1.0, 2.0]))),
        adg=dists.arraydist(dists.Gamma(jnp.asarray([2.0, 3.5]), jnp.asarray([1.0, 0.7]))),
        # IID blocks of STRUCTURED leaves: shifted-row copies sharing one
        # params block (slab copies: LKJ; loop copies: Dirichlet, Wishart)
        iidc=dists.IIDProduct(dists.LKJ(3, 1.5), 2),
        iidd=dists.IIDProduct(dists.Dirichlet(jnp.asarray([1.3, 2.0, 0.8, 1.1])), 2),
        iidw=dists.IIDProduct(dists.Wishart(6.0, jnp.eye(3)), 2),
        # transformed(d) telescopes to its base's rows
        td=tb.transformed(dists.Beta(2.0, 3.0)),
    )


def _mega_model_mv(rng):
    """Dense-covariance multivariate leaves (loop entries: triangular matvec
    against the host-precomputed L^-1 / chol(J)^T)."""
    A = np.tril(rng.standard_normal((4, 4)) * 0.3) + 2.0 * np.eye(4)
    J = A @ A.T
    return dists.NamedProduct.of(
        mvt3=dists.MvNormalTril(
            jnp.asarray([0.5, -1.0, 0.2]),
            jnp.asarray([[1.3, 0.0, 0.0], [0.4, 0.9, 0.0], [-0.2, 0.3, 1.6]]),
        ),
        mu=dists.Normal(0.0, 1.5),
        canon=dists.MvNormalCanon(jnp.asarray([0.2, -0.1, 0.4, 0.0]), jnp.asarray(J)),
        t=dists.MvStudentT(
            5.0,
            jnp.asarray([0.1, -0.3]),
            jnp.asarray([[1.1, 0.0], [0.5, 0.7]]),
        ),
        w=dists.Dirichlet(jnp.ones(4)),
    )


def test_mega_kernel_interpret_matches_composed(rng):
    """The whole-model fused kernel == the composed per-leaf path, across
    every supported leaf kind (interpret mode; machine precision — same
    eps algebra)."""
    from tpu_bijectors.vectorize.fused_kernel import mega_logdensity_t

    d = _mega_model()
    u = unconstrain(d)
    v = jnp.asarray(0.6 * rng.standard_normal((137, u.linked_vec_length)))
    ref = np.asarray(u._linked_logdensity_t_children(v.T))
    got = np.asarray(mega_logdensity_t(u, v.T, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-13, atol=1e-12)


def test_mega_kernel_mv_leaves(rng):
    """Dense multivariate normal/t leaves (MvNormalTril / MvNormalCanon /
    MvStudentT): value, JVP, and VJP kernels vs the composed path. The
    kernel contracts against a host-precomputed triangular inverse, so
    agreement is to solve-vs-explicit-inverse rounding, not bitwise."""
    from tpu_bijectors.vectorize.fused_kernel import (
        _mega_diffable,
        mega_jvp_t,
        mega_logdensity_t,
        mega_vjp_t,
    )

    d = _mega_model_mv(rng)
    u = unconstrain(d)
    dim = u.linked_vec_length
    vT = jnp.asarray(0.6 * rng.standard_normal((19, dim))).T
    dvT = jnp.asarray(rng.standard_normal((19, dim))).T
    gbar = jnp.asarray(rng.standard_normal(19))

    f = lambda vT: u._linked_logdensity_t_children(vT)
    np.testing.assert_allclose(
        np.asarray(mega_logdensity_t(u, vT, interpret=True)),
        np.asarray(f(vT)), rtol=1e-11, atol=1e-11,
    )
    _, dlp_ref = jax.jvp(f, (vT,), (dvT,))
    np.testing.assert_allclose(
        np.asarray(mega_jvp_t(u, vT, dvT, interpret=True)),
        np.asarray(dlp_ref), rtol=1e-9, atol=1e-10,
    )
    _, vjp = jax.vjp(f, vT)
    np.testing.assert_allclose(
        np.asarray(mega_vjp_t(u, vT, gbar, interpret=True)),
        np.asarray(vjp(gbar)[0]), rtol=1e-9, atol=1e-10,
    )
    # grad through the custom_jvp wrapper, in vT and in the dist params
    g1 = jax.grad(lambda vT: jnp.sum(_mega_diffable(u, vT)))(vT)
    g2 = jax.grad(lambda vT: jnp.sum(f(vT)))(vT)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9, atol=1e-10)
    gu1 = jax.grad(lambda u: jnp.sum(_mega_diffable(u, vT)))(u)
    gu2 = jax.grad(lambda u: jnp.sum(u._linked_logdensity_t_children(vT)))(u)
    for a, b in zip(jax.tree_util.tree_leaves(gu1), jax.tree_util.tree_leaves(gu2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-9)


def test_mega_kernel_truncated_leaves(rng):
    """Truncated scalar leaves (traced per-row loop entries with the
    hoisted cdf normalizer): value/JVP/VJP kernels vs the composed path,
    all three interval branch kinds + an IID block, and decline for a
    non-whitelisted base / traced link bounds."""
    from tpu_bijectors.vectorize.fused_kernel import (
        _plan,
        mega_jvp_t,
        mega_logdensity_t,
        mega_vjp_t,
    )

    d = dists.NamedProduct.of(
        tn=dists.Truncated(dists.Normal(0.3, 1.2), lower=-0.5, upper=2.0),
        tlo=dists.Truncated(dists.Cauchy(0.0, 1.0), lower=0.4),
        thi=dists.Truncated(dists.Gumbel(0.1, 0.9), upper=1.5),
        iid=dists.IIDProduct(
            dists.Truncated(dists.Logistic(0.0, 0.7), lower=-1.0, upper=1.0), 3
        ),
        tln=dists.Truncated(dists.LogNormal(0.2, 0.6), upper=3.0),
        mu=dists.Normal(0.0, 2.0),
    )
    u = unconstrain(d)
    dim = u.linked_vec_length
    vT = jnp.asarray(0.8 * rng.standard_normal((21, dim))).T
    dvT = jnp.asarray(rng.standard_normal((21, dim))).T
    gbar = jnp.asarray(rng.standard_normal(21))

    f = lambda vT: u._linked_logdensity_t_children(vT)
    np.testing.assert_allclose(
        np.asarray(mega_logdensity_t(u, vT, interpret=True)),
        np.asarray(f(vT)), rtol=1e-12, atol=1e-12,
    )
    _, dlp_ref = jax.jvp(f, (vT,), (dvT,))
    np.testing.assert_allclose(
        np.asarray(mega_jvp_t(u, vT, dvT, interpret=True)),
        np.asarray(dlp_ref), rtol=1e-9, atol=1e-10,
    )
    _, vjp = jax.vjp(f, vT)
    np.testing.assert_allclose(
        np.asarray(mega_vjp_t(u, vT, gbar, interpret=True)),
        np.asarray(vjp(gbar)[0]), rtol=1e-9, atol=1e-10,
    )
    # truncated StudentT is ALSO eligible (gammaln normalizer hoisted by
    # partial eval; v-part is log1p-safe) — covered by the generic sweep;
    # an erf-in-v base (SkewNormal) declines
    d_bad = dists.NamedProduct.of(
        t=dists.Truncated(dists.SkewNormal(0.0, 1.0, 2.0), lower=0.0)
    )
    assert _plan(unconstrain(d_bad), 1e-16) is None


def test_mega_generic_scalar_families_match_composed(rng):
    """The generic traced scalar entry auto-whitelists families by
    partial-eval + jaxpr-primitive scan; EVERY family it accepts from the
    full univariate matrix must match the composed path (value and vjp).
    Declined families must still route through the composed fallback.
    This is the safety net for auto-acceptance: a semantics mismatch in
    any traced family fails here, not in a user's model."""
    from test_all_matrix import _univariates

    from tpu_bijectors.vectorize.fused_kernel import (
        _plan,
        mega_logdensity_t,
        mega_vjp_t,
    )

    accepted, declined = [], []
    for d0 in _univariates():
        d = dists.NamedProduct.of(x=d0, y=dists.Normal(0.0, 2.0))
        u = unconstrain(d)
        name = type(d0).__name__
        if _plan(u, 1e-16) is None:
            declined.append(name)
            continue
        accepted.append(name)
        dim = u.linked_vec_length
        vT = jnp.asarray(0.7 * rng.standard_normal((48, dim))).T
        f = lambda vT: u._linked_logdensity_t_children(vT)
        ref = np.asarray(f(vT))
        got = np.asarray(mega_logdensity_t(u, vT, interpret=True))
        fin = np.isfinite(ref)
        np.testing.assert_allclose(
            got[fin], ref[fin], rtol=1e-10, atol=1e-10, err_msg=name
        )
        # composed -inf (out-of-support mixture/discrete rows) must stay
        # nonpositive-infinite in the kernel too, never NaN
        assert not np.any(np.isnan(got)), name
        gbar = jnp.asarray(rng.standard_normal(48))
        _, vjp = jax.vjp(f, vT)
        dv_ref = np.asarray(vjp(gbar)[0])
        dv = np.asarray(mega_vjp_t(u, vT, gbar, interpret=True))
        m = np.isfinite(dv_ref) & np.broadcast_to(fin, dv_ref.shape)
        np.testing.assert_allclose(
            dv[m], dv_ref[m], rtol=1e-8, atol=1e-9, err_msg=name
        )
    # the mechanism must actually accept a broad set and decline the
    # special-function/series families
    for must in ("Kumaraswamy", "Arcsine", "BetaPrime", "InverseGaussian",
                 "TriangularDist", "JohnsonSU", "Truncated"):
        assert must in accepted, (must, accepted)
    for must_not in ("SkewNormal", "NoncentralChisq", "Rician",
                     "StudentizedRange"):
        assert must_not in declined, (must_not, declined)


def test_mega_generic_vector_leaves(rng):
    """Small vector leaves with no hand-written kernel form go through the
    generic traced VECTOR entry (partial-eval + primitive scan; partials
    from one reverse pass): JointOrderStatistics' ordered link (cumsum/rev
    recurrences) is the canonical case. Matrix-solve leaves (MatrixNormal)
    must decline (triangular_solve is not Mosaic-whitelisted)."""
    from tpu_bijectors.vectorize.fused_kernel import (
        _plan,
        mega_jvp_t,
        mega_logdensity_t,
        mega_vjp_t,
    )

    d = dists.NamedProduct.of(
        jo=dists.JointOrderStatistics(dists.Normal(0.2, 1.3), 4),
        jg=dists.JointOrderStatistics(dists.Gamma(2.0, 1.0), 3),
        mu=dists.Normal(0.0, 2.0),
    )
    u = unconstrain(d)
    assert _plan(u, 1e-16) is not None
    dim = u.linked_vec_length
    vT = jnp.asarray(0.6 * rng.standard_normal((15, dim))).T
    dvT = jnp.asarray(rng.standard_normal((15, dim))).T
    gbar = jnp.asarray(rng.standard_normal(15))
    f = lambda vT: u._linked_logdensity_t_children(vT)
    np.testing.assert_allclose(
        np.asarray(mega_logdensity_t(u, vT, interpret=True)),
        np.asarray(f(vT)), rtol=1e-12, atol=1e-12,
    )
    _, dlp_ref = jax.jvp(f, (vT,), (dvT,))
    np.testing.assert_allclose(
        np.asarray(mega_jvp_t(u, vT, dvT, interpret=True)),
        np.asarray(dlp_ref), rtol=1e-9, atol=1e-10,
    )
    _, vjp = jax.vjp(f, vT)
    np.testing.assert_allclose(
        np.asarray(mega_vjp_t(u, vT, gbar, interpret=True)),
        np.asarray(vjp(gbar)[0]), rtol=1e-9, atol=1e-10,
    )
    d_bad = dists.NamedProduct.of(
        mn=dists.MatrixNormal(jnp.zeros((2, 3)), jnp.eye(2), jnp.eye(3))
    )
    assert _plan(unconstrain(d_bad), 1e-16) is None


def test_mega_kernel_declines_unsupported(rng):
    """Unsupported leaves (e.g. SkewNormal) -> plan None -> composed
    fallback."""
    from tpu_bijectors.vectorize.fused_kernel import _plan

    d = dists.NamedProduct.of(
        a=dists.Normal(0.0, 1.0), p=dists.SkewNormal(0.0, 1.0, 2.0)
    )
    assert _plan(unconstrain(d), 1e-16) is None
    # and the public path still works
    u = unconstrain(d)
    v = jnp.asarray(rng.standard_normal((9, u.linked_vec_length)))
    np.testing.assert_allclose(
        np.asarray(u.linked_logdensity_t(v.T)),
        np.asarray(u.linked_logdensity(v)),
        rtol=1e-12,
    )


def test_mega_diffable_grad_matches(rng):
    """grad through the mega custom_jvp (composed primal branch on CPU)
    == grad of the composed path, in vT AND in the distribution params."""
    from tpu_bijectors.vectorize.fused_kernel import _mega_diffable

    d = _mega_model()
    u = unconstrain(d)
    vT = jnp.asarray(0.5 * rng.standard_normal((13, u.linked_vec_length))).T

    g1 = jax.grad(lambda vT: jnp.sum(_mega_diffable(u, vT)))(vT)
    g2 = jax.grad(lambda vT: jnp.sum(u._linked_logdensity_t_children(vT)))(vT)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9, atol=1e-11)

    gu1 = jax.grad(lambda u: jnp.sum(_mega_diffable(u, vT)))(u)
    gu2 = jax.grad(lambda u: jnp.sum(u._linked_logdensity_t_children(vT)))(u)
    for a, b in zip(jax.tree_util.tree_leaves(gu1), jax.tree_util.tree_leaves(gu2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-11)


def test_mega_jvp_vjp_kernels_interpret(rng):
    """The fused tangent/transpose kernels (linear_call pair) == jax.jvp /
    jax.vjp of the composed per-leaf path, including clip/max tie
    conventions, across every supported leaf kind."""
    from tpu_bijectors.vectorize.fused_kernel import mega_jvp_t, mega_vjp_t

    d = _mega_model()
    u = unconstrain(d)
    dim = u.linked_vec_length
    vT = jnp.asarray(0.5 * rng.standard_normal((17, dim))).T
    dvT = jnp.asarray(rng.standard_normal((17, dim))).T
    gbar = jnp.asarray(rng.standard_normal(17))

    f = lambda vT: u._linked_logdensity_t_children(vT)
    _, dlp_ref = jax.jvp(f, (vT,), (dvT,))
    dlp = mega_jvp_t(u, vT, dvT, interpret=True)
    np.testing.assert_allclose(np.asarray(dlp), np.asarray(dlp_ref), rtol=1e-9, atol=1e-11)

    _, vjp = jax.vjp(f, vT)
    (dv_ref,) = vjp(gbar)
    dv = mega_vjp_t(u, vT, gbar, interpret=True)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=1e-9, atol=1e-11)


def test_mega_jvp_vjp_kernels_extremes(rng):
    """Same, at clamp-binding 1e10 inputs (the gradients must agree with
    the composed path's — incl. zeros where the clamps saturate)."""
    from tpu_bijectors.vectorize.fused_kernel import mega_vjp_t

    d = _mega_model()
    u = unconstrain(d)
    dim = u.linked_vec_length
    vT = jnp.asarray(1e10 * rng.standard_normal((9, dim))).T
    gbar = jnp.ones(9)
    f = lambda vT: u._linked_logdensity_t_children(vT)
    _, vjp = jax.vjp(f, vT)
    (dv_ref,) = vjp(gbar)
    dv = mega_vjp_t(u, vT, gbar, interpret=True)
    m = np.isfinite(np.asarray(dv_ref))
    # Dirichlet rows are TELESCOPED slab entries (fused_plan._SIMPLEX_SLAB):
    # at 1e10 the kernel returns the exact asymptotic-slope gradient
    # (constant -w2 / +w1 — restorative, pulls the sampler back) while the
    # composed path's eps-clamps saturate to ~0. Exclude them from the
    # equality and assert the documented limit behavior instead.
    drows = np.zeros(dim, bool)
    for name, (s, _e) in zip(u.names, u.linked_offsets):
        if name in ("w", "iidd"):
            child = u.children[list(u.names).index(name)]
            drows[s : s + child.linked_vec_length] = True
    eq = m & ~drows[:, None]
    np.testing.assert_allclose(
        np.asarray(dv)[eq], np.asarray(dv_ref)[eq], rtol=1e-9, atol=1e-11
    )
    ddv = np.asarray(dv)[drows]
    assert np.all(np.isfinite(ddv))
    # restorative sign on every Dirichlet element: opposes the excursion
    assert np.all(np.sign(ddv) == -np.sign(np.asarray(vT)[drows]))
    # wherever the composed path's gradient is finite, the kernel's is too
    # (the kernel may be finite at MORE points: its per-slot partials avoid
    # an inf * 0 the composed transpose hits when exp(1e10) overflows in a
    # sibling slot of the Wishart leaf — both are -inf-density boundary
    # points where the gradient is undefined anyway)
    a_fin = np.isfinite(np.asarray(dv))
    b_fin = np.isfinite(np.asarray(dv_ref))
    assert np.all(a_fin[b_fin])


def test_pre_t_kernels_interpret(rng):
    """pre_t=True kernel variants == batch-major variants (interpret mode)."""
    from tpu_bijectors.kernels.lkj import lkj_logdet_pallas
    from tpu_bijectors.kernels.pd import pd_logdensity_pallas
    from tpu_bijectors.kernels.simplex import simplex_inverse_logdet_wlog_pallas

    y = jnp.asarray(rng.standard_normal((64, 10)), jnp.float32)
    for chol in (False, True):
        a = lkj_logdet_pallas(y, 5, chol=chol, interpret=True)
        b = lkj_logdet_pallas(y.T, 5, chol=chol, pre_t=True, interpret=True)
        for x, z in zip(a, b):
            assert bool(jnp.all(x == z))

    ys = jnp.asarray(rng.standard_normal((64, 5)), jnp.float32)
    am1 = jnp.asarray(rng.uniform(0.5, 2.0, 6), jnp.float32)
    a = simplex_inverse_logdet_wlog_pallas(ys, am1, want_x=False, interpret=True)
    b = simplex_inverse_logdet_wlog_pallas(
        ys.T, am1, want_x=False, pre_t=True, interpret=True
    )
    for x, z in zip(a[1:], b[1:]):
        assert bool(jnp.all(x == z))

    yp = jnp.asarray(0.4 * rng.standard_normal((64, 10)), jnp.float32)
    Cm = rng.standard_normal((4, 4)).astype(np.float32)
    for mode, C in (("dot", jnp.asarray(Cm @ Cm.T)), ("solve", jnp.asarray(np.tril(Cm)))):
        a = pd_logdensity_pallas(yp, 4, C, mode, interpret=True)
        b = pd_logdensity_pallas(yp.T, 4, C, mode, pre_t=True, interpret=True)
        for x, z in zip(a, b):
            assert bool(jnp.all(x == z))


def test_mega_kernel_inf_state_loop_rows_matches_composed(rng):
    """Kernel == composed at +/-inf state values on LOOP-entry rows
    (incl. the NaN pattern: a PD density at an infinite coordinate is a
    legitimate inf-inf on BOTH paths): the slab pass where-masks unowned
    rows before forming terms, so an inf on a loop-entry row cannot poison
    the slab chain running over the other rows, and finite columns stay
    exact."""
    from tpu_bijectors import dists
    from tpu_bijectors.vectorize.fused_kernel import mega_logdensity_t

    d = dists.NamedProduct.of(
        mu=dists.Normal(0.0, 1.0), wi=dists.Wishart(6.0, jnp.eye(3))
    )
    u = unconstrain(d)
    v = jnp.asarray(0.5 * rng.standard_normal((8, u.linked_vec_length)))
    v = v.at[0, 2].set(jnp.inf)    # Wishart (loop-entry) off-diag row -> +inf
    v = v.at[1, 4].set(-jnp.inf)   # and -inf
    ref = np.asarray(u._linked_logdensity_t_children(v.T))
    got = np.asarray(mega_logdensity_t(u, v.T, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
    assert np.all(np.isfinite(got[2:]))  # finite columns unaffected


def test_mega_dirichlet_slab_extreme_states(rng):
    """The TELESCOPED Dirichlet slab entry (fused_plan._SIMPLEX_SLAB)
    yields the exact limits at extreme states: never NaN, -inf at a
    +/-inf coordinate (so NUTS rejects the move; the composed path's
    eps-clamped surrogate stays finite there — a deliberate, documented
    divergence at the extremes only), and huge-but-FINITE with finite
    gradients at 1e10 jumps."""
    from tpu_bijectors import dists
    from tpu_bijectors.vectorize.fused_kernel import (
        mega_logdensity_t,
        mega_vjp_t,
    )

    d = dists.NamedProduct.of(
        mu=dists.Normal(0.0, 1.0), w=dists.Dirichlet(jnp.asarray([1.3, 2.0, 0.8, 1.1]))
    )
    u = unconstrain(d)
    v = jnp.asarray(0.5 * rng.standard_normal((8, u.linked_vec_length)))
    v = v.at[0, 1].set(jnp.inf)
    v = v.at[1, 2].set(-jnp.inf)
    got = np.asarray(mega_logdensity_t(u, v.T, interpret=True))
    assert not np.any(np.isnan(got)), got
    assert got[0] == -np.inf and got[1] == -np.inf
    v10 = jnp.asarray(1e10 * rng.standard_normal((16, u.linked_vec_length)))
    lp10 = np.asarray(mega_logdensity_t(u, v10.T, interpret=True))
    assert np.all(np.isfinite(lp10))
    g10 = np.asarray(mega_vjp_t(u, v10.T, jnp.ones(16), interpret=True))
    assert np.all(np.isfinite(g10))


def test_mega_value_and_grad_one_pass_kernel(rng):
    """mega_value_and_grad_t (the leapfrog fast path: value + FULL gradient
    in ONE Pallas pass) == jax.vjp of the composed path, across every leaf
    kind of the big mega model."""
    from tpu_bijectors.vectorize.fused_kernel import mega_value_and_grad_t

    d = _mega_model()
    u = unconstrain(d)
    vT = jnp.asarray(0.6 * rng.standard_normal((u.linked_vec_length, 96)).T).T
    lp, g = mega_value_and_grad_t(u, vT, interpret=True)
    ref_lp, vjpf = jax.vjp(u._linked_logdensity_t_children, vT)
    (ref_g,) = vjpf(jnp.ones_like(ref_lp))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp), rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g), rtol=1e-10, atol=1e-11)


def test_mega_dispatch_band():
    """try_mega dispatches OUTSIDE kernels.MEGA_OFF_BAND (measured band:
    mega wins below the per-leaf gate and at large B; the composed
    per-leaf path wins in between — MEGA_CROSSOVER.json)."""
    from tpu_bijectors import kernels
    from tpu_bijectors.vectorize.fused_kernel import _mega_batch_ok

    lo, hi = kernels.MEGA_OFF_BAND
    assert _mega_batch_ok(4) and _mega_batch_ok(lo - 1) and _mega_batch_ok(hi)
    assert not _mega_batch_ok(lo) and not _mega_batch_ok(hi - 1)


def test_model_t_fn_value_and_grad_fast_path(rng):
    """Model.batched_logdensity_t_fn exposes value_and_grad_fn (the fused
    one-pass leapfrog fast path); on CPU it falls back to jax.vjp and must
    equal it exactly — with and without a likelihood."""
    from tpu_bijectors.infer import Model

    model = Model(
        priors=dists.NamedProduct.of(
            p=dists.Beta(2.0, 2.0), s=dists.LogNormal(0.0, 0.5)
        ),
        loglik=lambda x: 3.0 * jnp.log(x["p"]) + 2.0 * jnp.log1p(-x["p"]),
    )
    for m in (model, Model(priors=model.priors)):
        f = m.batched_logdensity_t_fn()
        vg = f.value_and_grad_fn
        vT = jnp.asarray(0.4 * rng.standard_normal((m.dim(), 8)))
        lp, g = vg(vT)
        ref_lp, vjpf = jax.vjp(f, vT)
        (ref_g,) = vjpf(jnp.ones_like(ref_lp))
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ref_lp), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g), rtol=1e-12)
