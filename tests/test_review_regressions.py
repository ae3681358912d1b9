"""Regressions from the round-1 code review: traced-parameter supports,
quantile bracket expansion, affine algebra completeness, out-of-support
densities."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as ss

import tpu_bijectors as tb
from tpu_bijectors import dists


def test_bounded_kernel_support_with_array_params():
    """Biweight/Triweight/SymTriangular/Semicircle/Cosine/Epanechnikov with
    array parameters must report the true (array-valued) bounds, not [0,1]."""
    d = dists.Biweight(jnp.asarray(2.0), 1.0)
    s = d.support
    assert s.lower_finite and s.upper_finite
    np.testing.assert_allclose(float(s.lower), 1.0)
    np.testing.assert_allclose(float(s.upper), 3.0)
    # the link now lands in-support and the density is finite
    x = tb.invlink(d, jnp.asarray(0.0, jnp.float64))
    assert 1.0 < float(x) < 3.0
    assert np.isfinite(float(d.logpdf(x)))
    sc = dists.Semicircle(jnp.asarray(2.0)).support
    np.testing.assert_allclose(float(sc.lower), -2.0)


def test_affine_support_with_array_base_bounds():
    """Affine over a base with finite ARRAY bounds maps them elementwise."""
    d = dists.Pareto(1.0, jnp.asarray(2.0)) + 1.0  # support [3, inf)
    s = d.support
    assert s.lower_finite and not s.upper_finite
    np.testing.assert_allclose(float(s.lower), 3.0)
    x = tb.invlink(d, jnp.asarray(0.5, jnp.float64))
    assert float(x) > 3.0
    assert np.isfinite(float(d.logpdf(x)))


def test_default_quantile_far_bracket():
    """Support far from the +-1 seed bracket must still be reached by the
    geometric expansion (review: [100, inf) was silently truncated at 65)."""
    d = dists.Exponential(1.0) + 100.0  # support [100, inf)
    for q in (0.1, 0.5, 0.9):
        expect = 100.0 + ss.expon.ppf(q)
        got = float(dists.Distribution.quantile(d, jnp.asarray(q, jnp.float64)))
        np.testing.assert_allclose(got, expect, rtol=1e-9)
    du = (dists.Exponential(1.0) * -1.0) - 100.0  # support (-inf, -100]
    got = float(dists.Distribution.quantile(du, jnp.asarray(0.5, jnp.float64)))
    np.testing.assert_allclose(got, -100.0 - ss.expon.ppf(0.5), rtol=1e-9)


def test_affine_quantile_traced_negative_scale():
    d = dists.Affine(dists.Normal(0.0, 1.0), 0.0, jnp.asarray(-2.0))
    got = float(d.quantile(jnp.asarray(0.9, jnp.float64)))
    np.testing.assert_allclose(got, -2.0 * ss.norm.ppf(0.1), rtol=1e-9)


def test_rsub():
    d = 2.0 - dists.Normal(0.0, 1.0)  # N(2, 1)
    np.testing.assert_allclose(
        float(d.logpdf(jnp.asarray(2.0, jnp.float64))), ss.norm.logpdf(0.0), rtol=1e-12
    )


def test_betabinomial_out_of_support_is_neg_inf():
    d = dists.BetaBinomial(5, 2.0, 2.0)
    assert float(d.logpdf(jnp.asarray(7.0, jnp.float64))) == -math.inf
    assert float(d.logpdf(jnp.asarray(-1.0, jnp.float64))) == -math.inf
    assert np.isfinite(float(d.logpdf(jnp.asarray(3.0, jnp.float64))))


def test_studentized_range_traced_k_raises():
    import pytest

    with pytest.raises(ValueError):
        dists.StudentizedRange(2.0, jnp.asarray(5.0)).sample(jax.random.PRNGKey(0))


def test_gev_traced_params_raise_not_wrong_link():
    import pytest

    with pytest.raises(ValueError):
        dists.GeneralizedExtremeValue(jnp.asarray(0.0), 1.0, 0.3).support


def test_multinomial_zero_probability_category():
    """0 * log(0) must contribute 0, not NaN (review round 2)."""
    from scipy import stats as ss2

    d = dists.Multinomial(10, jnp.asarray([0.5, 0.5, 0.0]))
    got = float(d.logpdf(jnp.asarray([5.0, 5.0, 0.0], jnp.float64)))
    np.testing.assert_allclose(got, ss2.multinomial.logpmf([5, 5, 0], 10, [0.5, 0.5, 0.0]), rtol=1e-10)


def test_permute_from_matrix_rejects_signed_orthogonal():
    import pytest

    with pytest.raises(ValueError):
        tb.Permute.from_matrix([[0, -1], [-1, 0]])


def test_isclosedform_recurses_through_composition():
    pl = tb.PlanarLayer.init(jax.random.PRNGKey(0), 3, jnp.float64)
    assert not tb.isclosedform(tb.Chain((tb.inverse(pl),)))
    assert not tb.isclosedform(tb.Block(tb.inverse(pl), 1))
    assert tb.isclosedform(tb.Chain((tb.Exp(), tb.Shift(1.0))))


def test_logpdf_from_factor_single_arg_protocol_still_works():
    """Duck-typed fusion must tolerate the older 1-arg implementor."""
    from tpu_bijectors.vectorize import unconstrain

    class OldStyleLKJ(dists.LKJ):
        def logpdf_from_factor(self, log_diag_w):  # old signature
            return dists.LKJ.logpdf_from_factor(self, log_diag_w, None)

    d = OldStyleLKJ(4, 2.0)
    u = unconstrain(d)
    v = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (8, u.linked_vec_length), jnp.float64)
    x, lpld = u.from_linked_vec_with_logpdf(v)
    xr, ld = u.from_linked_vec(v)
    np.testing.assert_allclose(np.asarray(lpld), np.asarray(d.logpdf(xr) + ld), rtol=1e-10)


def test_assoc_scan_simplex_extreme_sum_invariant():
    """Clipped prefix sums keep the parallel path near the simplex even at
    extreme f32 inputs (review round 2)."""
    y = jnp.asarray(40.0 * np.random.default_rng(0).standard_normal((8, 255)), jnp.float32)
    from tpu_bijectors.bijectors.simplex import _simplex_inverse_parallel

    x = _simplex_inverse_parallel(y)
    assert bool(jnp.all(jnp.isfinite(x)))
    assert bool(jnp.all(x >= 0))
    np.testing.assert_allclose(np.asarray(jnp.sum(x, -1)), 1.0, atol=2e-5)


def test_batched_logpdf_with_unbatched_factors():
    """Triangular-solve distributions must accept batched x with unbatched
    factor parameters (round-5 review: broadcast the factor to the rhs)."""
    rng = np.random.default_rng(0)
    K = 4
    A = np.tril(rng.standard_normal((K, K))) + np.eye(K) * 2.0
    x = jnp.asarray(rng.standard_normal((16, K)), jnp.float64)
    d = dists.MvNormalTril(jnp.zeros(K, jnp.float64), jnp.asarray(A, jnp.float64))
    lp = d.logpdf(x)
    assert lp.shape == (16,)
    from scipy import stats as ss2

    np.testing.assert_allclose(
        np.asarray(lp), ss2.multivariate_normal.logpdf(np.asarray(x), np.zeros(K), A @ A.T),
        rtol=1e-10,
    )
    dt = dists.MvStudentT(5.0, jnp.zeros(K, jnp.float64), jnp.asarray(A, jnp.float64))
    assert dt.logpdf(x).shape == (16,)
    dm = dists.MatrixNormal(
        jnp.zeros((2, 3), jnp.float64), jnp.eye(2, dtype=jnp.float64), jnp.eye(3, dtype=jnp.float64)
    )
    Xs = jnp.asarray(rng.standard_normal((8, 2, 3)), jnp.float64)
    assert dm.logpdf(Xs).shape == (8,)
    b = tb.TriangularLinearMap(jnp.asarray(A, jnp.float64))
    ys = jnp.asarray(rng.standard_normal((8, K)), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(b.forward(b.inverse(ys))), np.asarray(ys), rtol=1e-10
    )


def test_nested_iid_product_unconstrain(key, rng):
    """IIDProduct stacks the iid axis INTO leaf arrays: a nested pure-IID
    chain is one leaf with a bigger event (round trips at the right
    length); a tuple-structured base errors loudly instead of silently
    truncating."""
    import pytest

    from tpu_bijectors.vectorize import unconstrain

    d = dists.IIDProduct(dists.IIDProduct(dists.LogNormal(), 3), 2)
    u = unconstrain(d)
    assert u.vec_length == 6 and u.linked_vec_length == 6
    x = d.sample(key)
    assert x.shape == (2, 3)
    assert u.to_vec(x).shape == (6,)
    # batched round trip keeps the batch axis where it belongs
    xb = d.sample(jax.random.PRNGKey(5), (7,))
    vb = u.to_vec(xb)
    assert vb.shape == (7, 6)
    x2 = u.from_vec(vb)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(xb), rtol=1e-12)
    assert np.all(np.isfinite(np.asarray(d.logpdf(x2))))
    # linked round trip through the log link
    w, ld = u.to_linked_vec(x)
    x3, ld_i = u.from_linked_vec(w)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x), rtol=1e-12)
    np.testing.assert_allclose(float(ld + ld_i), 0.0, atol=1e-12)

    with pytest.raises(NotImplementedError, match="tuple/named-structured"):
        unconstrain(
            dists.IIDProduct(
                dists.Product((dists.Normal(0.0, 1.0), dists.Exponential(1.0))), 2
            )
        )


def test_ordered_linked_optics_entangled(key):
    """ordered(d)'s link is bidiagonal (slot k = log(x_k - x_{k-1})): the
    linked optics must be None (entangled), not per-element claims."""
    from tpu_bijectors.vectorize import unconstrain

    od = tb.ordered(dists.IIDProduct(dists.Normal(0.0, 1.0), 3))
    u = unconstrain(od)
    assert all(o is None for o in u.linked_optic_vec())


def test_transformed_unconstrainer_linked_logdensity_telescopes(key, rng):
    """The batch-major linked_logdensity of a TransformedUnconstrainer
    telescopes to the base density (same value, no transform eval)."""
    from tpu_bijectors.vectorize import unconstrain

    td = tb.transformed(dists.Dirichlet(jnp.ones(4) * 2.0), tb.Exp())
    u = unconstrain(td)
    v = jnp.asarray(0.5 * rng.standard_normal((9, u.linked_vec_length)))
    lp = u.linked_logdensity(v)
    ref = u.from_linked_vec_with_logpdf(v)[1]
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref), rtol=1e-12)


def test_plan_cache_identity_semantics():
    """_plan is memoized per LIVE unconstrainer object (compile-time win:
    ~5 plan walks per transposed-NUTS compile). Same object -> same plan
    object; a fresh unconstrainer (possibly holding different traced
    params) must re-plan; traced-param jits stay correct across traces."""
    from tpu_bijectors.vectorize import unconstrain
    from tpu_bijectors.vectorize.fused_kernel import _plan, mega_logdensity_t

    d = dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(0.5, 2.0), 4),
        w=dists.Dirichlet(jnp.ones(5)),
    )
    u = unconstrain(d)
    assert _plan(u, 1e-6) is _plan(u, 1e-6)
    assert _plan(unconstrain(d), 1e-6) is not _plan(u, 1e-6)

    def f(alpha):
        uu = unconstrain(dists.NamedProduct.of(w=dists.Dirichlet(alpha)))
        vT = jnp.zeros((uu.linked_vec_length, 8))
        # two mega calls in ONE trace hit the cache with the SAME tracers
        return mega_logdensity_t(uu, vT, interpret=True) + mega_logdensity_t(
            uu, vT, interpret=True
        )

    r1 = np.asarray(jax.jit(f)(jnp.ones(5)))
    r2 = np.asarray(jax.jit(f)(jnp.ones(5) * 2.0))
    uu = unconstrain(dists.NamedProduct.of(w=dists.Dirichlet(jnp.ones(5))))
    ref1 = 2.0 * np.asarray(
        uu._linked_logdensity_t_children(jnp.zeros((uu.linked_vec_length, 8)))
    )
    np.testing.assert_allclose(r1, ref1, rtol=1e-5)
    assert not np.allclose(r1, r2)  # second trace used the NEW alpha


@pytest.mark.parametrize("transposed", [False, True])
def test_nuts_dense_metric_velocity_checkpoints(key, transposed):
    """Dense-metric batched NUTS (checkpoints store v = M^{-1}p, one matmul
    per leapfrog) still recovers the moments of a correlated Gaussian —
    in BOTH layouts (the transposed (dim, C) path aims/broadcasts the
    metric differently, ADVICE r2)."""
    from tpu_bijectors.infer.hmc_batched import nuts_kernel_batched

    rng = np.random.default_rng(3)
    A = rng.normal(size=(4, 4))
    cov = A @ A.T + 4.0 * np.eye(4)
    P = jnp.asarray(np.linalg.inv(cov))
    if transposed:
        logp = lambda qT: -0.5 * jnp.einsum("ic,ij,jc->c", qT, P, qT)
    else:
        logp = lambda q: -0.5 * jnp.einsum("ci,ij,cj->c", q, P, q)
    kern = nuts_kernel_batched(logp, max_depth=8, transposed=transposed)
    C = 64
    q = jnp.zeros((4, C) if transposed else (C, 4))
    lp = logp(q)
    g = jax.grad(lambda x: logp(x).sum())(q)
    inv_mass = jnp.asarray(cov)  # ideal dense metric
    step = jax.jit(lambda k, q, lp, g: kern(k, q, lp, g, 0.9, inv_mass))
    draws = []
    k = key
    for i in range(200):
        k, sub = jax.random.split(k)
        q, lp, g, info = step(sub, q, lp, g)
        if i >= 50:
            draws.append(np.asarray(q.T if transposed else q))
    X = np.concatenate(draws, axis=0)
    emp = X.T @ X / X.shape[0]
    assert int(np.asarray(info.diverging).sum()) == 0
    np.testing.assert_allclose(emp, cov, rtol=0.35, atol=0.6)
