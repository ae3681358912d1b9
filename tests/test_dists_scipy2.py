"""scipy parity + normalization checks for the part-3/discrete/affine
families (the remaining reference test-matrix rows,
/root/reference/test/vector/univariate.jl:1-98)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats as ss

from tpu_bijectors import dists

# (name, our dist, scipy logpdf fn, eval points)
CASES = [
    ("Erlang", dists.Erlang(7.0, 0.5), lambda x: ss.erlang.logpdf(x, 7, scale=0.5), [1.0, 3.0, 6.0]),
    ("LogUniform", dists.LogUniform(1.0, 10.0), lambda x: ss.loguniform.logpdf(x, 1.0, 10.0), [2.0, 5.0]),
    ("JohnsonSU", dists.JohnsonSU(0.5, 1.5, 0.3, 1.2), lambda x: ss.johnsonsu.logpdf(x, 0.3, 1.2, 0.5, 1.5), [-1.0, 0.5, 2.0]),
    ("NormalCanon", dists.NormalCanon(1.0, 2.0), lambda x: ss.norm.logpdf(x, 0.5, 1 / np.sqrt(2.0)), [-0.5, 1.0]),
    ("PGeneralizedGaussian", dists.PGeneralizedGaussian(0.7, 0.5, 2.0), lambda x: ss.gennorm.logpdf(x, 0.7, 0.5, 2.0), [-1.0, 0.5, 3.0]),
    ("Rician", dists.Rician(1.5, 2.0), lambda x: ss.rice.logpdf(x, 0.75, scale=2.0), [0.5, 2.0, 5.0]),
    ("NoncentralChisq", dists.NoncentralChisq(2.0, 3.0), lambda x: ss.ncx2.logpdf(x, 2, 3), [0.5, 3.0, 8.0]),
    ("NoncentralF", dists.NoncentralF(2.0, 3.0, 1.0), lambda x: ss.ncf.logpdf(x, 2, 3, 1), [0.5, 2.0, 5.0]),
    ("NoncentralT", dists.NoncentralT(2.0, 3.0), lambda x: ss.nct.logpdf(x, 2, 3), [-1.0, 0.5, 3.0, 8.0]),
    ("NormalInverseGaussian", dists.NormalInverseGaussian(0.0, 0.5, 0.2, 0.1), lambda x: ss.norminvgauss.logpdf(x, 0.5 * 0.1, 0.2 * 0.1, 0.0, 0.1), [-0.5, 0.1, 1.0]),
    ("Kolmogorov", dists.Kolmogorov(), lambda x: np.log(ss.kstwobign.pdf(x)), [0.4, 0.8, 1.2, 2.0]),
    ("StudentizedRange", dists.StudentizedRange(2.0, 2.0), lambda x: ss.studentized_range.logpdf(x, 2, 2), [0.5, 2.0, 5.0]),
    ("BetaBinomial", dists.BetaBinomial(5, 2.0, 2.0), lambda x: ss.betabinom.logpmf(x, 5, 2, 2), [0.0, 2.0, 5.0]),
    ("DiscreteUniform", dists.DiscreteUniform(1, 10), lambda x: ss.randint.logpmf(x, 1, 11), [1.0, 5.0, 10.0]),
    ("Hypergeometric", dists.Hypergeometric(20, 7, 12), lambda x: ss.hypergeom.logpmf(x, 27, 20, 12), [7.0, 9.0, 12.0]),
    ("Skellam", dists.Skellam(2.0, 3.0), lambda x: ss.skellam.logpmf(x, 2.0, 3.0), [-3.0, 0.0, 2.0]),
    ("BernoulliLogit", dists.BernoulliLogit(0.4), lambda x: ss.bernoulli.logpmf(x, 1 / (1 + np.exp(-0.4))), [0.0, 1.0]),
    ("KSOneSided", dists.KSOneSided(10), lambda x: ss.ksone.logpdf(x, 10), [0.05, 0.2, 0.45, 0.8]),
]

RTOL = {
    "NormalInverseGaussian": 2e-6,  # A&S K1 polynomial accuracy ~2e-7
    "StudentizedRange": 2e-4,  # fixed 96-pt quadrature
    "Kolmogorov": 1e-7,
    "NoncentralT": 1e-5,  # fixed 96-pt log-space Gauss-Hermite quadrature
}


def test_windowed_series_large_noncentrality():
    """Poisson-mixture densities must track the dominant term (j ~ lambda/2)
    instead of a fixed j = 0..n-1 truncation — the windowed series
    (dists/univariate3.py::_windowed_series_logsumexp) is exact to ~1e-10
    out to lambda = 1e5 (probed vs scipy)."""
    for lam in [200.0, 2000.0, 1e5]:
        ts = np.array([0.5, 1.0, 1.5]) * (3.0 + lam)
        o = np.asarray(dists.NoncentralChisq(3.0, lam).logpdf(jnp.asarray(ts)))
        np.testing.assert_allclose(o, ss.ncx2.logpdf(ts, 3.0, lam), rtol=1e-8)
    for lam in [500.0, 5000.0]:
        ts = np.array([0.5, 1.0, 2.0]) * (1 + lam / 4.0)
        o = np.asarray(dists.NoncentralF(4.0, 9.0, lam).logpdf(jnp.asarray(ts)))
        np.testing.assert_allclose(o, ss.ncf.logpdf(ts, 4.0, 9.0, lam), rtol=1e-8)
    for mu1, mu2 in [(500.0, 400.0), (5000.0, 4900.0)]:
        ts = np.round(
            np.array([-2.0, 0.0, 2.0]) * np.sqrt(mu1 + mu2) + (mu1 - mu2)
        )
        o = np.asarray(dists.Skellam(mu1, mu2).logpdf(jnp.asarray(ts)))
        np.testing.assert_allclose(o, ss.skellam.logpmf(ts, mu1, mu2), rtol=1e-8)


def test_noncentral_t_large_delta():
    """The power-series formulation NaN'd / truncated for |delta| beyond
    ~15 (terms peak near j ~ q^2/2, and alternate for t*delta < 0); the
    log-space Laplace-centered quadrature must stay finite and accurate
    across the whole (nu, delta) range."""
    for nu in [0.5, 2.0, 20.0, 100.0]:
        for de in [-50.0, -20.0, 20.0, 50.0]:
            ts = np.array([-1.5, -0.5, 0.25, 0.5, 1.5]) * abs(de) + de
            ours = np.asarray(
                dists.NoncentralT(nu, de).logpdf(jnp.asarray(ts, jnp.float64))
            )
            ref = ss.nct.logpdf(ts, nu, de)
            m = np.isfinite(ref) & (ref > -700)
            assert np.all(np.isfinite(ours[m]))
            np.testing.assert_allclose(
                ours[m], ref[m], rtol=1e-5, atol=1e-7,
                err_msg=f"nu={nu} delta={de}",
            )


@pytest.mark.parametrize("name,d,ref,xs", CASES, ids=[c[0] for c in CASES])
def test_logpdf_matches_scipy(name, d, ref, xs):
    rtol = RTOL.get(name, 1e-8)
    for x in xs:
        mine = float(d.logpdf(jnp.asarray(x, jnp.float64)))
        theirs = float(ref(x))
        np.testing.assert_allclose(mine, theirs, rtol=rtol, atol=1e-9,
                                   err_msg=f"{name} at {x}")


SAMPLE_CASES = [c for c in CASES] + [
    ("Biweight", dists.Biweight(1.0, 2.0), None, None),
    ("Triweight", dists.Triweight(1.0, 1.0), None, None),
    ("SymTriangularDist", dists.SymTriangularDist(0.0, 1.0), None, None),
    ("Lindley", dists.Lindley(1.5), None, None),
    ("NoncentralBeta", dists.NoncentralBeta(2.0, 3.0, 1.0), None, None),
    ("SkewedExponentialPower", dists.SkewedExponentialPower(0.0, 1.0, 0.7, 0.7), None, None),
    ("KSOneSided", dists.KSOneSided(10), None, None),
    ("Dirac", dists.Dirac(2.5), None, None),
    ("DiscreteNonParametric", dists.DiscreteNonParametric(jnp.asarray([1.0, 3.0, 5.0]), jnp.asarray([0.2, 0.5, 0.3])), None, None),
    ("PoissonBinomial", dists.PoissonBinomial(jnp.asarray([0.2, 0.5, 0.3])), None, None),
    ("Soliton", dists.Soliton(100, 60, 0.2), None, None),
]


@pytest.mark.parametrize("name,d,ref,xs", SAMPLE_CASES, ids=[c[0] for c in SAMPLE_CASES])
def test_sampling_finite_and_logpdf_finite_at_samples(name, d, ref, xs, key):
    s = d.sample(key, (500,))
    arr = np.asarray(jax.device_get(s), dtype=np.float64)
    assert np.all(np.isfinite(arr)), f"{name} produced non-finite samples"
    lp = np.asarray(d.logpdf(jnp.asarray(arr)))
    assert np.all(np.isfinite(lp)), f"{name} logpdf non-finite at own samples"


NORMALIZATION_CASES = [
    ("Biweight", dists.Biweight(1.0, 2.0), (-1.0 + 1e-9, 3.0 - 1e-9)),
    ("Triweight", dists.Triweight(1.0, 1.0), (0.0 + 1e-9, 2.0 - 1e-9)),
    ("SymTriangularDist", dists.SymTriangularDist(0.0, 1.0), (-1 + 1e-9, 1 - 1e-9)),
    ("Lindley", dists.Lindley(1.5), (1e-9, 60.0)),
    ("NoncentralBeta", dists.NoncentralBeta(2.0, 3.0, 1.0), (1e-9, 1 - 1e-9)),
    ("SkewedExponentialPower", dists.SkewedExponentialPower(0.0, 1.0, 0.7, 0.7), (-40.0, 40.0)),
    ("KSOneSided", dists.KSOneSided(10), (1e-6, 1 - 1e-6)),
]


@pytest.mark.parametrize("name,d,lim", NORMALIZATION_CASES, ids=[c[0] for c in NORMALIZATION_CASES])
def test_normalization_by_quadrature(name, d, lim):
    xs = np.linspace(lim[0], lim[1], 100001)
    pdf = np.exp(np.asarray(d.logpdf(jnp.asarray(xs))))
    np.testing.assert_allclose(np.trapezoid(pdf, xs), 1.0, atol=2e-3, err_msg=name)


def test_ncbeta_vs_mixture_mc(key):
    """NoncentralBeta logpdf vs empirical histogram moment check."""
    d = dists.NoncentralBeta(2.0, 3.0, 1.0)
    s = np.asarray(d.sample(key, (200_000,)))
    # mean of ncbeta via poisson mixture of Beta(a+j, b) means
    from scipy.stats import poisson

    j = np.arange(60)
    w = poisson.pmf(j, 0.5)
    mean = np.sum(w * (2.0 + j) / (2.0 + j + 3.0))
    np.testing.assert_allclose(s.mean(), mean, atol=5e-3)


def test_sepd_reduces_to_gennorm():
    """alpha=1/2 SEPD == PGeneralizedGaussian(mu, sigma*p^(1/p), p)."""
    p = 1.3
    d = dists.SkewedExponentialPower(0.5, 2.0, p, 0.5)
    ref = dists.PGeneralizedGaussian(p, 0.5, 2.0 * p ** (1 / p))
    for x in [-2.0, 0.5, 3.0]:
        np.testing.assert_allclose(
            float(d.logpdf(jnp.asarray(x, jnp.float64))),
            float(ref.logpdf(jnp.asarray(x, jnp.float64))),
            rtol=1e-10,
        )


def test_ksonesided_cdf_exact():
    """Birnbaum-Tingey at n=1: P(D+ <= d) = d for d in [0,1]... actually
    D_1^+ = max(1 - U, 0) distribution: P(D+ <= d) = d."""
    d1 = dists.KSOneSided(1)
    for d in [0.2, 0.5, 0.9]:
        np.testing.assert_allclose(float(d1.cdf(jnp.asarray(d, jnp.float64))), d, rtol=1e-12)


# -- affine algebra ---------------------------------------------------------


AFFINE_CASES = [
    ("Logistic+2", dists.Logistic(0.0, 1.0) + 2, lambda x: ss.logistic.logpdf(x, 2.0, 1.0), [0.0, 2.5]),
    ("Logistic-2", dists.Logistic(0.0, 1.0) - 2, lambda x: ss.logistic.logpdf(x, -2.0, 1.0), [-3.0, 0.0]),
    ("Logistic*3", dists.Logistic(0.0, 1.0) * 3, lambda x: ss.logistic.logpdf(x, 0.0, 3.0), [-2.0, 4.0]),
    ("Logistic*-3", dists.Logistic(0.0, 1.0) * -3, lambda x: ss.logistic.logpdf(x, 0.0, 3.0), [-2.0, 4.0]),
    ("Gamma*3+2", dists.Gamma(2.0, 1.0 / 3.0) * 3 + 2, lambda x: ss.gamma.logpdf(x, 2.0, loc=2.0, scale=9.0), [3.0, 10.0]),
    ("Beta*-3", dists.Beta(2.0, 5.0) * -3, lambda x: ss.beta.logpdf(-x / 3.0, 2, 5) - np.log(3.0), [-2.0, -0.5]),
]


@pytest.mark.parametrize("name,d,ref,xs", AFFINE_CASES, ids=[c[0] for c in AFFINE_CASES])
def test_affine_logpdf(name, d, ref, xs):
    for x in xs:
        np.testing.assert_allclose(
            float(d.logpdf(jnp.asarray(x, jnp.float64))), float(ref(x)),
            rtol=1e-10, err_msg=f"{name} at {x}",
        )


def test_affine_support_and_link():
    from tpu_bijectors import bijector, link, invlink

    d = dists.Beta(2.0, 5.0) * -3  # support [-3, 0]
    s = d.support
    assert s.lower == -3.0 and s.upper == 0.0 and s.lower_finite and s.upper_finite
    x = jnp.asarray(-1.2, jnp.float64)
    y = link(d, x)
    np.testing.assert_allclose(float(invlink(d, y)), float(x), rtol=1e-12)

    dp = dists.Gamma(2.0, 3.0) * 3 + 2  # support [2, inf)
    sp = dp.support
    assert sp.lower == 2.0 and sp.lower_finite and not sp.upper_finite
    xp = jnp.asarray(4.7, jnp.float64)
    np.testing.assert_allclose(float(invlink(dp, link(dp, xp))), 4.7, rtol=1e-12)

    # negative-scale lower-bounded base flips to upper-bounded
    dn = dists.Gamma(2.0, 3.0) * -4  # support (-inf, 0]
    sn = dn.support
    assert sn.upper == 0.0 and sn.upper_finite and not sn.lower_finite


def test_affine_flattening():
    d = (dists.Normal(0.0, 1.0) * 2 + 1) * 3 - 4
    assert isinstance(d, dists.Affine)
    assert isinstance(d.base, dists.Normal)
    np.testing.assert_allclose(
        float(d.logpdf(jnp.asarray(0.5, jnp.float64))),
        ss.norm.logpdf(0.5, 3 * 1 - 4, 6.0),
        rtol=1e-12,
    )


def test_affine_sampling_moments(key):
    d = dists.Gamma(2.0, 3.0) * -3 + 1  # mean 1 - 3*(2/3) = -1
    s = np.asarray(d.sample(key, (100_000,)))
    np.testing.assert_allclose(s.mean(), -1.0, atol=0.02)
    assert np.all(s <= 1.0)


def test_mvnormalcanon_vs_scipy(key):
    h = np.asarray([1.0, 2.0, 3.0])
    J = np.asarray([[4.0, -2.0, -1.0], [-2.0, 5.0, -1.0], [-1.0, -1.0, 6.0]])
    d = dists.MvNormalCanon(jnp.asarray(h), jnp.asarray(J))
    mu = np.linalg.solve(J, h)
    cov = np.linalg.inv(J)
    x = np.asarray([0.3, 0.1, 1.0])
    np.testing.assert_allclose(
        float(d.logpdf(jnp.asarray(x, jnp.float64))),
        ss.multivariate_normal.logpdf(x, mu, cov),
        rtol=1e-10,
    )
    s = np.asarray(d.sample(key, (40_000,)))
    np.testing.assert_allclose(s.mean(0), mu, atol=0.02)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.02)


def test_multinomial_vs_scipy(key):
    p = np.asarray([0.2, 0.5, 0.3])
    d = dists.Multinomial(10, jnp.asarray(p))
    for x in ([2, 5, 3], [0, 10, 0], [10, 0, 0]):
        np.testing.assert_allclose(
            float(d.logpdf(jnp.asarray(x, jnp.float64))),
            ss.multinomial.logpmf(x, 10, p),
            rtol=1e-10,
        )
    # invalid count total
    assert float(d.logpdf(jnp.asarray([1.0, 1.0, 1.0]))) == -np.inf
    s = np.asarray(d.sample(key, (40_000,)))
    assert np.all(s.sum(-1) == 10)
    np.testing.assert_allclose(s.mean(0), 10 * p, atol=0.05)


def test_matrix_tdist():
    """No scipy analogue: validate against (a) the 1x1 reduction to a scaled
    StudentT and (b) construction moments (E[X]=M, cov(vec X) =
    Sigma (x) Omega / (nu - 2))."""
    # (a) 1x1 reduction
    nu, s2, w = 5.0, 2.0, 3.0
    d1 = dists.MatrixTDist(nu, jnp.zeros((1, 1), jnp.float64),
                           jnp.asarray([[s2]], jnp.float64), jnp.asarray([[w]], jnp.float64))
    scale = np.sqrt(s2 * w / nu)
    for x in (-1.0, 0.3, 2.0):
        np.testing.assert_allclose(
            float(d1.logpdf(jnp.asarray([[x]], jnp.float64))),
            ss.t.logpdf(x, nu, scale=scale),
            rtol=1e-10,
        )
    # (b) moments of a 2x3 matrix-t
    M = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], jnp.float64)
    Sig = jnp.asarray([[1.0, 0.5], [0.5, 1.0]], jnp.float64)
    Om = jnp.asarray([[1.0, 0.3, 0.2], [0.3, 1.0, 0.4], [0.2, 0.4, 1.5]], jnp.float64)
    d = dists.MatrixTDist(6.0, M, Sig, Om)
    import jax

    X = np.asarray(d.sample(jax.random.PRNGKey(3), (120_000,)))
    np.testing.assert_allclose(X.mean(0), np.asarray(M), atol=0.03)
    V = np.cov(X.reshape(-1, 6).T)  # vec by rows: X[i,j] -> index 3i+j
    # cov(X_ij, X_kl) = Sig_ik * Om_jl / (nu - 2) with nu_gn = df + ... for the
    # IW(nu+n-1) mixing: E[S] = Sig / (nu + n - 1 - n - 1) = Sig/(nu - 2)
    expect = np.kron(np.asarray(Sig), np.asarray(Om)) / (6.0 - 2.0)
    np.testing.assert_allclose(V, expect, atol=0.06)
    lp = np.asarray(d.logpdf(jnp.asarray(X[:100])))
    assert np.all(np.isfinite(lp))


def test_heterogeneous_mixture(key):
    """Reference heterogeneous mixtures (test/vector/univariate.jl:96-99):
    Normal+Exponential and Gamma+Exponential unions."""
    d = dists.HeterogeneousMixture(
        (dists.Normal(0.0, 1.0), dists.Exponential(1.0)),
        jnp.log(jnp.asarray([0.4, 0.6])),
    )
    for x in (0.5, 2.0):
        expect = np.logaddexp(
            np.log(0.4) + ss.norm.logpdf(x), np.log(0.6) + ss.expon.logpdf(x)
        )
        np.testing.assert_allclose(
            float(d.logpdf(jnp.asarray(x, jnp.float64))), expect, rtol=1e-10
        )
    # support hull: (-inf, inf) -> identity link
    assert not d.support.lower_finite and not d.support.upper_finite
    s = np.asarray(d.sample(key, (50_000,)))
    np.testing.assert_allclose(s.mean(), 0.6 * 1.0, atol=0.02)

    d2 = dists.HeterogeneousMixture(
        (dists.Gamma(2.0, 1.0), dists.Exponential(3.0)),
        jnp.log(jnp.asarray([0.5, 0.5])),
    )
    assert d2.support.lower_finite and d2.support.lower == 0.0
    from tpu_bijectors.testing import test_all as sweep
    sweep(d2)


def test_heterogeneous_mixture_out_of_component_support():
    """Component densities outside their own support must contribute zero
    mass, not garbage (review round 3: Exponential at x<0 used to dominate)."""
    d = dists.HeterogeneousMixture(
        (dists.Normal(0.0, 1.0), dists.Exponential(1.0)),
        jnp.log(jnp.asarray([0.4, 0.6])),
    )
    x = jnp.asarray(-2.0, jnp.float64)
    np.testing.assert_allclose(
        float(d.logpdf(x)), np.log(0.4) + ss.norm.logpdf(-2.0), rtol=1e-10
    )
    g = jax.grad(lambda x: d.logpdf(x))(x)
    assert np.isfinite(float(g))
    # Gamma component outside support: finite density from the Normal only
    d2 = dists.HeterogeneousMixture(
        (dists.Gamma(2.0, 1.0), dists.Normal(0.0, 2.0)),
        jnp.log(jnp.asarray([0.5, 0.5])),
    )
    lp = float(d2.logpdf(jnp.asarray(-1.0, jnp.float64)))
    np.testing.assert_allclose(lp, np.log(0.5) + ss.norm.logpdf(-1.0, 0, 2.0), rtol=1e-10)
    assert np.isfinite(float(jax.grad(lambda x: d2.logpdf(x))(jnp.asarray(-1.0, jnp.float64))))


def test_matrix_beta():
    """No scipy analogue: (a) p=1 reduces to Beta(n1/2, n2/2); (b) sampler
    mean E[U] = n1/(n1+n2) I; (c) logpdf_from_factor fusion matches logpdf
    (reference registry row src/transformed_distribution.jl:138-139)."""
    import jax

    # (a) 1x1 reduction
    n1, n2 = 5.0, 7.0
    d1 = dists.MatrixBeta(1, n1, n2)
    for u in (0.1, 0.5, 0.9):
        np.testing.assert_allclose(
            float(d1.logpdf(jnp.asarray([[u]], jnp.float64))),
            ss.beta.logpdf(u, n1 / 2.0, n2 / 2.0),
            rtol=1e-10,
        )
    # (b) sampler mean at p=3
    d = dists.MatrixBeta(3, 6.0, 8.0)
    U = np.asarray(d.sample(jax.random.PRNGKey(5), (40_000,)))
    np.testing.assert_allclose(U.mean(0), 6.0 / 14.0 * np.eye(3), atol=0.01)
    # every draw strictly inside (0, I)
    ev = np.linalg.eigvalsh(U[:2000])
    assert (ev > 0).all() and (ev < 1).all()
    # (c) factor fusion
    x = jnp.asarray(U[0], jnp.float64)
    L = jnp.linalg.cholesky(x)
    np.testing.assert_allclose(
        float(d.logpdf_from_factor(L)), float(d.logpdf(x)), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(d.logpdf_from_factor(L, x)), float(d.logpdf(x)), rtol=1e-9
    )
