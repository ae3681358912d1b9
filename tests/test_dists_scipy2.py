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
}


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
