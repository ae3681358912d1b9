"""logpdf parity vs scipy.stats for every univariate family + sample-moment
sanity (the 'ForwardDiff as oracle' role from the reference, SURVEY.md §4,
played here by scipy)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats as ss

from tpu_bijectors import dists

# (our dist, scipy logpdf fn, eval points)
CASES = [
    ("Normal", dists.Normal(0.5, 2.0), lambda x: ss.norm.logpdf(x, 0.5, 2.0), [-3.0, 0.0, 2.5]),
    ("Cauchy", dists.Cauchy(1.0, 2.0), lambda x: ss.cauchy.logpdf(x, 1.0, 2.0), [-2.0, 1.0, 4.0]),
    ("Laplace", dists.Laplace(0.0, 1.5), lambda x: ss.laplace.logpdf(x, 0, 1.5), [-1.0, 0.5]),
    ("Logistic", dists.Logistic(0.5, 2.0), lambda x: ss.logistic.logpdf(x, 0.5, 2.0), [-1.0, 2.0]),
    ("StudentT", dists.StudentT(4.0, 0.5, 2.0), lambda x: ss.t.logpdf(x, 4, 0.5, 2.0), [-1.0, 1.5]),
    ("Gumbel", dists.Gumbel(0.0, 2.0), lambda x: ss.gumbel_r.logpdf(x, 0, 2.0), [-1.0, 3.0]),
    ("SkewNormal", dists.SkewNormal(0.0, 1.0, 2.0), lambda x: ss.skewnorm.logpdf(x, 2.0), [0.5, 1.5]),
    ("LogNormal", dists.LogNormal(0.3, 1.2), lambda x: ss.lognorm.logpdf(x, 1.2, scale=np.exp(0.3)), [0.5, 2.0]),
    ("Exponential", dists.Exponential(2.0), lambda x: ss.expon.logpdf(x, scale=0.5), [0.3, 1.5]),
    ("Gamma", dists.Gamma(2.0, 3.0), lambda x: ss.gamma.logpdf(x, 2.0, scale=1 / 3.0), [0.5, 2.0]),
    ("InverseGamma", dists.InverseGamma(2.0, 3.0), lambda x: ss.invgamma.logpdf(x, 2.0, scale=3.0), [0.5, 2.0]),
    ("Chisq", dists.Chisq(3.0), lambda x: ss.chi2.logpdf(x, 3), [0.5, 4.0]),
    ("Chi", dists.Chi(3.0), lambda x: ss.chi.logpdf(x, 3), [0.5, 2.0]),
    ("Weibull", dists.Weibull(1.5, 2.0), lambda x: ss.weibull_min.logpdf(x, 1.5, scale=2.0), [0.5, 3.0]),
    ("Rayleigh", dists.Rayleigh(2.0), lambda x: ss.rayleigh.logpdf(x, scale=2.0), [0.5, 3.0]),
    ("Frechet", dists.Frechet(2.0, 1.5), lambda x: ss.invweibull.logpdf(x, 2.0, scale=1.5), [1.0, 3.0]),
    ("HalfNormal", dists.HalfNormal(2.0), lambda x: ss.halfnorm.logpdf(x, scale=2.0), [0.5, 3.0]),
    ("HalfCauchy", dists.HalfCauchy(2.0), lambda x: ss.halfcauchy.logpdf(x, scale=2.0), [0.5, 3.0]),
    ("Uniform", dists.Uniform(-1.0, 3.0), lambda x: ss.uniform.logpdf(x, -1.0, 4.0), [0.0, 2.0]),
    ("Beta", dists.Beta(2.0, 3.0), lambda x: ss.beta.logpdf(x, 2, 3), [0.2, 0.7]),
    ("Arcsine", dists.Arcsine(0.0, 1.0), lambda x: ss.arcsine.logpdf(x), [0.2, 0.8]),
    ("Pareto", dists.Pareto(2.5, 1.5), lambda x: ss.pareto.logpdf(x, 2.5, scale=1.5), [2.0, 5.0]),
    ("Levy", dists.Levy(0.5, 2.0), lambda x: ss.levy.logpdf(x, 0.5, 2.0), [1.5, 5.0]),
    ("FDist", dists.FDist(3.0, 5.0), lambda x: ss.f.logpdf(x, 3, 5), [0.5, 2.0]),
    ("BetaPrime", dists.BetaPrime(2.0, 3.0), lambda x: ss.betaprime.logpdf(x, 2, 3), [0.5, 2.0]),
    ("InverseGaussian", dists.InverseGaussian(1.5, 2.0), lambda x: ss.invgauss.logpdf(x, 0.75, scale=2.0), [0.8, 2.5]),
    ("VonMises", dists.VonMises(0.3, 2.0), lambda x: ss.vonmises.logpdf(x, 2.0, loc=0.3), [-1.0, 0.5]),
    ("TriangularDist", dists.TriangularDist(0.0, 2.0, 0.5), lambda x: ss.triang.logpdf(x, 0.25, 0, 2.0), [0.3, 1.5]),
    ("Semicircle", dists.Semicircle(2.0), lambda x: ss.semicircular.logpdf(x, scale=2.0), [-1.0, 1.0]),
    ("GeneralizedPareto", dists.GeneralizedPareto(0.0, 1.0, 0.3), lambda x: ss.genpareto.logpdf(x, 0.3), [0.5, 3.0]),
    ("GeneralizedExtremeValue", dists.GeneralizedExtremeValue(0.0, 1.0, 0.3), lambda x: ss.genextreme.logpdf(x, -0.3), [0.5, 2.0]),
    ("Gompertz", dists.Gompertz(1.0, 2.0), lambda x: ss.gompertz.logpdf(2.0 * x, 1.0) + np.log(2.0), [0.2, 0.8]),
    ("Kumaraswamy", dists.Kumaraswamy(2.0, 3.0), lambda x: np.log(6.0 * x * (1 - x**2) ** 2), [0.3, 0.7]),
    ("Poisson", dists.Poisson(2.5), lambda x: ss.poisson.logpmf(x, 2.5), [0.0, 3.0]),
    ("Bernoulli", dists.Bernoulli(0.3), lambda x: ss.bernoulli.logpmf(x, 0.3), [0.0, 1.0]),
    ("Binomial", dists.Binomial(10, 0.4), lambda x: ss.binom.logpmf(x, 10, 0.4), [3.0, 7.0]),
    ("Geometric", dists.Geometric(0.3), lambda x: ss.geom.logpmf(x + 1, 0.3), [0.0, 4.0]),
    ("NegativeBinomial", dists.NegativeBinomial(3.0, 0.4), lambda x: ss.nbinom.logpmf(x, 3, 0.4), [2.0, 6.0]),
]


@pytest.mark.parametrize("name,d,ref,xs", CASES, ids=[c[0] for c in CASES])
def test_logpdf_matches_scipy(name, d, ref, xs):
    for x in xs:
        mine = float(d.logpdf(jnp.asarray(x, jnp.float64)))
        theirs = float(ref(x))
        np.testing.assert_allclose(mine, theirs, rtol=1e-9, atol=1e-10,
                                   err_msg=f"{name} at {x}")


@pytest.mark.parametrize("name,d,ref,xs", CASES, ids=[c[0] for c in CASES])
def test_sampling_in_support_and_finite(name, d, ref, xs, key):
    s = d.sample(key, (500,))
    arr = np.asarray(jax.device_get(s), dtype=np.float64)
    assert np.all(np.isfinite(arr)), f"{name} produced non-finite samples"
    # logpdf at own samples is finite
    lp = np.asarray(d.logpdf(jnp.asarray(arr)))
    assert np.all(np.isfinite(lp)), f"{name} logpdf(-inf) at own samples"


def test_logitnormal_integral():
    """LogitNormal has no scipy analog; check normalization by quadrature."""
    d = dists.LogitNormal(0.3, 1.1)
    xs = np.linspace(1e-6, 1 - 1e-6, 200001)
    pdf = np.exp(np.asarray(d.logpdf(jnp.asarray(xs))))
    np.testing.assert_allclose(np.trapezoid(pdf, xs), 1.0, atol=1e-4)


def test_truncated_normal_vs_scipy():
    d = dists.Truncated(dists.Normal(0.5, 2.0), lower=-1.0, upper=2.0)
    ref = ss.truncnorm((-1.0 - 0.5) / 2.0, (2.0 - 0.5) / 2.0, 0.5, 2.0)
    for x in [-0.5, 0.0, 1.5]:
        np.testing.assert_allclose(
            float(d.logpdf(jnp.asarray(x, jnp.float64))), ref.logpdf(x), rtol=1e-9
        )
    s = d.sample(jax.random.PRNGKey(0), (5000,))
    np.testing.assert_allclose(float(jnp.mean(s)), ref.mean(), atol=0.05)


def test_mv_logpdfs_vs_scipy(key):
    mu = np.asarray([0.5, -1.0, 2.0])
    A = np.asarray([[2.0, 0, 0], [0.3, 1.5, 0], [-0.2, 0.1, 1.0]])
    cov = A @ A.T
    d = dists.MvNormalTril(jnp.asarray(mu), jnp.asarray(A))
    x = np.asarray([0.3, 0.1, 1.0])
    np.testing.assert_allclose(
        float(d.logpdf(jnp.asarray(x))),
        ss.multivariate_normal.logpdf(x, mu, cov),
        rtol=1e-10,
    )
    dd = dists.Dirichlet(jnp.asarray([2.0, 3.0, 4.0]))
    w = np.asarray([0.2, 0.3, 0.5])
    np.testing.assert_allclose(
        float(dd.logpdf(jnp.asarray(w))),
        ss.dirichlet.logpdf(w, [2.0, 3.0, 4.0]),
        rtol=1e-10,
    )
    dw = dists.Wishart(6.0, jnp.eye(3, dtype=jnp.float64) * 2.0)
    X = np.asarray(dw.sample(key))
    np.testing.assert_allclose(
        float(dw.logpdf(jnp.asarray(X))),
        ss.wishart.logpdf(X, 6, 2.0 * np.eye(3)),
        rtol=1e-8,
    )
    di = dists.InverseWishart(6.0, jnp.eye(3, dtype=jnp.float64) * 2.0)
    Xi = np.asarray(di.sample(key))
    np.testing.assert_allclose(
        float(di.logpdf(jnp.asarray(Xi))),
        ss.invwishart.logpdf(Xi, 6, 2.0 * np.eye(3)),
        rtol=1e-8,
    )


def test_lkj_moments(key):
    """LKJ(K, eta=1) is uniform over correlation matrices: off-diagonals have
    mean 0 and Var = 1/(K+1) for K=3... use the known marginal: r_ij ~
    2*Beta((K)/2, (K)/2) - 1 for eta=1 => var = 1/(K+1)."""
    K = 3
    d = dists.LKJ(K, 1.0)
    X = np.asarray(d.sample(key, (8000,)))
    off = X[:, 0, 1]
    np.testing.assert_allclose(off.mean(), 0.0, atol=0.02)
    np.testing.assert_allclose(off.var(), 1.0 / (K + 1), atol=0.02)
    # logpdf: uniform density = 1/volume, volume of 3x3 elliptope = pi^2/2
    lp = float(d.logpdf(jnp.asarray(np.eye(K))))
    np.testing.assert_allclose(lp, -np.log(np.pi**2 / 2), atol=1e-10)


def test_lkj_cholesky_consistency(key):
    """LKJCholesky sample -> L L^T matches LKJ density up to the Jacobian."""
    K, eta = 4, 2.0
    d = dists.LKJCholesky(K, eta, "L")
    L = d.sample(key)
    R = L @ L.T
    lkj = dists.LKJ(K, eta)
    # p_chol(L) = p_corr(R) * prod_j L_jj^(K-j)  (1-based j)
    jac = sum((K - j) * np.log(np.asarray(L)[j - 1, j - 1]) for j in range(1, K + 1))
    np.testing.assert_allclose(
        float(d.logpdf(L)), float(lkj.logpdf(R)) + jac, rtol=1e-9
    )
