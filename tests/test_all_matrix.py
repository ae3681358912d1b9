"""The main sweep: testing.test_all over the full distribution matrix —
the TPU-native equivalent of the reference's data-driven case generation
(/root/reference/test/vector/{univariate,multivariate,matrix,product,
reshaped,transformed}.jl run through test_all, SURVEY.md §4.2)."""

import jax.numpy as jnp
import pytest

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.testing import test_all

e = jnp.asarray


def _univariates():
    # mirrors test/vector/univariate.jl:1-98
    return [
        dists.Arcsine(0.0, 1.0),
        dists.Beta(2.0, 2.0),
        dists.BetaPrime(1.0, 2.0),
        dists.Biweight(1.0, 2.0),
        dists.Cauchy(-2.0, 1.0),
        dists.Chi(1.0),
        dists.Chisq(3.0),
        dists.Cosine(0.0, 1.0),
        dists.Epanechnikov(0.0, 1.0),
        dists.Erlang(7.0, 0.5),
        dists.Exponential(2.0),
        dists.FDist(10.0, 1.0),
        dists.Frechet(1.0, 1.0),
        dists.Gamma(7.5, 1.0),
        dists.GeneralizedExtremeValue(0.0, 1.0, 1.0),
        dists.GeneralizedPareto(0.0, 1.0, 1.0),
        dists.Gumbel(0.0, 1.0),
        dists.InverseGamma(3.0, 0.5),
        dists.InverseGaussian(1.0, 1.0),
        dists.JohnsonSU(0.0, 1.0, 0.0, 1.0),
        dists.Kolmogorov(),
        dists.Kumaraswamy(2.0, 5.0),
        dists.Laplace(0.0, 4.0),
        dists.Levy(0.0, 1.0),
        dists.Lindley(1.5),
        dists.Logistic(2.0, 1.0),
        dists.LogitNormal(0.0, 1.0),
        dists.LogNormal(0.0, 1.0),
        dists.LogUniform(1.0, 10.0),
        dists.NoncentralBeta(2.0, 3.0, 1.0),
        dists.NoncentralChisq(2.0, 3.0),
        dists.NoncentralF(2.0, 3.0, 1.0),
        dists.NoncentralT(2.0, 3.0),
        dists.Normal(0.0, 1.0),
        dists.NormalCanon(0.0, 1.0),
        dists.NormalInverseGaussian(0.0, 0.5, 0.2, 0.1),
        dists.Pareto(1.0, 1.0),
        dists.PGeneralizedGaussian(0.2),
        dists.Rayleigh(0.5),
        dists.Rician(0.5, 1.0),
        dists.Semicircle(1.0),
        dists.SkewedExponentialPower(0.0, 1.0, 0.7, 0.7),
        dists.SkewNormal(0.0, 1.0, -1.0),
        dists.StudentizedRange(2.0, 2.0),
        dists.SymTriangularDist(0.0, 1.0),
        dists.TDist(5.0),
        dists.TriangularDist(0.0, 1.5, 0.5),
        dists.Triweight(1.0, 1.0),
        dists.Uniform(0.0, 1.0),
        dists.VonMises(0.5),
        dists.Weibull(0.5, 1.0),
        dists.KSOneSided(10),
        # truncated / censored rows
        dists.Truncated(dists.Normal(), lower=0.0),
        dists.Truncated(dists.Normal(), upper=0.0),
        dists.Truncated(dists.Normal(), lower=0.0, upper=1.0),
        dists.Censored(dists.Normal(), lower=0.0),
        dists.Censored(dists.Normal(), upper=0.0),
        dists.Censored(dists.Normal(), lower=0.0, upper=1.0),
        # affine rows
        dists.Logistic() + 2,
        dists.Logistic() - 2,
        dists.Logistic() * 3,
        dists.Logistic() * -3,
        dists.Gamma(2.0, 1.0 / 3.0) + 2,
        dists.Gamma(2.0, 1.0 / 3.0) - 2,
        dists.Gamma(2.0, 1.0 / 3.0) * 3,
        dists.Gamma(2.0, 1.0 / 3.0) * -3,
        dists.Beta(2.0, 5.0) + 2,
        dists.Beta(2.0, 5.0) - 2,
        dists.Beta(2.0, 5.0) * 3,
        dists.Beta(2.0, 5.0) * -3,
        dists.Truncated(dists.Beta(2.0, 5.0), lower=0.2, upper=0.8),
        # mixtures
        dists.Mixture(dists.Normal(e([-2.0, 0.0, 3.0]), e([1.2, 1.0, 2.5])), jnp.log(e([0.2, 0.5, 0.3]))),
        dists.Mixture(dists.Normal(e([0.0]), e([1.0])), jnp.log(e([1.0]))),
        dists.Mixture(dists.Beta(e([2.0, 5.0]), e([2.0, 1.0])), jnp.log(e([0.5, 0.5]))),
        dists.HeterogeneousMixture((dists.Normal(0.0, 1.0), dists.Exponential(1.0)), jnp.log(e([0.4, 0.6]))),
        dists.HeterogeneousMixture((dists.Gamma(2.0, 1.0), dists.Exponential(3.0)), jnp.log(e([0.5, 0.5]))),
    ]


def _discretes():
    return [
        dists.Bernoulli(0.5),
        dists.BernoulliLogit(0.0),
        dists.BetaBinomial(5, 2.0, 2.0),
        dists.Binomial(5, 0.5),
        dists.Categorical(jnp.log(e([0.2, 0.5, 0.3]))),
        dists.Dirac(2.5),
        dists.DiscreteUniform(1, 10),
        dists.DiscreteNonParametric(e([1.0, 3.0, 5.0]), e([0.2, 0.5, 0.3])),
        dists.Geometric(0.3),
        dists.Hypergeometric(20, 7, 12),
        dists.NegativeBinomial(5.0, 0.5),
        dists.Poisson(3.0),
        dists.PoissonBinomial(e([0.2, 0.5, 0.3])),
        dists.Skellam(2.0, 3.0),
        dists.Soliton(100, 60, 0.2),
        dists.Multinomial(10, e([0.2, 0.5, 0.3])),
    ]


def _multivariates():
    return [
        dists.Dirichlet(e([2.0, 3.0, 4.0])),
        dists.MvNormalDiag(jnp.zeros(4), jnp.ones(4)),
        dists.MvNormalTril(e([0.5, -1.0]), e([[2.0, 0.0], [0.3, 1.5]])),
        dists.MvLogNormal(jnp.zeros(3), jnp.ones(3)),
        dists.MvLogitNormal(jnp.zeros(3), jnp.eye(3, dtype=jnp.float64)),
        dists.MvStudentT(4.0, jnp.zeros(3), jnp.eye(3, dtype=jnp.float64)),
        dists.MvNormalCanon(e([1.0, 2.0, 3.0]), e([[4.0, -2.0, -1.0], [-2.0, 5.0, -1.0], [-1.0, -1.0, 6.0]])),
        dists.JointOrderStatistics(dists.Normal(), 4),
        dists.OrderStatistic(dists.Normal(), 5, 2),
    ]


def _matrix_dists():
    return [
        dists.LKJ(3, 2.0),
        dists.LKJ(4, 1.0),
        dists.LKJCholesky(3, 1.5, "L"),
        dists.LKJCholesky(3, 1.5, "U"),
        dists.Wishart(6.0, jnp.eye(3, dtype=jnp.float64)),
        dists.InverseWishart(6.0, jnp.eye(3, dtype=jnp.float64)),
        dists.MatrixBeta(3, 6.0, 7.0),
        dists.MatrixNormal(jnp.zeros((2, 3)), jnp.eye(2, dtype=jnp.float64), jnp.eye(3, dtype=jnp.float64)),
        dists.MatrixTDist(
            5.0,
            jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], jnp.float64),
            jnp.asarray([[1.0, 0.5], [0.5, 1.0]], jnp.float64),
            jnp.asarray([[1.0, 0.3, 0.2], [0.3, 1.0, 0.4], [0.2, 0.4, 1.0]], jnp.float64),
        ),
    ]


def _products():
    # mirrors test/vector/product.jl incl. triple nesting
    return [
        dists.IIDProduct(dists.Beta(2.0, 2.0), 10),
        dists.IIDProduct(dists.Dirichlet(jnp.ones(3)), 4),
        # arraydist: per-element-parameter products (identity / log /
        # logit / interval-with-array-bounds links)
        dists.arraydist(dists.Normal(e([-1.0, 0.0, 2.0]), e([0.5, 1.0, 2.0]))),
        dists.arraydist(dists.LogNormal(e([0.0, 0.3]), e([0.5, 1.2]))),
        dists.arraydist(dists.Beta(e([2.0, 5.0, 1.5]), e([2.0, 1.0, 3.0]))),
        dists.arraydist(dists.Uniform(e([-1.0, 0.0]), e([1.0, 3.0]))),
        # vector/matrix-event arraydist: per-group params
        dists.arraydist(dists.Dirichlet(e([[1.3, 2.0, 0.8], [2.5, 1.0, 1.7]]))),
        dists.arraydist(dists.LKJ(3, e([1.5, 2.5]))),
        dists.Product((dists.LogNormal(), dists.Beta(2.0, 2.0), dists.Normal())),
        dists.NamedProduct.of(mu=dists.Normal(), sigma=dists.LogNormal(), w=dists.Dirichlet(jnp.ones(4))),
        dists.NamedProduct.of(
            a=dists.IIDProduct(dists.Gamma(2.0, 3.0), 5),
            b=dists.Product((dists.Beta(1.0, 2.0), dists.Normal())),
            c=dists.NamedProduct.of(x=dists.LKJ(3, 1.0), y=dists.Uniform(-1.0, 2.0)),
        ),
        dists.Product((dists.Product((dists.Normal(), dists.LogNormal())), dists.Beta(2.0, 2.0))),
    ]


def _wrapped():
    return [
        dists.Reshaped(dists.MvNormalDiag(jnp.zeros(6), jnp.ones(6)), (2, 3)),
        dists.Reshaped(dists.Dirichlet(jnp.ones(4)), (2, 2)),
        tb.transformed(dists.LogNormal()),
        tb.transformed(dists.Beta(2.0, 2.0)),
        tb.transformed(dists.Normal(), tb.Exp()),
        # quantile-linked rows: sweep property 8 (grad vs central diffs)
        # is the net that catches a zero-gradient generic quantile
        tb.transformed(
            dists.Uniform(0.0, 1.0), tb.QuantileBijector(dists.Gamma(2.0, 3.0))
        ),
        tb.transformed(dists.Gamma(2.0, 3.0), tb.CDFBijector(dists.Gamma(2.0, 3.0))),
        tb.ordered(dists.IIDProduct(dists.Normal(0.0, 1.0), 4)),
        dists.IIDProduct(dists.IIDProduct(dists.LogNormal(), 3), 2),
    ]


_UNIV = _univariates()
_DISC = _discretes()
_MV = _multivariates()
_MAT = _matrix_dists()
_PROD = _products()
_WRAP = _wrapped()


def _id(d):
    n = type(d).__name__
    if isinstance(d, dists.Affine):
        return f"Affine[{type(d.base).__name__}]"
    if isinstance(d, (dists.Truncated, dists.Censored)):
        return f"{n}[{type(d.base).__name__}]"
    return n


# heavy-tailed families: random N(0,1) unconstrained inputs map to huge
# constrained values where f64 round-trips through exp/log lose absolute
# precision; shrink the random inputs (matches the reference's bounded
# test point generation, test_utils.jl:325-333)
_SCALE_DOWN = (
    dists.Levy,
    dists.NoncentralF,
    dists.FDist,
    dists.StudentizedRange,
    dists.Frechet,
    dists.PGeneralizedGaussian,
)


@pytest.mark.parametrize("d", _UNIV, ids=_id)
def test_all_univariate(d):
    scale = 0.5 if isinstance(d, _SCALE_DOWN) else 1.0
    test_all(d, inverse_scale=scale)


@pytest.mark.parametrize("d", _DISC, ids=_id)
def test_all_discrete(d):
    test_all(d)


@pytest.mark.parametrize("d", _MV, ids=_id)
def test_all_multivariate(d):
    test_all(d)


@pytest.mark.parametrize("d", _MAT, ids=_id)
def test_all_matrix(d):
    test_all(d)


@pytest.mark.parametrize("d", _PROD, ids=_id)
def test_all_product(d):
    test_all(d)


@pytest.mark.parametrize("d", _WRAP, ids=_id)
def test_all_wrapped(d):
    test_all(d)
