"""Wrapper distributions + remaining inventory: Reshaped, Censored, Mixture,
order statistics, MatrixNormal, LinearMap, product-distribution bijectors."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.testing import check_logdet_against_jacobian
from tpu_bijectors.vectorize import unconstrain


def test_reshaped_distribution(key):
    d = dists.Reshaped(dists.MvNormalDiag(jnp.zeros(6), jnp.full(6, 2.0)), (2, 3))
    x = d.sample(key)
    assert x.shape == (2, 3)
    base_lp = d.base.logpdf(x.reshape(6))
    np.testing.assert_allclose(float(d.logpdf(x)), float(base_lp))
    b = tb.bijector(d)
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (6,)
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-12)
    # vectorize path
    u = unconstrain(d)
    assert u.vec_length == 6 and u.linked_vec_length == 6


def test_reshaped_dirichlet_linked_length(key):
    d = dists.Reshaped(dists.Dirichlet(jnp.ones(6)), (2, 3))
    u = unconstrain(d)
    assert u.vec_length == 6
    assert u.linked_vec_length == 5
    x = d.sample(key)
    v, ld = u.to_linked_vec(x)
    x_rt, ld_inv = u.from_linked_vec(v)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-9)


def test_censored(key):
    d = dists.Censored(dists.Normal(), lower=-1.0, upper=1.0)
    xs = d.sample(key, (2000,))
    assert np.all(np.abs(np.asarray(xs)) <= 1.0)
    # mass at the bounds == base cdf mass
    frac_lo = float(np.mean(np.asarray(xs) == -1.0))
    from scipy.stats import norm

    np.testing.assert_allclose(frac_lo, norm.cdf(-1.0), atol=0.03)
    np.testing.assert_allclose(
        float(d.logpdf(jnp.asarray(-1.0))), math.log(norm.cdf(-1.0)), atol=1e-9
    )
    assert isinstance(tb.bijector(d), tb.Truncated)


def test_mixture(key):
    from scipy.stats import norm

    d = dists.Mixture(
        dists.Normal(jnp.asarray([-2.0, 2.0]), jnp.asarray([1.0, 0.5])),
        jnp.log(jnp.asarray([0.3, 0.7])),
    )
    x = 0.5
    expected = 0.3 * norm.pdf(x, -2, 1) + 0.7 * norm.pdf(x, 2, 0.5)
    np.testing.assert_allclose(float(d.logpdf(jnp.asarray(x))), math.log(expected), atol=1e-9)
    xs = np.asarray(d.sample(key, (4000,)))
    np.testing.assert_allclose(xs.mean(), 0.3 * -2 + 0.7 * 2, atol=0.1)
    # positive mixture gets the positive link
    dm = dists.Mixture(
        dists.LogNormal(jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 1.0])),
        jnp.log(jnp.asarray([0.5, 0.5])),
    )
    b = tb.bijector(dm)
    assert isinstance(b, tb.Truncated) and b.lower_finite


def test_order_statistic(key):
    """rank-k of n uniforms is Beta(k, n+1-k) — exact check."""
    n, r = 5, 2
    d = dists.OrderStatistic(dists.Uniform(0.0, 1.0), n, r)
    from scipy.stats import beta as sbeta

    x = 0.3
    np.testing.assert_allclose(
        float(d.logpdf(jnp.asarray(x))), sbeta.logpdf(x, r, n + 1 - r), atol=1e-9
    )
    xs = np.asarray(d.sample(key, (4000,)))
    np.testing.assert_allclose(xs.mean(), r / (n + 1.0), atol=0.02)


def test_joint_order_statistics(key, rng):
    d = dists.JointOrderStatistics(dists.Normal(), 5)
    x = d.sample(key)
    assert np.all(np.diff(np.asarray(x)) >= 0)
    b = tb.bijector(d)
    y, ld = b.forward_and_log_det(x)
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-10)
    # any unconstrained vector maps to a sorted vector
    yr = jnp.asarray(rng.standard_normal((50, 5)))
    xr = b.inverse(yr)
    assert np.all(np.diff(np.asarray(xr), axis=-1) >= 0)
    check_logdet_against_jacobian(b.forward, x, ld, atol=1e-8)


def test_joint_order_decreasing_link(key, rng):
    """Upper-bounded base -> decreasing link -> SignFlip sandwich branch."""
    base = dists.Truncated(dists.Normal(), upper=2.0)
    d = dists.JointOrderStatistics(base, 4)
    b = tb.bijector(d)
    x = jnp.sort(jnp.asarray([1.9, -0.5, 1.0, 0.0]))
    y = b.forward(x)
    x_rt = b.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-9)
    xr = b.inverse(jnp.asarray(rng.standard_normal((20, 4))))
    assert np.all(np.diff(np.asarray(xr), axis=-1) >= 0)
    assert np.all(np.asarray(xr) <= 2.0)


def test_matrix_normal(key):
    n, p = 2, 3
    Lr = jnp.asarray([[1.0, 0.0], [0.5, 1.5]])
    Lc = jnp.eye(3) * 2.0
    d = dists.MatrixNormal(jnp.ones((n, p)), Lr, Lc)
    X = d.sample(key, (5000,))
    np.testing.assert_allclose(np.asarray(X).mean(0), 1.0, atol=0.15)
    # logpdf equals the equivalent MvNormal on vec(X)
    U = Lr @ Lr.T
    V = Lc @ Lc.T
    cov = np.kron(np.asarray(U), np.asarray(V))  # row-major vec
    from scipy.stats import multivariate_normal

    x0 = np.asarray(X[0]).reshape(-1)
    expected = multivariate_normal.logpdf(x0, mean=np.ones(6), cov=cov)
    np.testing.assert_allclose(float(d.logpdf(X[0])), expected, atol=1e-8)
    u = unconstrain(d)
    assert u.vec_length == 6 and u.linked_vec_length == 6


def test_linear_map(rng):
    A = jnp.asarray(rng.standard_normal((4, 4)))
    b = tb.LinearMap(A)
    x = jnp.asarray(rng.standard_normal(4))
    y, ld = b.forward_and_log_det(x)
    check_logdet_against_jacobian(b.forward, x, ld, atol=1e-9)
    np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(x), atol=1e-9)
    T = jnp.tril(A) + 4.0 * jnp.eye(4)
    bt = tb.TriangularLinearMap(T)
    y, ld = bt.forward_and_log_det(x)
    check_logdet_against_jacobian(bt.forward, x, ld, atol=1e-9)
    np.testing.assert_allclose(np.asarray(bt.inverse(y)), np.asarray(x), atol=1e-9)


def test_product_distribution_bijector(key):
    d = dists.NamedProduct.of(a=dists.Normal(), w=dists.Dirichlet(jnp.ones(3)))
    b = tb.bijector(d)
    x = d.sample(key)
    v, ld = b.forward_and_log_det(x)
    assert v.shape == (3,)
    x_rt, ld_inv = b.inverse_and_log_det(v)
    np.testing.assert_allclose(np.asarray(x_rt["w"]), np.asarray(x["w"]), atol=1e-9)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-9)
    # transformed(NamedProduct) gives flat-vector distribution
    td = tb.transformed(d)
    lp = td.logpdf(v)
    assert np.isfinite(float(lp))


def test_classic_functional_interface():
    """compat.py: the reference's exported function names map 1:1
    (src/Bijectors.jl:49-87 export list)."""
    import jax.numpy as jnp
    import numpy as np
    import tpu_bijectors as tb
    from tpu_bijectors import dists

    b = tb.bijector(dists.LogNormal())
    x = jnp.asarray(2.718281828459045, jnp.float64)
    y = tb.transform(b, x)
    y2, ld = tb.with_logabsdet_jacobian(b, x)
    np.testing.assert_allclose(float(y), float(y2))
    np.testing.assert_allclose(float(tb.logabsdetjac(b, x)), float(ld))
    np.testing.assert_allclose(
        float(tb.logabsdetjacinv(b, y)), -float(ld), rtol=1e-12
    )
    assert tb.isinvertible(b)
    assert tb.isclosedform(tb.inverse(b))
    import jax

    pl = tb.PlanarLayer.init(jax.random.PRNGKey(0), 3, jnp.float64)
    assert not tb.isclosedform(tb.inverse(pl))
    assert tb.output_size(tb.SimplexBijector(), (5,)) == (4,)
    # columnwise: per-trailing-vector application
    cb = tb.columnwise(tb.SimplexBijector())
    xs = dists.Dirichlet(jnp.ones(4)).sample(jax.random.PRNGKey(1), (6,))
    ys, lds = cb.forward_and_log_det(xs)
    assert ys.shape == (6, 3) and lds.shape == ()
