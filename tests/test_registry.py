"""Registry dispatch + logpdf_with_trans golden values from the reference."""

import math

import jax.numpy as jnp
import numpy as np

import tpu_bijectors as tb
from tpu_bijectors import dists


def test_golden_lognormal_logpdf_with_trans():
    """logpdf_with_trans(LogNormal(), e, true) == -1.4189385332046727
    (reference doctest src/Bijectors.jl:237-242)."""
    d = dists.LogNormal()
    v = tb.logpdf_with_trans(d, jnp.asarray(math.e, jnp.float64), True)
    np.testing.assert_allclose(float(v), -1.4189385332046727, atol=1e-12)


def test_golden_dirichlet():
    """invlink(Dirichlet(ones(3)), [-1000, -1000]) ≈ [0,0,1]  and
    logpdf_with_trans(Dirichlet(ones(3)), invlink(d, [-1,-2]), true)
    == -3.760398892580863 (reference test/legacy_interface.jl:283-289)."""
    d = dists.Dirichlet(jnp.ones(3, jnp.float64))
    x_extreme = tb.invlink(d, jnp.asarray([-1000.0, -1000.0], jnp.float64))
    np.testing.assert_allclose(np.asarray(x_extreme), [0.0, 0.0, 1.0], atol=1e-9)

    x = tb.invlink(d, jnp.asarray([-1.0, -2.0], jnp.float64))
    v = tb.logpdf_with_trans(d, x, True)
    np.testing.assert_allclose(float(v), -3.760398892580863, atol=1e-9)


def test_registry_types():
    assert isinstance(tb.bijector(dists.Normal()), tb.Identity)
    assert isinstance(tb.bijector(dists.StudentT(3.0)), tb.Identity)
    b = tb.bijector(dists.LogNormal())
    assert isinstance(b, tb.Truncated) and b.lower_finite and not b.upper_finite
    b = tb.bijector(dists.Beta(2.0, 2.0))
    assert isinstance(b, tb.Truncated) and b.lower_finite and b.upper_finite
    assert isinstance(tb.bijector(dists.Dirichlet(jnp.ones(4))), tb.SimplexBijector)
    assert isinstance(tb.bijector(dists.Wishart(5.0, jnp.eye(3))), tb.PDVecBijector)
    assert isinstance(tb.bijector(dists.LKJ(3, 2.0)), tb.VecCorrBijector)
    assert isinstance(
        tb.bijector(dists.LKJCholesky(3, 2.0, "L")), tb.VecCholeskyBijector
    )
    assert isinstance(tb.bijector(dists.Poisson(2.0)), tb.Identity)
    # Pareto: lower-bounded at scale
    b = tb.bijector(dists.Pareto(2.0, 1.5))
    assert isinstance(b, tb.Truncated) and b.lower_finite and not b.upper_finite
    assert b.lb == 1.5


def test_link_invlink_roundtrip(key):
    for d, x in [
        (dists.LogNormal(), jnp.asarray(2.3, jnp.float64)),
        (dists.Beta(2.0, 3.0), jnp.asarray(0.37, jnp.float64)),
        (dists.Uniform(-2.0, 5.0), jnp.asarray(1.2, jnp.float64)),
        (dists.Dirichlet(jnp.ones(5)), None),
        (dists.LKJ(4, 1.0), None),
        (dists.Wishart(6.0, jnp.eye(4, dtype=jnp.float64)), None),
    ]:
        if x is None:
            x = d.sample(key)
        y = tb.link(d, x)
        x_rt = tb.invlink(d, y)
        np.testing.assert_allclose(
            np.asarray(x_rt), np.asarray(x), atol=1e-8,
            err_msg=f"roundtrip failed for {type(d).__name__}",
        )


def test_dirichlet_extreme_jumps(key, rng):
    """1000 random unconstrained jumps of magnitude 1e10 must give finite
    logpdf_with_trans (reference test/legacy_interface.jl:160-172)."""
    d = dists.Dirichlet(jnp.ones(5, jnp.float64))
    y = jnp.asarray(rng.standard_normal((1000, 4)) * 1e10)
    x = tb.bijector(d).inverse(y)
    lp = tb.logpdf_with_trans(d, x, True)
    assert np.all(np.isfinite(np.asarray(lp))), "non-finite logp under 1e10 jumps"


def test_transformed_distribution_lognormal(key):
    """logpdf(transformed(d), y) == logpdf_with_trans(d, x, true) pattern
    (reference test/interface.jl:55)."""
    d = dists.LogNormal(0.3, 1.2)
    td = tb.transformed(d)
    x = d.sample(key, (7,))
    b = tb.bijector(d)
    y = b.forward(x)
    lp_td = td.logpdf(y)
    lp_ref = tb.logpdf_with_trans(d, x, True)
    np.testing.assert_allclose(np.asarray(lp_td), np.asarray(lp_ref), atol=1e-10)
    # sampling maps through the transform
    s = td.sample(key, (5,))
    assert s.shape == (5,)


def test_transformed_distribution_dirichlet(key):
    d = dists.Dirichlet(jnp.asarray([2.0, 3.0, 4.0]))
    td = tb.transformed(d)
    assert td.event_shape == (2,)
    x = d.sample(key)
    y = tb.link(d, x)
    np.testing.assert_allclose(
        float(td.logpdf(y)), float(tb.logpdf_with_trans(d, x, True)), atol=1e-9
    )


def test_uniform_logpdf_stability_at_extreme_y():
    """Bijectors.jl#325 regression (reference test/interface.jl:84-97): at
    y=80 the constrained x rounds to the boundary, but the stable inverse
    log-jac log(b-a) - |y| - 2*log1pexp(-|y|) keeps logpdf finite."""
    d = dists.Uniform(-1.0, 1.0)
    td = tb.transformed(d)
    for y in (80.0, -80.0):
        lp = float(td.logpdf(jnp.asarray(y, jnp.float64)))
        assert np.isfinite(lp), f"transformed-Uniform logpdf -inf at y={y}"
        # analytic: logpdf(U(-1,1), x) + log(2) - |y| - 2 log1pexp(-|y|)
        expect = -np.log(2.0) + np.log(2.0) - abs(y) - 2 * np.log1p(np.exp(-abs(y)))
        np.testing.assert_allclose(lp, expect, atol=1e-12)
