"""SimplexBijector and OrderedBijector properties (reference
test/bijectors/simplex.jl, test/bijectors/ordered.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors.bijectors.simplex import simplex_forward_unrolled
from tpu_bijectors.testing import check_logdet_against_jacobian


@pytest.mark.parametrize("K", [2, 3, 5, 10])
def test_simplex_roundtrip(K, key):
    b = tb.SimplexBijector()
    x = jax.random.dirichlet(key, jnp.ones(K, jnp.float64))
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (K - 1,)
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-9)


def test_simplex_matches_unrolled(key):
    b = tb.SimplexBijector()
    x = jax.random.dirichlet(key, jnp.ones(7, jnp.float64), (11,))
    np.testing.assert_allclose(
        np.asarray(b.forward(x)), np.asarray(simplex_forward_unrolled(x)), atol=1e-14
    )


@pytest.mark.parametrize("K", [3, 6])
def test_simplex_logdet_vs_ad(K, key):
    """AD-vs-analytic with the reduced square Jacobian (drop last coordinate,
    reference test/interface.jl:154-162)."""
    b = tb.SimplexBijector()
    x = jax.random.dirichlet(key, jnp.full(K, 2.0, jnp.float64))
    _, ld = b.forward_and_log_det(x)

    def flat_fwd(xf):
        xx = jnp.concatenate([xf, 1.0 - jnp.sum(xf, keepdims=True)])
        return b.forward(xx)

    check_logdet_against_jacobian(flat_fwd, x[:-1], ld, atol=1e-6, rtol=1e-6)


def test_simplex_inverse_insupport(rng):
    """100 random unconstrained vectors -> valid simplex points
    (reference test_utils.jl:325-374)."""
    b = tb.SimplexBijector()
    y = jnp.asarray(rng.standard_normal((100, 6)) * 3.0)
    x = b.inverse(y)
    xs = np.asarray(x)
    assert np.all(xs >= 0.0)
    np.testing.assert_allclose(xs.sum(-1), 1.0, atol=1e-8)


def test_simplex_batched(key):
    b = tb.SimplexBijector()
    x = jax.random.dirichlet(key, jnp.ones(5, jnp.float64), (4, 3))
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (4, 3, 4) and ld.shape == (4, 3)
    x_rt = b.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-8)


def test_ordered_roundtrip(rng):
    b = tb.OrderedBijector()
    y = jnp.asarray(rng.standard_normal((8, 5)))
    x, ld = b.forward_and_log_det(y)
    # outputs are sorted ascending
    assert np.all(np.diff(np.asarray(x), axis=-1) > 0)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(y[..., 1:].sum(-1)))
    y_rt, ld_inv = b.inverse_and_log_det(x)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ld_inv), -np.asarray(ld), atol=1e-10)


def test_ordered_logdet_vs_ad(rng):
    b = tb.OrderedBijector()
    y = jnp.asarray(rng.standard_normal(6))
    _, ld = b.forward_and_log_det(y)
    check_logdet_against_jacobian(b.forward, y, ld, atol=1e-9)


def test_ordered_distribution(key):
    d = tb.dists.MvNormal(jnp.zeros(4), scale_diag=jnp.ones(4))
    od = tb.ordered(d)
    x_sorted = jnp.asarray([-1.0, 0.0, 0.5, 2.0])
    x_unsorted = jnp.asarray([1.0, 0.0, 0.5, 2.0])
    assert np.isfinite(float(od.logpdf(x_sorted)))
    assert float(od.logpdf(x_unsorted)) == -np.inf
    # bijector(od) maps ordered -> unconstrained, round-trip
    b = tb.bijector(od)
    y = b.forward(x_sorted)
    np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(x_sorted), atol=1e-10)


def test_ordered_rejection_sampling_nonexchangeable(key):
    """For a non-exchangeable base, OrderedDistribution.sample must be the
    rejection sampler (reference ordered.jl:160-168), NOT a sort of the
    draw — they are different distributions. Checked against a numpy
    rejection oracle on a 2D anisotropic normal."""
    loc = jnp.asarray([0.0, 1.5])
    scale = jnp.asarray([1.0, 0.25])
    od = tb.ordered(tb.dists.MvNormal(loc, scale_diag=scale))
    n = 20000
    xs = np.asarray(od.sample(key, (n,)))
    assert np.isfinite(xs).all()
    assert (xs[:, 1] >= xs[:, 0]).all()

    # numpy rejection oracle
    rng = np.random.default_rng(0)
    draws = rng.normal(np.asarray(loc), np.asarray(scale), size=(4 * n, 2))
    acc = draws[draws[:, 1] >= draws[:, 0]]
    np.testing.assert_allclose(xs.mean(0), acc.mean(0), atol=0.02)
    np.testing.assert_allclose(xs.std(0), acc.std(0), atol=0.02)

    # and it must DIFFER from the sort-based (wrong) sampler on this base:
    raw = np.asarray(tb.dists.MvNormal(loc, scale_diag=scale).sample(key, (n,)))
    srt = np.sort(raw, axis=-1)
    assert abs(srt[:, 0].mean() - acc[:, 0].mean()) > 0.03


def test_ordered_iid_sort_fast_path_matches_rejection(key):
    """For an exchangeable IID base, sorting IS the ordered restriction —
    the fast path must agree with the rejection oracle in distribution."""
    od = tb.ordered(tb.dists.IIDProduct(tb.dists.Normal(0.0, 1.0), 3))
    n = 20000
    xs = np.asarray(od.sample(key, (n,)))
    assert (np.diff(xs, axis=-1) >= 0).all()
    rng = np.random.default_rng(1)
    draws = rng.normal(size=(10 * n, 3))
    acc = draws[(np.diff(draws, axis=-1) >= 0).all(axis=-1)]
    np.testing.assert_allclose(xs.mean(0), acc.mean(0), atol=0.03)


def test_ordered_lognormal_decreasing_branch(key):
    """ordered() with a monotone-decreasing link uses the SignFlip sandwich
    (reference ordered.jl:138-140). Truncated upper-only is decreasing."""
    d = tb.dists.MvLogNormal(jnp.zeros(3), jnp.ones(3))
    od = tb.ordered(d)
    b = tb.bijector(od)
    x = jnp.asarray([0.5, 1.0, 2.0])
    y = b.forward(x)
    np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(x), atol=1e-9)


def test_simplex_inverse_associative_scan_matches_sequential(rng):
    """The log-depth associative-scan inverse (dispatched for K >= 128, see
    _ASSOC_SCAN_MIN_K; exercised directly here) must match the sequential
    lax.scan recurrence."""
    from tpu_bijectors.bijectors.simplex import (
        _simplex_inverse,
        _simplex_inverse_parallel,
    )

    for K in (8, 64, 300, 1001):
        y = jnp.asarray(rng.standard_normal((7, K - 1)) * 1.5)
        xs = _simplex_inverse(y)
        xp = _simplex_inverse_parallel(y)
        np.testing.assert_allclose(np.asarray(xp), np.asarray(xs), atol=1e-12,
                                   err_msg=f"K={K}")
        np.testing.assert_allclose(np.asarray(jnp.sum(xp, -1)), 1.0, atol=1e-9)
    # extreme inputs: both paths must stay on the simplex and finite
    y_big = jnp.asarray(rng.standard_normal((5, 99)) * 1e10)
    xp = _simplex_inverse_parallel(y_big)
    assert bool(jnp.all(jnp.isfinite(xp)))
    np.testing.assert_allclose(np.asarray(jnp.sum(xp, -1)), 1.0, atol=1e-6)


def test_large_simplex_roundtrip_through_bijector(rng):
    """SimplexBijector end-to-end at K=500 (assoc-scan path) round-trips."""
    b = tb.SimplexBijector()
    y = jnp.asarray(rng.standard_normal((4, 499)))
    x, ld = b.inverse_and_log_det(y)
    y_rt, ld_f = b.forward_and_log_det(x)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld), rtol=1e-9)


def test_simplex_jacobian_oracles(rng):
    """Hand-derived dense Jacobians: J_link(x) @ J_invlink(y) == I (the
    reference's golden test, test/legacy_interface.jl:299-312) and both match
    jax.jacfwd of our kernels."""
    from tpu_bijectors.testing.oracles import (
        simplex_invlink_jacobian,
        simplex_link_jacobian,
    )

    b = tb.SimplexBijector()
    for K in (3, 5, 9):
        x = rng.dirichlet(np.ones(K))
        y = np.asarray(b.forward(jnp.asarray(x)))
        Jf = simplex_link_jacobian(x)       # (K-1, K)
        Ji = simplex_invlink_jacobian(y)    # (K, K-1)
        np.testing.assert_allclose(Jf @ Ji, np.eye(K - 1), atol=1e-8)
        # oracle vs AD of the actual kernels
        J_ad = np.asarray(jax.jacfwd(b.forward)(jnp.asarray(x)))
        np.testing.assert_allclose(J_ad, Jf, rtol=1e-7, atol=1e-9)
        Ji_ad = np.asarray(jax.jacfwd(b.inverse)(jnp.asarray(y)))
        np.testing.assert_allclose(Ji_ad, Ji, rtol=1e-6, atol=1e-9)
