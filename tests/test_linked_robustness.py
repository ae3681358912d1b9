"""Extreme-input robustness of the fused linked paths.

The reference's robustness property (1000 unconstrained jumps of magnitude
1e10 stay finite, /root/reference/test/legacy_interface.jl:160-172) covers
the registry logpdf_with_trans path; the vectorize linked_logdensity path
must be at least NaN-free there too — the value may be a legitimate -inf at
a support boundary, but NaN would poison NUTS adaptation. Guards under
test: the eps-nudged Dirichlet weighted-log term (reference
src/Bijectors.jl:253), log-diagonal-from-running-sums in the LKJ inverse
(corr.py::_inv_link_chol_lkj_with_logdiag), and the telescoped scalar hooks
(LogNormal/Gamma/Exponential/InverseGamma fused_linked_logdensity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bijectors import dists
from tpu_bijectors.vectorize import unconstrain


def _model():
    return dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 2),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 2),
        g=dists.Gamma(2.0, 1.0),
        e=dists.Exponential(1.5),
        ig=dists.InverseGamma(3.0, 2.0),
        w=dists.Dirichlet(jnp.ones(6)),
        corr=dists.LKJ(4, 2.0),
        lc=dists.LKJCholesky(3, 1.5),
        # telescoped-hook scalar families (values may hit a legitimate
        # -inf/inf at the 1e10 extremes, but never NaN)
        chi=dists.Chi(3.0),
        wb=dists.Weibull(1.8, 2.1),
        hn=dists.HalfNormal(1.4),
        hc=dists.HalfCauchy(0.7),
        ray=dists.Rayleigh(1.2),
        fr=dists.Frechet(2.3, 1.4),
        un=dists.Uniform(-2.0, 5.0),
        b=dists.Beta(2.5, 1.6),
        ln=dists.LogitNormal(0.2, 0.9),
        par=dists.Pareto(2.2, 1.5),
        lv=dists.Levy(0.4, 1.3),
        mvd=dists.MvNormalDiag(jnp.asarray([0.3, -0.2]), jnp.asarray([0.8, 1.4])),
        mvln=dists.MvLogNormal(jnp.asarray([0.1, -0.4]), jnp.asarray([0.6, 1.2])),
    )


def test_linked_logdensity_1e10_jumps_no_nan(rng):
    d = _model()
    u = unconstrain(d)
    v = jnp.asarray(1e10 * rng.standard_normal((100, u.linked_vec_length)))
    lp = np.asarray(u.linked_logdensity(v))
    assert not np.any(np.isnan(lp))
    g = np.asarray(jax.grad(lambda v: jnp.sum(u.linked_logdensity(v)))(v))
    assert not np.any(np.isnan(g))
    # transposed layout agrees (incl. at the extremes)
    lpt = np.asarray(u.linked_logdensity_t(v.T))
    np.testing.assert_array_equal(lpt, lp)


def test_dirichlet_linked_matches_registry_nudge(rng):
    """The linked Dirichlet density uses the reference's eps-nudge, so it
    equals logpdf_with_trans on the same x (both finite at the boundary)."""
    import tpu_bijectors as tb

    d = dists.Dirichlet(jnp.ones(6) * 1.3)
    u = unconstrain(d)
    v = jnp.asarray(rng.standard_normal((50, 5)) * 3.0)
    lp = np.asarray(u.linked_logdensity(v))
    x = np.asarray(u.from_linked_vec(v)[0])
    ref = np.asarray(tb.logpdf_with_trans(d, jnp.asarray(x), True))
    np.testing.assert_allclose(lp, ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize(
    "d",
    [
        dists.LogNormal(0.3, 0.7),
        dists.Gamma(2.5, 1.2),
        dists.Exponential(0.8),
        dists.InverseGamma(3.0, 2.0),
        dists.Chi(3.0),
        dists.Weibull(1.8, 2.1),
        dists.HalfNormal(1.4),
        dists.HalfCauchy(0.7),
        dists.Rayleigh(1.2),
        dists.Frechet(2.3, 1.4),
        dists.Uniform(-2.0, 5.0),
        dists.Beta(2.5, 1.6),
        dists.LogitNormal(0.2, 0.9),
        dists.Pareto(2.2, 1.5),
        dists.Levy(0.4, 1.3),
        dists.MvLogNormal(jnp.asarray([0.1, -0.4, 0.7]), jnp.asarray([0.6, 1.2, 0.9])),
    ],
    ids=lambda d: type(d).__name__,
)
def test_telescoped_scalar_hooks_match_generic(rng, d):
    """Telescoped hook values == logpdf(inverse(v)) + logdet at moderate v,
    and grads agree (the hook replaces the exp/log round-trip exactly)."""
    u = unconstrain(d)
    v = jnp.asarray(rng.standard_normal((200, u.linked_vec_length)) * 1.5)
    lp = np.asarray(u.linked_logdensity(v))

    def generic(vv):
        x, ld = u.from_linked_vec(vv)
        return d.logpdf(x) + ld

    ref = np.asarray(generic(v))
    np.testing.assert_allclose(lp, ref, rtol=1e-12, atol=1e-12)
    g = jax.grad(lambda v: jnp.sum(u.linked_logdensity(v)))(v)
    gr = jax.grad(lambda v: jnp.sum(generic(v)))(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), rtol=1e-9)
