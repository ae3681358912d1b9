"""Pallas kernel numerical-equivalence tests (interpret mode on CPU;
the jnp implementations are the ground truth — SURVEY.md §7 step 9
"target bit-identical logdetJ vs the jnp versions")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bijectors.bijectors.simplex import SimplexBijector, _simplex_inverse
from tpu_bijectors.kernels.simplex import (
    simplex_forward_logdet_pallas,
    simplex_inverse_pallas,
)


@pytest.mark.parametrize("B,K", [(7, 4), (130, 8), (256, 17), (64, 33)])
def test_simplex_inverse_pallas_bitident(B, K, rng):
    y = jnp.asarray(rng.standard_normal((B, K - 1)), jnp.float32)
    x_ref = _simplex_inverse(y)
    x_pal = simplex_inverse_pallas(y, interpret=True)
    assert bool(jnp.all(x_ref == x_pal)), "pallas inverse not bit-identical"


@pytest.mark.parametrize("B,K", [(16, 5), (128, 12)])
def test_simplex_forward_pallas_close(B, K, rng):
    b = SimplexBijector()
    x = jnp.asarray(rng.dirichlet(np.ones(K), B), jnp.float32)
    y_ref, ld_ref = b.forward_and_log_det(x)
    y_pal, ld_pal = simplex_forward_logdet_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_pal), np.asarray(ld_ref), atol=2e-5)


def test_pallas_dispatch_is_tpu_only(rng):
    """On CPU the scan path is used; outputs identical either way."""
    b = SimplexBijector()
    y = jnp.asarray(rng.standard_normal((2048, 7)), jnp.float32)
    x = b.inverse(y)  # must NOT hit pallas on cpu backend
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(_simplex_inverse(y)), atol=0
    )


def test_kernels_toggle():
    from tpu_bijectors import kernels

    assert kernels.enabled()
    kernels.enable(False)
    assert not kernels.enabled()
    kernels.enable(True)


@pytest.mark.parametrize("B,K", [(16, 4), (130, 8), (64, 12)])
def test_simplex_inverse_logdet_pallas_close(B, K, rng):
    from tpu_bijectors.bijectors.simplex import _simplex_inverse_logdet_jnp
    from tpu_bijectors.kernels.simplex import simplex_inverse_logdet_pallas

    y = jnp.asarray(rng.standard_normal((B, K - 1)), jnp.float32)
    x_ref, ld_ref = _simplex_inverse_logdet_jnp(y)
    x_pal, ld_pal = simplex_inverse_logdet_pallas(y, interpret=True)
    assert bool(jnp.all(x_ref == x_pal)), "fused inverse x not bit-identical"
    np.testing.assert_allclose(np.asarray(ld_pal), np.asarray(ld_ref), atol=2e-5)


@pytest.mark.parametrize("B,K", [(16, 3), (130, 8), (64, 11)])
def test_lkj_inverse_pallas_close(B, K, rng):
    from tpu_bijectors.bijectors.corr import _vec_corr_inverse_all_jnp
    from tpu_bijectors.kernels.lkj import lkj_inverse_pallas

    y = jnp.asarray(0.5 * rng.standard_normal((B, K * (K - 1) // 2)), jnp.float32)
    X_ref, lj_ref, ldw_ref = _vec_corr_inverse_all_jnp(y)
    X_pal, lj_pal, ldw_pal = lkj_inverse_pallas(y, K, interpret=True)
    np.testing.assert_allclose(np.asarray(X_pal), np.asarray(X_ref), atol=3e-5)
    np.testing.assert_allclose(np.asarray(lj_pal), np.asarray(lj_ref), atol=3e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ldw_pal), np.asarray(ldw_ref), atol=3e-5, rtol=2e-5)


def test_lkj_pallas_grad_routes_through_jnp(rng):
    """The custom_jvp wrapper must differentiate via the jnp path."""
    from tpu_bijectors.bijectors.corr import (
        _vec_corr_inverse_all_jnp,
        _vec_corr_inverse_all_pallas,
    )

    y = jnp.asarray(0.3 * rng.standard_normal((4, 6)), jnp.float64)
    g_ref = jax.grad(lambda y: jnp.sum(_vec_corr_inverse_all_jnp(y)[1]))(y)
    # grad of the pallas-wrapped fn never executes the kernel (jvp rule)
    g_pal = jax.grad(lambda y: jnp.sum(_vec_corr_inverse_all_pallas(y, 4)[1]))(y)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=1e-12)


@pytest.mark.parametrize("B,K", [(16, 3), (130, 8), (64, 12)])
def test_pd_inverse_pallas_close(B, K, rng):
    from tpu_bijectors.bijectors.pd import _pd_inverse_all_jnp
    from tpu_bijectors.kernels.pd import pd_inverse_pallas

    y = jnp.asarray(0.4 * rng.standard_normal((B, K * (K + 1) // 2)), jnp.float32)
    X_ref, lj_ref, L_ref = _pd_inverse_all_jnp(y)
    X_pal, lj_pal, L_pal = pd_inverse_pallas(y, K, interpret=True)
    np.testing.assert_allclose(np.asarray(L_pal), np.asarray(L_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(X_pal), np.asarray(X_ref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lj_pal), np.asarray(lj_ref), atol=3e-5, rtol=2e-5)


@pytest.mark.parametrize("B,K", [(16, 3), (130, 8)])
def test_lkj_logdet_pallas_close(B, K, rng):
    """logdensity-only LKJ kernel == the full kernel's (logJ, log_diag)."""
    from tpu_bijectors.bijectors.corr import _vec_corr_logdet_jnp
    from tpu_bijectors.kernels.lkj import lkj_logdet_pallas

    y = jnp.asarray(0.5 * rng.standard_normal((B, K * (K - 1) // 2)), jnp.float32)
    lj_ref, ldw_ref = _vec_corr_logdet_jnp(y)
    lj_pal, ldw_pal = lkj_logdet_pallas(y, K, interpret=True)
    np.testing.assert_allclose(np.asarray(lj_pal), np.asarray(lj_ref), atol=3e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ldw_pal), np.asarray(ldw_ref), atol=3e-5, rtol=2e-5)


@pytest.mark.parametrize("B,K", [(16, 4), (130, 16)])
def test_simplex_wlog_pallas_close(B, K, rng):
    from tpu_bijectors.bijectors.simplex import _simplex_inverse_logdet_wlog_jnp
    from tpu_bijectors.kernels.simplex import simplex_inverse_logdet_wlog_pallas

    y = jnp.asarray(rng.standard_normal((B, K - 1)), jnp.float32)
    am1 = jnp.asarray(rng.standard_normal(K), jnp.float32)
    x_r, ld_r, wl_r = _simplex_inverse_logdet_wlog_jnp(y, am1)
    x_p, ld_p, wl_p = simplex_inverse_logdet_wlog_pallas(y, am1, interpret=True)
    assert bool(jnp.all(x_r == x_p))
    np.testing.assert_allclose(np.asarray(ld_p), np.asarray(ld_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(wl_p), np.asarray(wl_r), atol=3e-5, rtol=1e-5)


def test_simplex_wlog_traced_alpha(rng):
    """alpha as a jit ARGUMENT must not decline the fusion: the weights ride
    into the kernel as a lane-broadcast operand (dists/multivariate.py
    fused_linked_logdensity no longer requires concrete alpha)."""
    from tpu_bijectors.bijectors.simplex import _simplex_inverse_logdet_wlog_jnp
    from tpu_bijectors.kernels.simplex import simplex_inverse_logdet_wlog_pallas

    y = jnp.asarray(rng.standard_normal((256, 7)) * 0.4, jnp.float32)
    am1 = jnp.asarray(rng.uniform(0.2, 3.0, 8), jnp.float32)

    @jax.jit
    def f(y, am1):
        return simplex_inverse_logdet_wlog_pallas(y, am1, interpret=True)

    x_p, ld_p, wl_p = f(y, am1)
    x_r, ld_r, wl_r = _simplex_inverse_logdet_wlog_jnp(y, am1)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(wl_p), np.asarray(wl_r), atol=5e-5)
    # grads (through the custom_jvp jnp route) in BOTH args
    from tpu_bijectors.bijectors.simplex import simplex_inverse_logdet_wlog

    g = jax.grad(lambda y, a: jnp.sum(simplex_inverse_logdet_wlog(y, a)[2]), (0, 1))
    gy, ga = g(jnp.asarray(y, jnp.float64), jnp.asarray(am1, jnp.float64))
    gyr, gar = jax.grad(
        lambda y, a: jnp.sum(_simplex_inverse_logdet_wlog_jnp(y, a)[2]), (0, 1)
    )(jnp.asarray(y, jnp.float64), jnp.asarray(am1, jnp.float64))
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gyr), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gar), rtol=1e-10)


def test_pd_logdensity_kernel_modes(rng):
    """Fused PD logdensity kernel (kernels/pd.py pd_logdensity_pallas):
    logJ/sum_ydiag/trace vs the jnp reference, both trace modes
    (dot = Wishart tr(S^-1 X); solve = InverseWishart forward substitution)."""
    from tpu_bijectors.bijectors.pd import _pd_logdensity_jnp
    from tpu_bijectors.kernels.pd import pd_logdensity_pallas

    K = 5
    y = jnp.asarray(rng.standard_normal((64, K * (K + 1) // 2)) * 0.4, jnp.float32)
    Cs = rng.standard_normal((K, K)).astype(np.float32)
    Cs = Cs @ Cs.T  # symmetric, the S^-1 use case
    Ct = np.tril(rng.standard_normal((K, K))).astype(np.float32)

    for C, mode in ((Cs, "dot"), (Ct, "solve")):
        lj, sd, tr = pd_logdensity_pallas(y, K, jnp.asarray(C), mode, interpret=True)
        lj_r, sd_r, tr_r = _pd_logdensity_jnp(y, jnp.asarray(C), mode)
        np.testing.assert_allclose(np.asarray(lj), np.asarray(lj_r), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sd), np.asarray(sd_r), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(tr), np.asarray(tr_r), rtol=2e-3)


def test_pd_trace_grad_kernel_modes(rng):
    """Dedicated PD backward kernel (kernels/pd.py pd_trace_grad_pallas):
    d(trace)/d(y) vs AD of the jnp reference, both trace modes and both
    layouts (batch-major and pre-transposed)."""
    from tpu_bijectors.bijectors.pd import _tr_grad_jnp
    from tpu_bijectors.kernels.pd import pd_trace_grad_pallas

    K = 5
    y = jnp.asarray(rng.standard_normal((64, K * (K + 1) // 2)) * 0.4, jnp.float32)
    Cs = rng.standard_normal((K, K)).astype(np.float32)
    Cs = Cs @ Cs.T
    Ct = np.tril(rng.standard_normal((K, K))).astype(np.float32)

    for C, mode in ((Cs, "dot"), (Ct, "solve")):
        ref = _tr_grad_jnp(y, jnp.asarray(C), mode)
        g = pd_trace_grad_pallas(y, K, jnp.asarray(C), mode, interpret=True)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=2e-3, atol=1e-4)
        gt = pd_trace_grad_pallas(
            y.T, K, jnp.asarray(C), mode, pre_t=True, interpret=True
        )
        np.testing.assert_allclose(np.asarray(gt), np.asarray(ref.T), rtol=2e-3, atol=1e-4)


def test_wishart_family_hook_assembly(rng):
    """The Wishart/InverseWishart fused hooks must assemble EXACTLY
    logpdf(x) + ld: checked with the jnp composition standing in for the
    kernel (same math as the custom_jvp tangent route)."""
    from tpu_bijectors import dists
    from tpu_bijectors.bijectors.pd import _pd_logdensity_jnp
    from tpu_bijectors.dists.matrix import _mv_lgamma
    from tpu_bijectors.utils import cholesky_lower
    from tpu_bijectors.vectorize import unconstrain

    K = 4
    S = np.eye(K) + 0.3 * np.ones((K, K))
    for cls, param in ((dists.Wishart, S), (dists.InverseWishart, S)):
        d = cls(K + 3.0, jnp.asarray(S, jnp.float64))
        u = unconstrain(d)
        v = 0.3 * jnp.asarray(rng.standard_normal((16, u.linked_vec_length)))
        x, ld = u.from_linked_vec(v)
        want = d.logpdf(x) + ld
        dtype = v.dtype
        vdf = jnp.asarray(d.df, dtype)
        if cls is dists.Wishart:
            Sc = cholesky_lower(jnp.asarray(S, dtype))
            Sinv = jax.scipy.linalg.cho_solve((Sc, True), jnp.eye(K, dtype=dtype))
            lj, sd, tr = _pd_logdensity_jnp(v, Sinv, "dot")
            logdetS = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Sc)))
            lp = (0.5 * (vdf - K - 1.0) * 2.0 * sd - 0.5 * tr
                  - 0.5 * vdf * K * np.log(2.0) - 0.5 * vdf * logdetS
                  - _mv_lgamma(0.5 * vdf, K))
        else:
            Pc = cholesky_lower(jnp.asarray(S, dtype))
            lj, sd, tr = _pd_logdensity_jnp(v, Pc, "solve")
            logdetP = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Pc)))
            lp = (0.5 * vdf * logdetP - 0.5 * (vdf + K + 1.0) * 2.0 * sd
                  - 0.5 * tr - 0.5 * vdf * K * np.log(2.0)
                  - _mv_lgamma(0.5 * vdf, K))
        np.testing.assert_allclose(
            np.asarray(lp + lj), np.asarray(want), rtol=1e-10,
            err_msg=cls.__name__,
        )
