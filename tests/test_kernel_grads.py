"""Closed-form tangent rules for the Pallas-dispatched fused paths.

The production custom_jvp rules keep the Pallas PRIMAL under
differentiation (value_and_grad of `linked_logdensity` is the NUTS hot
path) and pair it with hand-derived LINEAR tangents
(bijectors/corr.py::_lkj_logdet_tangent,
bijectors/simplex.py::_simplex_inverse_tangent) that XLA can transpose
for reverse mode. These tests pin the tangents against jax.jvp of the
jnp reference implementations — including clamp-binding extremes — and
check reverse-mode transposition end to end (CPU, f64; the Pallas
primal itself is equivalence-tested in test_kernels.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bijectors.bijectors.corr import (
    _chol_logdet_jnp,
    _lkj_logdet_tangent,
    _vec_corr_logdet_jnp,
)
from tpu_bijectors.bijectors.simplex import (
    _simplex_inverse,
    _simplex_inverse_logdet_wlog_jnp,
    _simplex_inverse_tangent,
    _wlog_tangents,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape))


@pytest.mark.parametrize("K", [2, 3, 5, 8])
@pytest.mark.parametrize("chol", [False, True])
def test_lkj_logdet_tangent_matches_ad(rng, K, chol):
    P = K * (K - 1) // 2
    y = 1.5 * _rand(rng, 7, P)
    dy = _rand(rng, 7, P)
    ref = _chol_logdet_jnp if chol else _vec_corr_logdet_jnp
    _, (dlj_ref, dldw_ref) = jax.jvp(ref, (y,), (dy,))
    dlj, dldw = _lkj_logdet_tangent(y, dy, K, chol=chol)
    np.testing.assert_allclose(dlj, dlj_ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(dldw, dldw_ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("chol", [False, True])
def test_lkj_logdet_tangent_transposes(rng, chol):
    """Reverse mode through a custom_jvp with the production tangent rule
    must equal grad of the plain jnp path (exercises XLA's transposition
    of the linear tangent — exactly what `grad(linked_logdensity)` does
    when the Pallas kernel dispatches on TPU)."""
    K = 6
    P = K * (K - 1) // 2
    ref = _chol_logdet_jnp if chol else _vec_corr_logdet_jnp

    @jax.custom_jvp
    def fused(y):
        return ref(y)

    @fused.defjvp
    def fused_jvp(primals, tangents):
        (y,) = primals
        (dy,) = tangents
        return ref(y), _lkj_logdet_tangent(y, dy, K, chol=chol)

    y = 1.2 * _rand(rng, 5, P)
    w = _rand(rng, 5, K)

    def scalar(f):
        def g(y):
            lj, ldw = f(y)
            return jnp.sum(lj) + jnp.sum(w * ldw)

        return g

    g_fused = jax.grad(scalar(fused))(y)
    g_ref = jax.grad(scalar(ref))(y)
    np.testing.assert_allclose(g_fused, g_ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("K", [2, 4, 9, 16])
def test_simplex_inverse_tangent_matches_ad(rng, K):
    y = 2.0 * _rand(rng, 11, K - 1)
    dy = _rand(rng, 11, K - 1)
    x, dx_ref = jax.jvp(_simplex_inverse, (y,), (dy,))
    dx = _simplex_inverse_tangent(x, y, dy)
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-9, atol=1e-12)


def test_simplex_inverse_tangent_extremes(rng):
    """Clamp-binding inputs: the closed-form masks must match the scan's
    AD exactly where boundaries saturate (the 1e10-jump robustness regime)."""
    K = 6
    y = jnp.asarray(
        [
            [50.0, -50.0, 40.0, -40.0, 60.0],
            [1e10, 1e10, -1e10, 0.0, 1e10],
            [-1e10, -1e10, -1e10, -1e10, -1e10],
            [37.0, 0.1, -0.2, 36.9, 0.0],
        ]
    )
    dy = _rand(rng, 4, K - 1)
    x, dx_ref = jax.jvp(_simplex_inverse, (y,), (dy,))
    dx = _simplex_inverse_tangent(x, y, dy)
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-9, atol=1e-12)


def test_simplex_wlog_tangents_match_ad(rng):
    K = 7
    y = 1.5 * _rand(rng, 9, K - 1)
    dy = _rand(rng, 9, K - 1)
    am1 = jnp.asarray(rng.uniform(0.5, 3.0, K))
    dam1 = _rand(rng, K)
    x = _simplex_inverse(y)
    (_, _, _), (dx_ref, dld_ref, dwl_ref) = jax.jvp(
        _simplex_inverse_logdet_wlog_jnp, (y, am1), (dy, dam1)
    )
    dx, dld, dwl = _wlog_tangents(x, y, am1, dy, dam1)
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dld, dld_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(dwl, dwl_ref, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("mode", ["dot", "solve"])
def test_pd_logdensity_tangent_matches_ad(rng, mode):
    from tpu_bijectors.bijectors.pd import _pd_logdensity_jnp, _pd_logdensity_tangent

    K = 5
    P = K * (K + 1) // 2
    y = 0.6 * _rand(rng, 7, P)
    dy = _rand(rng, 7, P)
    if mode == "dot":
        Cm = rng.standard_normal((K, K))
        C = jnp.asarray(Cm @ Cm.T)  # symmetric (the S^-1 use case)
        dCm = rng.standard_normal((K, K))
        dC = jnp.asarray(dCm + dCm.T)
    else:
        C = jnp.asarray(np.tril(rng.standard_normal((K, K))))
        dC = jnp.asarray(np.tril(rng.standard_normal((K, K))))
    _, ref = jax.jvp(lambda y, C: _pd_logdensity_jnp(y, C, mode), (y, C), (dy, dC))
    out = _pd_logdensity_tangent(y, C, dy, dC, K, mode)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("mode", ["dot", "solve"])
def test_pd_logdensity_reverse_mode(rng, mode):
    from tpu_bijectors.bijectors.pd import _pd_logdensity_jnp, _pd_logdensity_tangent

    K = 4

    @jax.custom_jvp
    def fused(y, C):
        return _pd_logdensity_jnp(y, C, mode)

    @fused.defjvp
    def fused_jvp(primals, tangents):
        y, C = primals
        dy, dC = tangents
        return _pd_logdensity_jnp(y, C, mode), _pd_logdensity_tangent(
            y, dy=dy, C=C, dC=dC, K=K, mode=mode
        )

    y = 0.5 * _rand(rng, 6, K * (K + 1) // 2)
    Cm = rng.standard_normal((K, K))
    C = jnp.asarray(Cm @ Cm.T if mode == "dot" else np.tril(Cm))

    def scalar(f):
        def g(y, C):
            lj, sd, tr = f(y, C)
            return jnp.sum(lj) + 2.0 * jnp.sum(sd) - 0.5 * jnp.sum(tr)

        return g

    gy, gC = jax.grad(scalar(fused), argnums=(0, 1))(y, C)
    gy_ref, gC_ref = jax.grad(
        scalar(lambda y, C: _pd_logdensity_jnp(y, C, mode)), argnums=(0, 1)
    )(y, C)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(gC, gC_ref, rtol=1e-9, atol=1e-11)


def test_simplex_wlog_reverse_mode(rng):
    """grad in BOTH args through a custom_jvp wired exactly like the
    production rule (jnp primal standing in for the Pallas kernel)."""
    K = 5

    @jax.custom_jvp
    def fused(y, am1):
        return _simplex_inverse_logdet_wlog_jnp(y, am1)

    @fused.defjvp
    def fused_jvp(primals, tangents):
        y, am1 = primals
        dy, dam1 = tangents
        x, ld, wlog = _simplex_inverse_logdet_wlog_jnp(y, am1)
        dx, dld, dwl = _wlog_tangents(x, y, am1, dy, dam1)
        return (x, ld, wlog), (dx, dld, dwl)

    y = 1.3 * _rand(rng, 6, K - 1)
    am1 = jnp.asarray(rng.uniform(0.5, 3.0, K))

    def scalar(f):
        def g(y, am1):
            x, ld, wlog = f(y, am1)
            return jnp.sum(x * x) + jnp.sum(ld) + 2.0 * jnp.sum(wlog)

        return g

    gy, ga = jax.grad(scalar(fused), argnums=(0, 1))(y, am1)
    gy_ref, ga_ref = jax.grad(
        scalar(_simplex_inverse_logdet_wlog_jnp), argnums=(0, 1)
    )(y, am1)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(ga, ga_ref, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("mode", ["dot", "solve"])
@pytest.mark.parametrize("transposed", [False, True])
def test_pd_diffable_symbolic_zero_grads(rng, mode, transposed):
    """grad through the PRODUCTION custom_jvp rules (symbolic_zeros=True)
    for every tangent pattern: y-only (the sampler-hot case, dC symbolic
    zero), C-only, and both — vs grad of the plain jnp path. CPU exercises
    the fallback/instantiation branches; the kernel branch body is pinned
    by test_pd_trace_grad_kernel_modes + the interpret wiring test below."""
    from tpu_bijectors.bijectors.pd import (
        _pd_logdensity_jnp,
        _pd_logdensity_pallas_diffable,
        _pd_logdensity_pallas_t,
    )

    K = 4
    y = 0.5 * _rand(rng, 6, K * (K + 1) // 2)
    Cm = rng.standard_normal((K, K))
    C = jnp.asarray(Cm @ Cm.T if mode == "dot" else np.tril(Cm))

    if transposed:
        fused = lambda y, C: _pd_logdensity_pallas_t(y.T, K, C, mode)
    else:
        fused = lambda y, C: _pd_logdensity_pallas_diffable(y, K, C, mode)
    ref = lambda y, C: _pd_logdensity_jnp(y, C, mode)

    def scalar(f):
        def g(y, C):
            lj, sd, tr = f(y, C)
            return jnp.sum(lj) + 2.0 * jnp.sum(sd) - 0.5 * jnp.sum(tr)

        return g

    # y-only (dC is a symbolic zero), C-only (dy symbolic zero), both
    gy = jax.grad(scalar(fused), argnums=0)(y, C)
    gy_ref = jax.grad(scalar(ref), argnums=0)(y, C)
    np.testing.assert_allclose(gy, gy_ref, rtol=1e-9, atol=1e-11)
    gC = jax.grad(scalar(fused), argnums=1)(y, C)
    gC_ref = jax.grad(scalar(ref), argnums=1)(y, C)
    np.testing.assert_allclose(gC, gC_ref, rtol=1e-9, atol=1e-11)
    gy2, gC2 = jax.grad(scalar(fused), argnums=(0, 1))(y, C)
    np.testing.assert_allclose(gy2, gy_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(gC2, gC_ref, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("mode", ["dot", "solve"])
def test_pd_kernel_tangent_wiring_interpret(rng, mode):
    """The TPU solve-branch tangent assembly — affine (logJ, sumd) parts +
    sum(gtr * dy) with gtr from the dedicated backward kernel — must equal
    jax.jvp of the jnp composition with dC = 0 (interpret-mode kernel)."""
    from tpu_bijectors.bijectors.pd import (
        _pd_affine_tangents,
        _pd_logdensity_jnp,
    )
    from tpu_bijectors.kernels.pd import pd_trace_grad_pallas

    K = 5
    y = 0.4 * _rand(rng, 8, K * (K + 1) // 2)
    dy = _rand(rng, 8, K * (K + 1) // 2)
    Cm = rng.standard_normal((K, K))
    C = jnp.asarray(Cm @ Cm.T if mode == "dot" else np.tril(Cm))

    _, (dlj_r, dsd_r, dtr_r) = jax.jvp(
        lambda yy: _pd_logdensity_jnp(yy, C, mode), (y,), (dy,)
    )
    gtr = pd_trace_grad_pallas(y, K, C, mode, interpret=True)
    dlj, dsd = _pd_affine_tangents(dy, K, -1)
    dtr = jnp.sum(gtr * dy, axis=-1)
    np.testing.assert_allclose(dlj, dlj_r, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(dsd, dsd_r, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(dtr, dtr_r, rtol=1e-5, atol=1e-7)
    # transposed layout: same assembly along axis 0
    gtrT = pd_trace_grad_pallas(y.T, K, C, mode, pre_t=True, interpret=True)
    dljT, dsdT = _pd_affine_tangents(dy.T, K, 0)
    np.testing.assert_allclose(dljT, dlj_r, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(dsdT, dsd_r, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        jnp.sum(gtrT * dy.T, axis=0), dtr_r, rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize("mode", ["dot", "solve"])
def test_pd_tr_grad_higher_order(rng, mode):
    """The backward-kernel wrapper stays differentiable: jvp through
    _pd_tr_grad (its inner custom_jvp routes through the jnp AD path) must
    match jvp of _tr_grad_jnp — forward-over-reverse (jacfwd of grad)
    needs exactly this."""
    from tpu_bijectors.bijectors.pd import _pd_tr_grad, _tr_grad_jnp

    K = 4
    y = 0.5 * _rand(rng, 5, K * (K + 1) // 2)
    dy = _rand(rng, 5, K * (K + 1) // 2)
    Cm = rng.standard_normal((K, K))
    C = jnp.asarray(Cm @ Cm.T if mode == "dot" else np.tril(Cm))
    dC = jnp.zeros_like(C)

    out, dout = jax.jvp(
        lambda yy, CC: _pd_tr_grad(yy, K, CC, mode, False), (y, C), (dy, dC)
    )
    out_r, dout_r = jax.jvp(
        lambda yy, CC: _tr_grad_jnp(yy, CC, mode), (y, C), (dy, dC)
    )
    np.testing.assert_allclose(out, out_r, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(dout, dout_r, rtol=1e-9, atol=1e-11)
