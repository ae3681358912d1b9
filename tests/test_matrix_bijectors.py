"""PD / Corr / Cholesky bijector properties (reference test/bijectors/pd.jl,
test/bijectors/corr.jl, test/legacy_interface.jl matrix sections)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.testing import check_logdet_against_jacobian
from tpu_bijectors.utils import triu_to_vec, vec_to_triu


def _rand_spd(rng, n):
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.mark.parametrize("n", [2, 3, 5])
def test_pd_roundtrip(n, rng):
    X = _rand_spd(rng, n)
    for b in [tb.PDBijector(), tb.PDVecBijector()]:
        y, ld = b.forward_and_log_det(X)
        X_rt, ld_inv = b.inverse_and_log_det(y)
        np.testing.assert_allclose(np.asarray(X_rt), np.asarray(X), atol=1e-8)
        np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-8)


def test_pdvec_shape():
    b = tb.PDVecBijector()
    assert b.forward_event_shape((4, 4)) == (10,)
    assert b.inverse_event_shape((10,)) == (4, 4)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_pdvec_logdet_vs_ad(n, rng):
    """Square-Jacobian: free coords of X = packed lower triangle."""
    b = tb.PDVecBijector()
    X = _rand_spd(rng, n)
    _, ld = b.forward_and_log_det(X)

    from tpu_bijectors.utils import tril_to_vec, vec_to_tril

    def flat_fwd(xf):
        L = vec_to_tril(xf)  # strictly: packed lower incl diag
        Xf = L + jnp.swapaxes(L, -1, -2) - jnp.diag(jnp.diagonal(L))
        return b.forward(Xf)

    xf = tril_to_vec(X)
    check_logdet_against_jacobian(flat_fwd, xf, ld, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("K", [2, 3, 5])
def test_corr_roundtrip(K, key):
    X = dists.LKJ(K, 1.0).sample(key)
    for b in [tb.CorrBijector(), tb.VecCorrBijector()]:
        y, ld = b.forward_and_log_det(X)
        X_rt, ld_inv = b.inverse_and_log_det(y)
        np.testing.assert_allclose(np.asarray(X_rt), np.asarray(X), atol=1e-8)
        np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-8)


def test_corr_vec_vs_matrix_agree(key):
    """vec and matrix variants agree (reference test/bijectors/corr.jl:9-40)."""
    K = 4
    X = dists.LKJ(K, 2.0).sample(key)
    bm, bv = tb.CorrBijector(), tb.VecCorrBijector()
    Ym = bm.forward(X)
    yv = bv.forward(X)
    np.testing.assert_allclose(np.asarray(triu_to_vec(Ym, 1)), np.asarray(yv), atol=1e-9)
    _, ldm = bm.forward_and_log_det(X)
    _, ldv = bv.forward_and_log_det(X)
    np.testing.assert_allclose(float(ldm), float(ldv), atol=1e-9)


@pytest.mark.parametrize("K", [2, 3, 4])
def test_veccorr_logdet_vs_ad(K, rng, key):
    """AD check in the unconstrained -> corr direction (square Jacobian via
    the free triangle, reference test/legacy_interface.jl:199-214)."""
    b = tb.VecCorrBijector()
    y = jnp.asarray(rng.standard_normal(K * (K - 1) // 2))
    X, ld_inv = b.inverse_and_log_det(y)

    def flat_inv(yf):
        Xf = b.inverse(yf)
        return triu_to_vec(Xf, 1)

    check_logdet_against_jacobian(flat_inv, y, ld_inv, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("mode", ["U", "L"])
@pytest.mark.parametrize("K", [2, 3, 5])
def test_vec_cholesky_roundtrip(mode, K, key):
    d = dists.LKJCholesky(K, 1.5, mode)
    F = d.sample(key)
    b = tb.VecCholeskyBijector(mode)
    y, ld = b.forward_and_log_det(F)
    assert y.shape == (K * (K - 1) // 2,)
    F_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(F_rt), np.asarray(F), atol=1e-8)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-8)


def test_vec_cholesky_logdet_vs_ad(rng):
    """Unconstrained -> factor free-triangle Jacobian
    (reference test/legacy_interface.jl:217-255)."""
    K = 4
    b = tb.VecCholeskyBijector("U")
    y = jnp.asarray(rng.standard_normal(K * (K - 1) // 2) * 0.5)
    U, ld_inv = b.inverse_and_log_det(y)

    def flat_inv(yf):
        Uf = b.inverse(yf)
        return triu_to_vec(Uf, 1)  # free coords: strict upper (diag determined)

    check_logdet_against_jacobian(flat_inv, y, ld_inv, atol=1e-6, rtol=1e-6)


def test_corr_batched(key):
    K = 3
    X = dists.LKJ(K, 1.0).sample(key, (6,))
    b = tb.VecCorrBijector()
    y, ld = b.forward_and_log_det(X)
    assert y.shape == (6, 3) and ld.shape == (6,)
    np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(X), atol=1e-8)


def test_corr_d1_edge_and_transformed_shapes(key):
    """Reference corr.jl tests d in [1,2,5]: d=1 gives an EMPTY packed vector
    (logdet 0), and transformed(LKJ) has the packed multivariate shape while
    pushing an MvNormal through the inverse gives a matrix distribution
    (test/bijectors/corr.jl:5-42)."""
    b = tb.VecCorrBijector()
    x = jnp.ones((1, 1), jnp.float64)
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (0,) and float(ld) == 0.0
    xi, ldi = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(xi), [[1.0]])
    assert float(ldi) == 0.0

    td = tb.transformed(dists.LKJ(5, 1.0))
    assert td.event_shape == (10,)
    yv = td.sample(key)
    assert yv.shape == (10,)
    assert np.all(np.isfinite(np.asarray(td.logpdf(yv))))

    tdu = tb.transformed(
        dists.MvNormalDiag(jnp.zeros(10, jnp.float64), jnp.ones(10, jnp.float64)),
        tb.inverse(tb.VecCorrBijector()),
    )
    assert tdu.event_shape == (5, 5)
    s = tdu.sample(key)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(s)), 1.0, atol=1e-12)
    assert np.all(np.isfinite(np.asarray(tdu.logpdf(s))))
