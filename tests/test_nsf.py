"""NSF-AR (autoregressive spline flow): identity at init, strict
autoregression, exact D-pass inversion (inside and outside the spline
box), and a bimodal MLE fit an affine MAF cannot express in one layer."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors.bijectors.base import Invert
from tpu_bijectors.flows import MaskedAutoregressiveSpline, nsf_ar_stack


def test_identity_at_init_bias(key):
    """Zero head weights (the init construction up to the 0.01 noise) give
    the exact identity inside [-B, B]: check with the noise zeroed."""
    from tpu_bijectors.tree import replace

    layer = MaskedAutoregressiveSpline.init(key, 4, dtype=jnp.float64)
    layer = replace(layer, w2=jnp.zeros_like(layer.w2), w1=jnp.zeros_like(layer.w1))
    x = jnp.linspace(-3.5, 3.5, 29).reshape(-1, 1) * jnp.ones((1, 4))
    y, ld = layer.forward_and_log_det(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-12)


def test_jacobian_strictly_autoregressive(key):
    dim = 5
    layer = MaskedAutoregressiveSpline.init(key, dim, dtype=jnp.float64)
    x = 0.8 * jax.random.normal(jax.random.PRNGKey(1), (dim,), jnp.float64)
    jac = jax.jacfwd(layer.forward)(x)
    np.testing.assert_allclose(np.triu(np.asarray(jac), 1), 0.0, atol=1e-12)
    assert np.all(np.diag(np.asarray(jac)) > 0)  # monotone per coordinate
    _, ld = layer.forward_and_log_det(x)
    np.testing.assert_allclose(
        float(ld), np.sum(np.log(np.diag(np.asarray(jac)))), rtol=1e-9
    )


def test_inverse_exact_in_dim_passes(key):
    dim = 6
    layer = MaskedAutoregressiveSpline.init(key, dim, dtype=jnp.float64)
    # mix of points inside the box and in the identity tails
    x = jnp.concatenate(
        [
            0.8 * jax.random.normal(jax.random.PRNGKey(2), (8, dim), jnp.float64),
            6.0 * jax.random.normal(jax.random.PRNGKey(3), (4, dim), jnp.float64),
        ]
    )
    y, ld_f = layer.forward_and_log_det(x)
    x2, ld_i = layer.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-9)


def test_stack_roundtrip(key):
    dim = 3
    chain = nsf_ar_stack(key, dim, n_layers=2, dtype=jnp.float64)
    x = 0.9 * jax.random.normal(jax.random.PRNGKey(4), (16, dim), jnp.float64)
    y, ld = chain.forward_and_log_det(x)
    x2, ld_i = chain.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ld + ld_i), 0.0, atol=1e-8)


def test_nsf_fits_bimodal_where_affine_cannot(key):
    """MLE on a 1D two-component mixture: a SINGLE spline layer must reach
    a far better NLL than a single affine MAF layer (which can only shift/
    scale a Gaussian — provably unimodal pushforward)."""
    import optax

    from tpu_bijectors.flows import MaskedAutoregressive

    rng = np.random.default_rng(9)
    comp = rng.random(4096) < 0.5
    data = jnp.asarray(
        np.where(comp, -2.0 + 0.5 * rng.standard_normal(4096),
                 2.0 + 0.5 * rng.standard_normal(4096))[:, None],
        jnp.float64,
    )

    def fit(flow, steps=600, lr=5e-3):
        def nll(flow):
            u, ld = Invert(flow).forward_and_log_det(data)
            logq = -0.5 * jnp.sum(u * u, -1) - 0.5 * jnp.log(2 * jnp.pi) + ld
            return -jnp.mean(logq)

        opt = optax.adam(lr)
        state = opt.init(flow)

        @jax.jit
        def step(flow, state):
            loss, g = jax.value_and_grad(nll)(flow)
            upd, state = opt.update(g, state)
            return optax.apply_updates(flow, upd), state, loss

        for _ in range(steps):
            flow, state, loss = step(flow, state)
        return float(loss)

    nll_spline = fit(MaskedAutoregressiveSpline.init(key, 1, n_bins=10,
                                                     dtype=jnp.float64))
    nll_affine = fit(MaskedAutoregressive.init(key, 1, dtype=jnp.float64))
    # analytic NLL of the true mixture ~ 1.41; affine-of-Gaussian is stuck
    # near the moment-matched Gaussian ~ 2.05
    assert nll_spline < nll_affine - 0.4, (nll_spline, nll_affine)
    assert nll_spline < 1.6


def test_flow_stack_kinds_and_neutra_nsf(key):
    """flow_stack dispatches by kind; fit_neutra_flow(kind='nsf') trains a
    spline transport stably on a curved target."""
    import pytest

    from tpu_bijectors.flows import flow_stack
    from tpu_bijectors.infer import fit_neutra_flow, neutra_logdensity

    assert flow_stack(key, 3, "maf", n_layers=2, dtype=jnp.float64) is not None
    with pytest.raises(ValueError, match="kind"):
        flow_stack(key, 3, "glow")

    def logp(v):  # banana
        x, y = v[..., 0], v[..., 1]
        return -0.5 * (x**2 / 4.0 + (y - 0.5 * x**2) ** 2)

    logp.batch_capable = True
    res = fit_neutra_flow(logp, key, 2, kind="nsf", n_layers=2, hidden=16,
                          n_steps=400, n_mc=32, dtype=jnp.float64)
    assert np.all(np.isfinite(np.asarray(res.losses)))
    assert float(res.losses[-50:].mean()) < float(res.losses[:50].mean())
    lz = neutra_logdensity(logp, res.flow)
    z = 0.5 * jax.random.normal(jax.random.PRNGKey(11), (9, 2), jnp.float64)
    assert np.all(np.isfinite(np.asarray(lz(z))))
