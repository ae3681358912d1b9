"""Masked autoregressive flow: strict-autoregression Jacobian structure,
exact D-pass inversion, log-det vs dense-Jacobian oracle, stack round trip,
and an end-to-end maximum-likelihood fit."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors.bijectors.base import Invert
from tpu_bijectors.flows import MaskedAutoregressive, maf_stack


def _layer(key, dim, dtype=jnp.float64):
    return MaskedAutoregressive.init(key, dim, dtype=dtype)


def test_jacobian_is_strictly_autoregressive(key):
    """∂y_i/∂x_j = 0 for j > i (MADE masks), positive diagonal, and the
    reported log-det equals the sum of log diagonal entries."""
    dim = 5
    layer = _layer(key, dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (dim,), jnp.float64)
    jac = jax.jacfwd(layer.forward)(x)
    np.testing.assert_allclose(np.triu(np.asarray(jac), 1), 0.0, atol=1e-12)
    assert np.all(np.diag(np.asarray(jac)) > 0)
    _, ld = layer.forward_and_log_det(x)
    np.testing.assert_allclose(
        float(ld), np.sum(np.log(np.diag(np.asarray(jac)))), rtol=1e-10
    )


def test_inverse_exact_in_dim_passes(key):
    """The fori_loop fixed point inverts EXACTLY (not approximately) after
    dim passes; log-dets telescope to zero."""
    dim = 6
    layer = _layer(key, dim)
    x = 0.7 * jax.random.normal(jax.random.PRNGKey(2), (8, dim), jnp.float64)
    y, ld_f = layer.forward_and_log_det(x)
    x2, ld_i = layer.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(ld_f + ld_i), 0.0, atol=1e-12
    )


def test_stack_roundtrip_and_permutes(key):
    dim = 4
    chain = maf_stack(key, dim, n_layers=3, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, dim), jnp.float64)
    y, ld = chain.forward_and_log_det(x)
    x2, ld_i = chain.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ld + ld_i), 0.0, atol=1e-10)
    # the stack must NOT itself be autoregressive (permutes mix order):
    jac = jax.jacfwd(lambda v: chain.forward(v))(x[0])
    assert np.any(np.abs(np.triu(np.asarray(jac), 1)) > 1e-8)


def test_maf_mle_fit_correlated_gaussian(key):
    """Fit Invert(maf_stack) by maximum likelihood on correlated Gaussian
    data; the pushforward samples must reproduce the data covariance."""
    import optax

    rho = 0.85
    cov = np.array([[1.0, rho], [rho, 1.0]])
    chol = np.linalg.cholesky(cov)
    data = jnp.asarray(
        np.random.default_rng(5).standard_normal((2048, 2)) @ chol.T,
        jnp.float64,
    )
    flow = maf_stack(key, 2, n_layers=3, hidden=16, dtype=jnp.float64)

    def nll(flow):
        u, ld = Invert(flow).forward_and_log_det(data)  # data -> base
        logq = -0.5 * jnp.sum(u * u, -1) - jnp.log(2 * jnp.pi) + ld
        return -jnp.mean(logq)

    opt = optax.adam(5e-3)
    state = opt.init(flow)

    @jax.jit
    def step(flow, state):
        loss, g = jax.value_and_grad(nll)(flow)
        upd, state = opt.update(g, state)
        return optax.apply_updates(flow, upd), state, loss

    l0 = float(nll(flow))
    for _ in range(400):
        flow, state, loss = step(flow, state)
    assert float(loss) < l0 - 0.2

    z = jax.random.normal(jax.random.PRNGKey(7), (8192, 2), jnp.float64)
    samples = np.asarray(flow.forward(z))
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.12)


def test_maf_as_advi_flow_posterior(key):
    """FlowPosterior(maf_stack) trains under fit_advi on a correlated
    Gaussian target (forward-only ELBO — the fast direction)."""
    from tpu_bijectors.infer import FlowPosterior, fit_advi

    rho = 0.7
    prec = jnp.linalg.inv(jnp.asarray([[1.0, rho], [rho, 1.0]]))
    mean = jnp.asarray([1.0, -2.0])

    def logp(v):
        d = v - mean
        return -0.5 * d @ prec @ d

    q0 = FlowPosterior(maf_stack(jax.random.PRNGKey(9), 2, n_layers=2,
                                 hidden=16, dtype=jnp.float64))
    res = fit_advi(logp, key, dim=2, q=q0, n_steps=800, n_mc=64,
                   learning_rate=5e-3, dtype=jnp.float64)
    assert float(res.losses[-50:].mean()) < float(res.losses[:50].mean()) - 0.5
    draws, _ = res.q.sample_with_logq(jax.random.PRNGKey(11), 4096, 2)
    np.testing.assert_allclose(np.asarray(draws).mean(0), mean, atol=0.15)
