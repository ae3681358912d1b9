"""NeuTra: pulled-back density change-of-variables, asymptotic exactness
under an imperfect flow, funnel geometry recovery, and the one-call Model
API."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.flows import maf_stack
from tpu_bijectors.infer import (
    Model,
    fit_neutra_flow,
    neutra_logdensity,
    neutra_sample,
    warmup_and_sample,
)

_LOG2PI = np.log(2.0 * np.pi)


def funnel_logp(v):
    """Neal's funnel: y ~ N(0, 3); x_i | y ~ N(0, exp(y/2))."""
    y, x = v[..., 0], v[..., 1:]
    lp_y = -0.5 * (y / 3.0) ** 2 - np.log(3.0) - 0.5 * _LOG2PI
    lp_x = jnp.sum(
        -0.5 * (x * jnp.exp(-y[..., None] / 2.0)) ** 2
        - y[..., None] / 2.0
        - 0.5 * _LOG2PI,
        -1,
    )
    return lp_y + lp_x


funnel_logp.batch_capable = True


def test_neutra_logdensity_change_of_variables(key):
    """logp_z(z) == logp(flow(z)) + logdetJ, single and batched, with
    finite gradients through the flow."""
    dim = 3
    flow = maf_stack(key, dim, n_layers=2, hidden=8, dtype=jnp.float64)
    logp_z = neutra_logdensity(funnel_logp, flow)
    z = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (7, dim), jnp.float64)
    v, ld = flow.forward_and_log_det(z)
    np.testing.assert_allclose(
        np.asarray(logp_z(z)), np.asarray(funnel_logp(v) + ld), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(logp_z(z[0])), float(funnel_logp(v[0]) + ld[0]), rtol=1e-12
    )
    g = jax.grad(logp_z)(z[0])
    assert np.all(np.isfinite(np.asarray(g)))


def test_neutra_exact_despite_imperfect_flow(key):
    """A barely-trained flow must NOT bias the answer: NUTS in z-space still
    recovers the exact mean/cov of a correlated Gaussian target."""
    rho = 0.8
    cov = np.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(jnp.asarray(cov))
    mean = jnp.asarray([1.5, -0.5])

    def logp(v):
        d = v - mean
        return -0.5 * jnp.einsum("...i,ij,...j->...", d, prec, d)

    logp.batch_capable = True

    res = fit_neutra_flow(
        logp, key, dim=2, n_layers=2, hidden=8, n_steps=150, n_mc=16
    )
    logp_z = neutra_logdensity(logp, res.flow)
    z0 = jax.random.normal(jax.random.PRNGKey(2), (8, 2), jnp.float64)
    z, _, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp_z, k, q, n_warmup=400, n_samples=600, kernel="nuts_batched"
        )
    )(jax.random.PRNGKey(3), z0)
    draws = np.asarray(res.flow.forward(z)).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.1)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.15)


def test_neutra_funnel_variance(key):
    """The classic NeuTra demonstration: on Neal's funnel the transported
    NUTS draws recover Var(y) = 9 (vanilla step-size-adapted NUTS
    underestimates it badly because no single step size fits the neck)."""
    dim = 3  # y + 2 x's
    res = fit_neutra_flow(
        funnel_logp, key, dim, n_layers=4, hidden=64, n_steps=4000, n_mc=128,
        learning_rate=5e-3,
    )
    # funnel_logp is normalized, so the loss IS the KL(q || target) up to MC
    # noise: the fit must have learned the funnel geometry (KL near zero)
    assert float(res.losses[-100:].mean()) < 0.2
    logp_z = neutra_logdensity(funnel_logp, res.flow)
    z0 = jax.random.normal(jax.random.PRNGKey(4), (16, dim), jnp.float64)
    z, _, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp_z, k, q, n_warmup=500, n_samples=1500, kernel="nuts_batched"
        )
    )(jax.random.PRNGKey(5), z0)
    y = np.asarray(res.flow.forward(z))[..., 0].ravel()
    assert abs(y.mean()) < 0.35
    np.testing.assert_allclose(y.var(), 9.0, atol=1.8)


def test_neutra_sample_model_one_call(key):
    """Model-level one-call API: prior-only model, constrained draws match
    the exact prior moments; the returned flow is reusable."""
    m = Model(priors=dists.NamedProduct.of(
        mu=dists.Normal(0.0, 1.0), p=dists.Beta(2.0, 3.0)
    ))
    samples, res, stats = neutra_sample(
        m, key, n_chains=8, n_warmup=300, n_samples=500,
        fit_kwargs=dict(n_steps=400, n_mc=32, n_layers=2, hidden=8),
    )
    mu = np.asarray(samples["mu"]).ravel()
    p = np.asarray(samples["p"]).ravel()
    assert abs(mu.mean()) < 0.1 and abs(mu.std() - 1.0) < 0.1
    assert abs(p.mean() - 0.4) < 0.03  # Beta(2,3) mean
    assert np.all((p > 0) & (p < 1))
    # reuse the trained flow: skips refitting
    s2, res2, _ = neutra_sample(
        m, jax.random.PRNGKey(6), n_chains=4, n_warmup=200, n_samples=200,
        flow=res.flow,
    )
    assert res2.losses.shape == (0,)
    assert abs(np.asarray(s2["mu"]).mean()) < 0.2
