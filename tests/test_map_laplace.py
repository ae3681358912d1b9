"""MAP + Laplace approximation: exactness on Gaussian-conjugate targets
(where Laplace is exact), link-aware mode on constrained supports, and the
sampling/evidence/marginal-sd API (posterior-moment tier per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.infer import (
    Model,
    fit_map,
    laplace_approximation,
    map_laplace,
)


def _gaussian_model():
    """x ~ N(mu0, s0²) (dim 3, identity link), y | x ~ N(x, s²): posterior,
    MAP, covariance, and evidence all analytic; Laplace is EXACT here."""
    mu0 = jnp.array([0.5, -1.0, 2.0])
    s0 = jnp.array([1.0, 2.0, 0.5])
    y = jnp.array([1.0, 0.0, 1.0])
    s = 0.7
    model = Model(
        priors=dists.NamedProduct.of(x=dists.MvNormalDiag(mu0, s0)),
        loglik=lambda t: jnp.sum(
            -0.5 * ((y - t["x"]) / s) ** 2 - jnp.log(s) - 0.5 * jnp.log(2 * jnp.pi)
        ),
    )
    prec = 1.0 / s0**2 + 1.0 / s**2
    post_mean = (mu0 / s0**2 + y / s**2) / prec
    # evidence: y_i ~ N(mu0_i, s0_i² + s²) independently
    ev = jnp.sum(
        -0.5 * (y - mu0) ** 2 / (s0**2 + s**2)
        - 0.5 * jnp.log(2 * jnp.pi * (s0**2 + s**2))
    )
    return model, post_mean, 1.0 / prec, ev


def test_map_gaussian_exact():
    model, post_mean, post_var, _ = _gaussian_model()
    res, lap = map_laplace(model, n_steps=100)
    np.testing.assert_allclose(np.asarray(res.position), post_mean, atol=1e-6)
    assert float(res.grad_norm) < 1e-5
    np.testing.assert_allclose(
        np.asarray(lap.marginal_sd()), np.sqrt(post_var), rtol=1e-6
    )


def test_laplace_evidence_exact_for_gaussian():
    model, _, _, ev = _gaussian_model()
    _, lap = map_laplace(model, n_steps=100)
    np.testing.assert_allclose(float(lap.log_evidence()), float(ev), rtol=1e-6)


def test_laplace_sample_moments_and_logdensity(key):
    model, post_mean, post_var, _ = _gaussian_model()
    _, lap = map_laplace(model, n_steps=100)
    draws = lap.sample(key, 20000)
    np.testing.assert_allclose(
        draws.mean(0),
        post_mean,
        atol=float(4 * np.sqrt(np.max(np.asarray(post_var)) / 20000)) + 1e-3,
    )
    np.testing.assert_allclose(draws.var(0), post_var, rtol=0.05)
    # logdensity is a normalized Gaussian: check against scipy at the mode
    from scipy import stats

    ld = float(lap.logdensity(lap.mean))
    exact = float(
        stats.multivariate_normal(
            np.asarray(lap.mean), np.diag(np.asarray(post_var))
        ).logpdf(np.asarray(lap.mean))
    )
    np.testing.assert_allclose(ld, exact, rtol=1e-6)


def test_map_linked_mode_lognormal():
    """Prior-only LogNormal(mu, sig): in linked space v = log x the density
    is exactly N(mu, sig²), so the linked MAP is mu (NOT the constrained
    mode exp(mu - sig²) — the engine targets the pushforward density)."""
    mu, sig = 0.8, 0.6
    model = Model(priors=dists.NamedProduct.of(x=dists.LogNormal(mu, sig)))
    res, lap = map_laplace(model, n_steps=100)
    np.testing.assert_allclose(float(res.position[0]), mu, atol=1e-6)
    np.testing.assert_allclose(float(lap.marginal_sd()[0]), sig, rtol=1e-6)
    # constrained draws land in-support
    x = model.constrain(lap.sample(jax.random.PRNGKey(0), 64))["x"]
    assert np.all(np.asarray(x) > 0)


def test_fit_map_adam_path_and_best_iterate():
    """learning_rate shorthand (Adam) converges too, and the returned
    position is the best iterate even if the last Adam step overshoots."""

    def logp(v):
        return -0.5 * jnp.sum((v - 3.0) ** 2)

    res = fit_map(logp, jnp.zeros(2), n_steps=400, learning_rate=0.1)
    np.testing.assert_allclose(np.asarray(res.position), 3.0, atol=1e-3)
    assert float(res.logdensity) >= float(-res.losses.min())


def test_laplace_jitter_rescues_flat_direction():
    """A flat coordinate makes H singular: the plain factor is NaN, the
    jittered one is finite (loud-vs-silent contract of the docstring)."""

    def logp(v):
        return -0.5 * v[0] ** 2  # v[1] flat

    lap = laplace_approximation(logp, jnp.zeros(2))
    assert not bool(jnp.all(jnp.isfinite(lap.chol_precision)))
    lap_j = laplace_approximation(logp, jnp.zeros(2), jitter=1e-6)
    assert bool(jnp.all(jnp.isfinite(lap_j.chol_precision)))


def test_map_laplace_mixed_support_runs():
    """Smoke on a mixed-support model (positive scale + simplex): optimizer
    and Hessian run through the real links; gradient is ~0 at the optimum."""
    model = Model(
        priors=dists.NamedProduct.of(
            mu=dists.Normal(0.0, 1.0),
            sigma=dists.LogNormal(0.0, 0.5),
            w=dists.Dirichlet(jnp.array([3.0, 4.0, 5.0])),
        )
    )
    res, lap = map_laplace(model, n_steps=200)
    assert float(res.grad_norm) < 1e-4
    assert bool(jnp.all(jnp.isfinite(lap.chol_precision)))
    ev = float(lap.log_evidence())
    assert np.isfinite(ev)
