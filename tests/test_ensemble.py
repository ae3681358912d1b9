"""Affine-invariant ensemble sampler: moment correctness on correlated and
badly-scaled Gaussians (the affine-invariance selling point), constrained
supports through the vectorize layer, and a non-differentiable target no
HMC-family kernel can touch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bijectors import dists
from tpu_bijectors.infer import Model, run_ensemble


def test_correlated_badly_scaled_gaussian(key):
    """cov with condition number 1e4 and strong correlation: affine
    invariance means the stretch move needs no tuning to sample it."""
    sd = jnp.asarray([100.0, 0.5])
    rho = 0.9
    cov = jnp.asarray(
        [
            [sd[0] ** 2, rho * sd[0] * sd[1]],
            [rho * sd[0] * sd[1], sd[1] ** 2],
        ]
    )
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([3.0, -1.0])

    def logp(v):
        d = v - mean
        return -0.5 * d @ prec @ d

    q0 = mean + jax.random.normal(jax.random.PRNGKey(1), (64, 2))
    res = jax.jit(
        lambda k: run_ensemble(logp, k, q0, n_warmup=2000, n_samples=4000)
    )(key)
    draws = np.asarray(res.samples).reshape(-1, 2)
    # per-coordinate error in posterior-sd units (scales differ by 200x)
    std_err = (draws.mean(0) - np.asarray(mean)) / np.asarray(sd)
    np.testing.assert_allclose(std_err, 0.0, atol=0.1)
    np.testing.assert_allclose(
        np.cov(draws.T), np.asarray(cov), rtol=0.15, atol=0.05
    )
    assert 0.1 < float(res.accept_rate) < 0.9


def test_constrained_support_via_model(key):
    """Beta-Binomial through the linked density: correct posterior mean."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"])
        + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    q0 = jax.random.normal(jax.random.PRNGKey(2), (32, 1))
    res = run_ensemble(
        model.batched_logdensity_fn(), key, q0, n_warmup=500, n_samples=1500
    )
    p = np.asarray(
        model.constrain(res.samples.reshape(-1, 1))["p"]
    ).ravel()
    a_post, b_post = a + heads, b + n_trials - heads
    np.testing.assert_allclose(p.mean(), a_post / (a_post + b_post), atol=0.02)


def test_nondifferentiable_target(key):
    """Laplace (double-exponential) density — |v| has no gradient at 0;
    gradient-free stretch moves don't care. Variance of Laplace(0, b) = 2b²."""
    b = 1.5
    logp = lambda v: -jnp.sum(jnp.abs(v)) / b
    q0 = jax.random.normal(jax.random.PRNGKey(3), (64, 1))
    res = run_ensemble(logp, key, q0, n_warmup=1000, n_samples=3000)
    draws = np.asarray(res.samples).ravel()
    np.testing.assert_allclose(draws.mean(), 0.0, atol=0.15)
    np.testing.assert_allclose(draws.var(), 2 * b * b, rtol=0.15)


def test_walker_validation(key):
    logp = lambda v: -0.5 * jnp.sum(v * v)
    with pytest.raises(ValueError, match="even"):
        run_ensemble(logp, key, jnp.zeros((5, 2)))
    with pytest.raises(ValueError, match="at least 4"):
        run_ensemble(logp, key, jnp.zeros((2, 2)))
