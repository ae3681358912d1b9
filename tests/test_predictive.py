"""Prior/posterior predictive sampling and PPC p-values: conjugate-moment
exactness, well-specified vs misspecified model discrimination."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.infer import (
    Model,
    posterior_predictive,
    ppc_pvalue,
    prior_predictive,
)

N_OBS = 20


def _simulate(k, x):
    return x["mu"] + 1.0 * jax.random.normal(k, (N_OBS,), jnp.float64)


def test_prior_predictive_moments(key):
    """mu ~ N(0, 2), y|mu ~ N(mu, 1): prior predictive var = 4 + 1."""
    prior = dists.NamedProduct.of(mu=dists.Normal(0.0, 2.0))
    theta, y = prior_predictive(prior, _simulate, key, 4000)
    y = np.asarray(y)
    assert y.shape == (4000, N_OBS)
    np.testing.assert_allclose(y.mean(), 0.0, atol=0.15)
    np.testing.assert_allclose(y.var(), 5.0, rtol=0.1)


def test_posterior_predictive_and_ppc(key):
    """Normal-Normal: PPC p-value moderate for the true model, extreme for
    a variance-misspecified one."""
    rng = np.random.default_rng(3)
    y_obs = jnp.asarray(1.5 + rng.standard_normal(N_OBS), jnp.float64)

    model = Model(
        priors=dists.NamedProduct.of(mu=dists.Normal(0.0, 2.0)),
        loglik=lambda x: jnp.sum(-0.5 * (y_obs - x["mu"]) ** 2),
    )
    samples, _, _ = model.sample(
        key, n_chains=8, n_warmup=300, n_samples=500, kernel="nuts_batched"
    )
    y_rep = posterior_predictive(_simulate, samples, jax.random.PRNGKey(1))
    assert np.asarray(y_rep).shape == (8 * 500, N_OBS)

    p_mean = float(ppc_pvalue(lambda y: jnp.mean(y), y_obs, y_rep))
    assert 0.05 < p_mean < 0.95  # well-specified in location

    # simulate with 3x the true noise: the sd statistic goes extreme
    def sim_bad(k, x):
        return x["mu"] + 3.0 * jax.random.normal(k, (N_OBS,), jnp.float64)

    y_bad = posterior_predictive(sim_bad, samples, jax.random.PRNGKey(2))
    p_sd = float(ppc_pvalue(lambda y: jnp.std(y), y_obs, y_bad))
    assert p_sd > 0.99  # replicated sd almost always exceeds observed


def test_posterior_predictive_single_axis(key):
    """Also accepts a flat (draws, ...) pytree (no chain axis)."""
    flat = {"mu": jnp.linspace(-1.0, 1.0, 64)}
    y = posterior_predictive(_simulate, flat, key)
    assert np.asarray(y).shape == (64, N_OBS)
