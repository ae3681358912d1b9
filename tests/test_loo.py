"""PSIS-LOO / WAIC: GPD fit vs known-parameter samples, PSIS-LOO vs the
ANALYTIC leave-one-out predictive on a conjugate Gaussian model, and the
WAIC/LOO agreement a well-specified model must show."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bijectors.infer import fit_gpd, psis_loo, waic


def test_fit_gpd_recovers_parameters(rng):
    xi, sigma = 0.3, 1.5
    u = rng.uniform(size=4000)
    y = sigma / xi * ((1 - u) ** (-xi) - 1)
    xi_hat, sigma_hat = fit_gpd(jnp.asarray(y))
    assert abs(float(xi_hat) - xi) < 0.06, float(xi_hat)
    assert abs(float(sigma_hat) - sigma) / sigma < 0.12, float(sigma_hat)


def test_fit_gpd_light_tail(rng):
    """Exponential data = GPD with ξ = 0: estimate near 0 (regularization
    pulls slightly toward 0.5 by design)."""
    y = rng.exponential(scale=2.0, size=4000)
    xi_hat, _ = fit_gpd(jnp.asarray(y))
    assert abs(float(xi_hat)) < 0.08, float(xi_hat)


def _conjugate_loo(rng, key, n_obs=24, tau=2.0, sigma=1.0, n_draws=4000):
    """θ ~ N(0, τ²), y_i|θ ~ N(θ, σ²). Exact posterior draws (no MCMC) and
    the exact LOO predictive log N(y_i; μ₋ᵢ, σ² + v₋ᵢ)."""
    theta_true = 1.3
    y = theta_true + sigma * rng.standard_normal(n_obs)
    # posterior given all data
    v_post = 1.0 / (1.0 / tau**2 + n_obs / sigma**2)
    mu_post = v_post * y.sum() / sigma**2
    draws = mu_post + np.sqrt(v_post) * np.asarray(
        jax.random.normal(key, (n_draws,))
    )
    ll = jnp.asarray(
        -0.5 * ((y[None, :] - draws[:, None]) / sigma) ** 2
        - np.log(sigma)
        - 0.5 * np.log(2 * np.pi)
    )
    # exact LOO
    elpd_exact = 0.0
    for i in range(n_obs):
        mask = np.arange(n_obs) != i
        v_i = 1.0 / (1.0 / tau**2 + (n_obs - 1) / sigma**2)
        mu_i = v_i * y[mask].sum() / sigma**2
        pred_var = sigma**2 + v_i
        elpd_exact += float(
            -0.5 * (y[i] - mu_i) ** 2 / pred_var
            - 0.5 * np.log(2 * np.pi * pred_var)
        )
    return ll, elpd_exact


def test_psis_loo_matches_analytic(rng, key):
    ll, elpd_exact = _conjugate_loo(rng, key)
    res = psis_loo(ll)
    np.testing.assert_allclose(float(res.elpd_loo), elpd_exact, atol=0.3)
    # well-specified model: every observation's importance tail is benign
    assert np.all(np.asarray(res.pareto_k) < 0.7), np.asarray(res.pareto_k)
    # p_loo ≈ 1 effective parameter (a single θ)
    assert 0.3 < float(res.p_loo) < 2.0, float(res.p_loo)
    assert float(res.se) > 0


def test_waic_agrees_with_loo(rng, key):
    ll, elpd_exact = _conjugate_loo(rng, key)
    rw = waic(ll)
    rl = psis_loo(ll)
    np.testing.assert_allclose(float(rw.elpd_waic), elpd_exact, atol=0.3)
    np.testing.assert_allclose(
        float(rw.elpd_waic), float(rl.elpd_loo), atol=0.2
    )
    assert 0.3 < float(rw.p_waic) < 2.0


def test_psis_loo_needs_enough_draws():
    with pytest.raises(ValueError, match="too few draws"):
        psis_loo(jnp.zeros((20, 5)))
