"""Pathfinder: factor algebra vs dense oracles, Gaussian-target recovery
(where the best candidate should match posterior mean/cov), multipath
importance resampling on a conjugate model (SURVEY.md §4 moment tier)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.infer import (
    Model,
    fit_pathfinder,
    multipath_pathfinder,
)
from tpu_bijectors.infer.pathfinder import (
    _factors,
    _logq,
    _sample_and_logq,
    _sigma_mv,
    _sqrt_pieces,
)


def _random_history(rng, dim=5, j=3):
    """Valid curvature pairs from a quadratic: z = H s with H spd ⇒
    sᵀz > 0 always holds."""
    a = rng.standard_normal((dim, dim))
    h = a @ a.T + dim * np.eye(dim)
    S = rng.standard_normal((j, dim))
    Z = S @ h.T
    return jnp.asarray(S), jnp.asarray(Z)


def test_factors_match_dense_bfgs_oracle(rng):
    """Σ = diag(α) + βγβᵀ must equal the textbook recursive inverse-BFGS
    update applied pair by pair (Byrd-Nocedal-Schnabel compact form)."""
    dim, j = 5, 3
    S, Z = _random_history(rng, dim, j)
    alpha = jnp.asarray(rng.uniform(0.5, 2.0, dim))
    mask = jnp.ones(j, bool)
    beta, gamma = _factors(S, Z, mask, alpha)
    sigma = np.diag(np.asarray(alpha)) + np.asarray(beta @ gamma @ beta.T)

    # oracle: H_{k+1} = (I - ρ s zᵀ) H_k (I - ρ z sᵀ) + ρ s sᵀ
    h = np.diag(np.asarray(alpha))
    eye = np.eye(dim)
    for i in range(j):
        s = np.asarray(S[i])[:, None]
        z = np.asarray(Z[i])[:, None]
        rho = 1.0 / float((z.T @ s).item())
        v = eye - rho * (s @ z.T)
        h = v @ h @ v.T + rho * (s @ s.T)
    np.testing.assert_allclose(sigma, h, rtol=1e-9, atol=1e-9)

    # matvec agrees with the dense matrix
    g = jnp.asarray(rng.standard_normal(dim))
    np.testing.assert_allclose(
        np.asarray(_sigma_mv(alpha, beta, gamma, g)), h @ np.asarray(g),
        rtol=1e-9, atol=1e-9,
    )


def test_masked_pairs_are_inert(rng):
    """A masked slot must leave Σ exactly as if the pair never existed."""
    dim, j = 4, 3
    S, Z = _random_history(rng, dim, j)
    alpha = jnp.ones(dim)
    full_mask = jnp.array([False, True, True])
    # zeroed rows at masked slots (as the rolling buffer maintains)
    S0 = S.at[0].set(0.0)
    Z0 = Z.at[0].set(0.0)
    beta_m, gamma_m = _factors(S0, Z0, full_mask, alpha)
    beta_2, gamma_2 = _factors(S[1:], Z[1:], jnp.ones(2, bool), alpha)
    sig_m = np.diag(np.asarray(alpha)) + np.asarray(beta_m @ gamma_m @ beta_m.T)
    sig_2 = np.diag(np.asarray(alpha)) + np.asarray(beta_2 @ gamma_2 @ beta_2.T)
    np.testing.assert_allclose(sig_m, sig_2, rtol=1e-10, atol=1e-12)


def test_sample_and_logq_match_dense_gaussian(rng, key):
    """Draw moments match Σ and logq matches the dense scipy mvn logpdf."""
    from scipy import stats

    dim, j = 4, 2
    S, Z = _random_history(rng, dim, j)
    alpha = jnp.asarray(rng.uniform(0.5, 2.0, dim))
    mask = jnp.ones(j, bool)
    beta, gamma = _factors(S, Z, mask, alpha)
    sigma = np.diag(np.asarray(alpha)) + np.asarray(beta @ gamma @ beta.T)
    mu = jnp.asarray(rng.standard_normal(dim))

    x, logq = _sample_and_logq(key, mu, alpha, beta, gamma, 40000)
    np.testing.assert_allclose(
        np.cov(np.asarray(x).T), sigma, rtol=0.08, atol=0.05
    )
    oracle = stats.multivariate_normal(np.asarray(mu), sigma).logpdf(
        np.asarray(x[:100])
    )
    np.testing.assert_allclose(np.asarray(logq[:100]), oracle, rtol=1e-8)

    # foreign points too (the ELBO evaluates logq at its own draws only,
    # but the importance weights in multipath use it as a density)
    y = jnp.asarray(rng.standard_normal((7, dim)))
    q, ell, hld = _sqrt_pieces(alpha, beta, gamma)
    np.testing.assert_allclose(
        np.asarray(_logq(y, mu, alpha, q, ell, hld)),
        stats.multivariate_normal(np.asarray(mu), sigma).logpdf(np.asarray(y)),
        rtol=1e-8,
    )


def test_pathfinder_gaussian_target(key):
    """On a correlated Gaussian target the ELBO-best candidate should sit
    at the mode with draws matching the true covariance (Pathfinder is
    near-exact on Gaussians — paper §4.1)."""
    rho = 0.8
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([1.5, -0.5])

    def logp(v):
        d = v - mean
        return -0.5 * d @ prec @ d

    res = fit_pathfinder(
        logp, key, jnp.asarray([4.0, 4.0]), max_iters=25, n_draws=8000
    )
    np.testing.assert_allclose(np.asarray(res.position), mean, atol=5e-2)
    np.testing.assert_allclose(
        np.cov(np.asarray(res.draws).T), cov, rtol=0.15, atol=0.08
    )
    # ELBO of a Gaussian fit to a Gaussian ≈ log-normalizer (-KL + const):
    # best candidate must beat the first (identity-Σ far from the mode)
    assert float(res.elbo[res.best]) > float(res.elbo[0])


def test_multipath_conjugate_moments(key):
    """Beta-Binomial posterior via 4-path pathfinder + truncated-IS
    resampling: moments within loose MC bounds."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"])
        + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    logp = model.logdensity_fn()
    v0s = 2.0 * jax.random.normal(jax.random.PRNGKey(7), (4, model.dim()))
    draws, res = multipath_pathfinder(
        logp, key, v0s, n_draws=4000, per_path_draws=500, max_iters=30
    )
    p = np.asarray(model.constrain(draws)["p"]).ravel()
    a_post, b_post = a + heads, b + n_trials - heads
    exact_mean = a_post / (a_post + b_post)
    exact_sd = np.sqrt(
        a_post * b_post / ((a_post + b_post) ** 2 * (a_post + b_post + 1))
    )
    np.testing.assert_allclose(p.mean(), exact_mean, atol=3 * exact_sd / 10)
    np.testing.assert_allclose(p.std(), exact_sd, rtol=0.35)
    assert res.draws.shape == (4, 500, 1)


def test_pathfinder_jits_and_batched_logp(key):
    """End-to-end under jit with a batch-capable density (the fused
    batched path): one compile, finite outputs."""
    model = Model(
        priors=dists.NamedProduct.of(
            mu=dists.Normal(0.0, 1.0), s=dists.LogNormal(0.0, 0.5)
        )
    )
    logp = model.batched_logdensity_fn()
    res = jax.jit(
        lambda k, v: fit_pathfinder(logp, k, v, max_iters=15, n_draws=32)
    )(key, jnp.zeros(model.dim()))
    assert np.isfinite(float(res.elbo[res.best]))
    assert np.all(np.isfinite(np.asarray(res.draws)))
