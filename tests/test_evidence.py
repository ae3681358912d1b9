"""Bridge-sampling evidence: near-exactness on analytic-evidence targets
(with both Laplace and ADVI-Gaussian proposals), convergence of the
fixed point, and agreement with the engines' other estimators."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.infer import (
    FullRankGaussian,
    MeanFieldGaussian,
    Model,
    bridge_sampling_evidence,
    map_laplace,
)


def _gaussian_model():
    """x ~ N(0, s0²) (dim 2), y|x ~ N(y_obs, s²): log Z analytic."""
    s0 = jnp.asarray([1.0, 2.0])
    y = jnp.asarray([1.0, -0.5])
    s = 0.6
    model = Model(
        priors=dists.NamedProduct.of(x=dists.MvNormalDiag(jnp.zeros(2), s0)),
        loglik=lambda t: jnp.sum(
            -0.5 * ((y - t["x"]) / s) ** 2
            - jnp.log(s)
            - 0.5 * jnp.log(2 * jnp.pi)
        ),
    )
    log_z = float(
        jnp.sum(
            -0.5 * y**2 / (s0**2 + s**2)
            - 0.5 * jnp.log(2 * jnp.pi * (s0**2 + s**2))
        )
    )
    return model, log_z


def test_bridge_exact_gaussian_laplace_proposal(key):
    model, log_z = _gaussian_model()
    _, lap = map_laplace(model, n_steps=100)
    # posterior draws: the Laplace Gaussian IS the posterior here, so its
    # own draws are exact posterior draws
    draws = lap.sample(jax.random.PRNGKey(1), 4000)
    res = bridge_sampling_evidence(model.logdensity_fn(), draws, lap, key)
    np.testing.assert_allclose(float(res.log_evidence), log_z, atol=0.01)
    # fixed point converged: last two iterates indistinguishable
    assert abs(float(res.trace[-1] - res.trace[-2])) < 1e-8
    assert float(res.rel_mc_error) < 0.05


def test_bridge_with_advi_gaussian_proposals(key):
    """Mean-field and full-rank ADVI Gaussians as proposals: logdensity is
    normalized (the estimator is unbiased only then), so log Z must come
    out right even though the proposal is NOT the posterior."""
    model, log_z = _gaussian_model()
    _, lap = map_laplace(model, n_steps=100)
    draws = lap.sample(jax.random.PRNGKey(1), 4000)

    mf = MeanFieldGaussian(
        loc=lap.mean + 0.2, log_scale=jnp.log(lap.marginal_sd() * 1.3)
    )
    res = bridge_sampling_evidence(model.logdensity_fn(), draws, mf, key)
    np.testing.assert_allclose(float(res.log_evidence), log_z, atol=0.02)

    fr = FullRankGaussian(
        loc=lap.mean,
        tril_raw=jnp.diag(jnp.log(lap.marginal_sd() * 1.5)),
    )
    res = bridge_sampling_evidence(model.logdensity_fn(), draws, fr, key)
    np.testing.assert_allclose(float(res.log_evidence), log_z, atol=0.02)


def test_gaussian_proposal_logdensities_are_normalized(key):
    """logdensity of both ADVI Gaussians matches scipy's mvn logpdf."""
    from scipy import stats

    mf = MeanFieldGaussian(
        loc=jnp.asarray([0.5, -1.0]), log_scale=jnp.asarray([0.1, -0.3])
    )
    x = jax.random.normal(key, (50, 2))
    np.testing.assert_allclose(
        np.asarray(mf.logdensity(x)),
        stats.multivariate_normal(
            np.asarray(mf.loc), np.diag(np.exp(2 * np.asarray(mf.log_scale)))
        ).logpdf(np.asarray(x)),
        rtol=1e-8,
    )

    fr = FullRankGaussian(
        loc=jnp.asarray([0.5, -1.0]),
        tril_raw=jnp.asarray([[0.1, 0.0], [0.7, -0.2]]),
    )
    l_mat = np.asarray(fr._L())
    np.testing.assert_allclose(
        np.asarray(fr.logdensity(x)),
        stats.multivariate_normal(
            np.asarray(fr.loc), l_mat @ l_mat.T
        ).logpdf(np.asarray(x)),
        rtol=1e-8,
    )


def test_bridge_on_constrained_model_vs_smc(key):
    """Beta-Binomial (constrained support through the linked density):
    bridge evidence with NUTS draws + Laplace proposal matches the exact
    conjugate evidence log C(n,h) B(a+h, b+n-h) / B(a,b) (pmf form used by
    the likelihood, without the binomial coefficient)."""
    from scipy.special import betaln

    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"])
        + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    exact = float(betaln(a + heads, b + n_trials - heads) - betaln(a, b))
    raw, _, _ = model.sample(
        jax.random.PRNGKey(4), n_chains=8, n_warmup=300, n_samples=500,
        kernel="nuts", constrained=False,
    )
    _, lap = map_laplace(model, n_steps=100)
    res = bridge_sampling_evidence(
        model.logdensity_fn(), raw.reshape(-1, model.dim()), lap, key
    )
    np.testing.assert_allclose(float(res.log_evidence), exact, atol=0.05)
