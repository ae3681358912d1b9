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


def test_importance_sampling_evidence(key):
    """IS log Z with a covering proposal: exact analytic evidence, healthy
    ESS and Pareto-k; an under-dispersed proposal degrades pareto_k."""
    from tpu_bijectors.infer import fit_advi, importance_sampling_evidence

    model, log_z = _gaussian_model()
    logp = model.batched_logdensity_fn()
    fit = fit_advi(logp, key, model.dim(), n_steps=1500, n_mc=32,
                   learning_rate=1e-2, dtype=jnp.float64, estimator="stl")
    res = importance_sampling_evidence(logp, fit.q, jax.random.PRNGKey(1),
                                       n=8192)
    np.testing.assert_allclose(float(res.log_evidence), log_z, atol=0.03)
    assert float(res.ess) > 1000.0
    assert float(res.pareto_k) < 0.7

    # NARROW proposal (scale / 3): weights heavy-tailed, k blows up
    bad_q = MeanFieldGaussian(fit.q.loc, fit.q.log_scale - jnp.log(3.0))
    bad = importance_sampling_evidence(logp, bad_q, jax.random.PRNGKey(2),
                                       n=8192)
    assert float(bad.pareto_k) > float(res.pareto_k)
    assert float(bad.ess) < float(res.ess)


def test_iwelbo_tighter_than_elbo(key):
    """Burda et al.: the IW bound is monotone in n_iw. On a NORMALIZED
    correlated Gaussian (log Z = 0) with a mean-field family, plain ELBO
    plateaus at -KL < 0 while the n_iw=16 bound gets close to 0."""
    from tpu_bijectors.infer import fit_advi

    rho = 0.9
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float64)
    prec = jnp.linalg.inv(cov)
    _, logdet = jnp.linalg.slogdet(cov)

    def logp(v):  # normalized: integrates to 1
        return (
            -0.5 * jnp.einsum("...i,ij,...j->...", v, prec, v)
            - 0.5 * logdet - jnp.log(2 * jnp.pi)
        )

    common = dict(n_steps=2500, n_mc=8, learning_rate=1e-2, dtype=jnp.float64)
    fit_e = fit_advi(logp, key, 2, **common)
    fit_iw = fit_advi(logp, key, 2, estimator="iwelbo", n_iw=16, **common)
    bound_e = -float(fit_e.losses[-200:].mean())
    bound_iw = -float(fit_iw.losses[-200:].mean())
    # KL(best mean-field || target) = -0.5 log(1-rho^2) ~ 0.83
    assert bound_e < -0.4
    assert bound_iw > bound_e + 0.2
    assert bound_iw < 0.1  # still a lower bound (up to MC noise)


def test_iwelbo_flow_posterior(key):
    """IW-ELBO composes with flow families: a small MAF under n_iw=8
    trains stably on a banana target."""
    from tpu_bijectors.flows import maf_stack
    from tpu_bijectors.infer import FlowPosterior, fit_advi

    def logp(v):
        x, y = v[..., 0], v[..., 1]
        return -0.5 * (x**2 / 4.0 + (y - 0.5 * x**2) ** 2)

    logp.batch_capable = True
    q0 = FlowPosterior(maf_stack(jax.random.PRNGKey(5), 2, n_layers=2,
                                 hidden=8, dtype=jnp.float64))
    res = fit_advi(logp, key, 2, q=q0, estimator="iwelbo", n_iw=8,
                   n_steps=800, n_mc=8, learning_rate=5e-3, dtype=jnp.float64)
    l_last = np.asarray(res.losses[-100:])
    assert np.all(np.isfinite(l_last))
    assert l_last.mean() < float(res.losses[:50].mean())
