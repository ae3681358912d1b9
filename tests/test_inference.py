"""Inference engines: NUTS/HMC posterior moments (MC-error bounds), ADVI,
SMC — the posterior-moment tier SURVEY.md §4 prescribes for the build."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.infer import (
    FlowPosterior,
    MeanFieldGaussian,
    Model,
    fit_advi,
    run_smc,
    systematic_resample,
    warmup_and_sample,
)


def test_nuts_beta_binomial(key):
    """Conjugate Beta-Binomial: posterior Beta(a + h, b + n - h) — exact
    moments to compare against."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"]) + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    logp = model.logdensity_fn()
    q0 = model.init_positions(jax.random.PRNGKey(5), 8)
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(logp, k, q, n_warmup=400, n_samples=600)
    )(key, q0)
    p = np.asarray(model.constrain(samples.reshape(-1, 1))["p"]).ravel()
    a_post, b_post = a + heads, b + n_trials - heads
    exact_mean = a_post / (a_post + b_post)
    exact_var = a_post * b_post / ((a_post + b_post) ** 2 * (a_post + b_post + 1))
    np.testing.assert_allclose(p.mean(), exact_mean, atol=4 * np.sqrt(exact_var / 500))
    np.testing.assert_allclose(p.var(), exact_var, rtol=0.3)
    assert np.asarray(stats.diverging).sum() == 0


def test_nuts_dirichlet_multinomial(key):
    """Dirichlet-Multinomial conjugacy through the simplex bijector."""
    alpha = jnp.asarray([1.0, 2.0, 3.0])
    counts = jnp.asarray([10.0, 5.0, 20.0])
    model = Model(
        priors=dists.NamedProduct.of(w=dists.Dirichlet(alpha)),
        loglik=lambda x: jnp.sum(counts * jnp.log(x["w"])),
    )
    logp = model.logdensity_fn()
    q0 = model.init_positions(jax.random.PRNGKey(6), 8)
    samples, _, stats = jax.jit(
        lambda k, q: warmup_and_sample(logp, k, q, n_warmup=400, n_samples=800)
    )(key, q0)
    w = np.asarray(model.constrain(samples.reshape(-1, 2))["w"])
    a_post = np.asarray(alpha + counts)
    exact_mean = a_post / a_post.sum()
    np.testing.assert_allclose(w.mean(0), exact_mean, atol=0.02)
    assert np.asarray(stats.diverging).sum() == 0


def test_nuts_hierarchical_mixed_supports(key):
    """The BASELINE.json config-5 shape: simplex + corr + positive params in
    one model; checks it runs, mixes, and stays in support."""
    K = 3
    model = Model(
        priors=dists.NamedProduct.of(
            mu=dists.Normal(0.0, 5.0),
            sigma=dists.LogNormal(0.0, 1.0),
            w=dists.Dirichlet(jnp.ones(K)),
            corr=dists.LKJ(K, 2.0),
        ),
        loglik=None,
    )
    logp = model.logdensity_fn()
    q0 = model.init_positions(jax.random.PRNGKey(7), 4, scale=0.5)
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(logp, k, q, n_warmup=300, n_samples=300)
    )(key, q0)
    x = model.constrain(samples.reshape(-1, model.dim()))
    w = np.asarray(x["w"])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-8)
    corr = np.asarray(x["corr"])
    np.testing.assert_allclose(
        corr, np.swapaxes(corr, -1, -2), atol=1e-8
    )  # symmetric
    eig = np.linalg.eigvalsh(corr)
    assert eig.min() > -1e-8
    # prior moment check: E[w] = 1/K for uniform Dirichlet
    np.testing.assert_allclose(w.mean(0), 1.0 / K, atol=0.05)
    # sigma: lognormal prior median 1
    med = np.median(np.asarray(x["sigma"]))
    assert 0.6 < med < 1.6


def test_hmc_kernel_gaussian(key):
    from tpu_bijectors.infer import warmup_and_sample

    logp = lambda v: -0.5 * jnp.sum(v * v)
    q0 = jax.random.normal(jax.random.PRNGKey(8), (4, 3))
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp, k, q, n_warmup=300, n_samples=500, kernel="hmc", n_leapfrog=16
        )
    )(key, q0)
    s = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(s.var(0), 1.0, atol=0.15)


def test_advi_meanfield_gaussian(key):
    """ADVI on a Gaussian target recovers mean and (diagonal) scale."""
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sd = jnp.asarray([0.5, 2.0, 1.0])
    logp = lambda v: -0.5 * jnp.sum(((v - mu) / sd) ** 2)
    res = jax.jit(
        lambda k: fit_advi(logp, k, 3, n_steps=2000, n_mc=16, learning_rate=2e-2,
                           dtype=jnp.float64)
    )(key)
    np.testing.assert_allclose(np.asarray(res.q.loc), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(
        np.exp(np.asarray(res.q.log_scale)), np.asarray(sd), rtol=0.2
    )
    assert float(res.losses[-1]) < float(res.losses[0])


def test_advi_stl_zero_gradient_at_optimum(key):
    """Sticking-the-landing (Roeder et al. 2017): when q already equals the
    target, the STL per-sample gradient is IDENTICALLY zero — so starting at
    the optimum, the optimizer does not move at all. The standard estimator's
    entropy-score noise jitters the parameters away."""
    from tpu_bijectors.infer import MeanFieldGaussian

    mu = jnp.asarray([1.0, -2.0, 0.5], jnp.float64)
    sd = jnp.asarray([0.5, 2.0, 1.0], jnp.float64)
    logp = lambda v: -0.5 * jnp.sum(((v - mu) / sd) ** 2, -1)
    logp.batch_capable = True
    q_opt = MeanFieldGaussian(loc=mu, log_scale=jnp.log(sd))

    res = jax.jit(
        lambda k: fit_advi(logp, k, 3, q=q_opt, n_steps=100, n_mc=4,
                           learning_rate=1e-2, estimator="stl",
                           dtype=jnp.float64)
    )(key)
    np.testing.assert_allclose(np.asarray(res.q.loc), np.asarray(mu), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(res.q.log_scale), np.log(np.asarray(sd)), atol=1e-12
    )
    res_std = jax.jit(
        lambda k: fit_advi(logp, k, 3, q=q_opt, n_steps=100, n_mc=4,
                           learning_rate=1e-2, dtype=jnp.float64)
    )(key)
    assert np.max(np.abs(np.asarray(res_std.q.loc) - np.asarray(mu))) > 1e-3


def test_advi_stl_fullrank_correlated(key):
    """STL + full-rank on a correlated Gaussian recovers the covariance."""
    from tpu_bijectors.infer import FullRankGaussian

    rho = 0.8
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float64)
    prec = jnp.linalg.inv(cov)
    logp = lambda v: -0.5 * jnp.einsum("...i,ij,...j->...", v, prec, v)
    res = jax.jit(
        lambda k: fit_advi(logp, k, 2, q=FullRankGaussian.init(2, jnp.float64),
                           n_steps=3000, n_mc=16, learning_rate=1e-2,
                           estimator="stl", dtype=jnp.float64)
    )(key)
    L = np.asarray(res.q._L())
    np.testing.assert_allclose(L @ L.T, np.asarray(cov), atol=0.08)
    np.testing.assert_allclose(np.asarray(res.q.loc), 0.0, atol=0.08)


def test_advi_stl_flow_raises(key):
    from tpu_bijectors.flows import PlanarLayer

    q = FlowPosterior(PlanarLayer.init(key, 2, jnp.float64))
    with pytest.raises(ValueError, match="stl"):
        fit_advi(lambda v: -0.5 * jnp.sum(v * v), key, 2, q=q, estimator="stl")


def test_advi_transformed_model(key):
    """ADVI through the unconstraining map: Beta posterior."""
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(2.0, 2.0)),
        loglik=lambda x: 17 * jnp.log(x["p"]) + 33 * jnp.log1p(-x["p"]),
    )
    res = jax.jit(
        lambda k: fit_advi(model.logdensity_fn(), k, model.dim(), n_steps=1500,
                           n_mc=32, learning_rate=2e-2, dtype=jnp.float64)
    )(key)
    # compare posterior mean in constrained space with exact Beta(19, 35)
    ks = jax.random.split(jax.random.PRNGKey(9))
    v = res.q.sample(ks[0], 4000)
    p = np.asarray(model.constrain(v)["p"])
    np.testing.assert_allclose(p.mean(), 19.0 / 54.0, atol=0.03)


def test_advi_flow_posterior(key):
    """Flow-posterior ADVI (config 4): planar stack fits a banana-ish target."""
    from tpu_bijectors.flows import PlanarLayer

    def logp(v):  # curved target
        x, y = v[0], v[1]
        return -0.5 * (x**2 / 4.0 + (y - 0.5 * x**2) ** 2)

    k1, k2 = jax.random.split(key)
    layers = tb.Chain(
        tuple(PlanarLayer.init(k, 2, jnp.float64) for k in jax.random.split(k1, 4))
    )
    res = jax.jit(
        lambda k: fit_advi(
            logp, k, 2, q=FlowPosterior(layers), n_steps=1500, n_mc=32,
            learning_rate=1e-2, dtype=jnp.float64,
        )
    )(k2)
    assert float(res.losses[-1]) < float(res.losses[0])
    l_last = np.asarray(res.losses[-100:])
    assert np.all(np.isfinite(l_last))


def test_systematic_resample_unbiased(key):
    lw = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample(jax.random.PRNGKey(i), lw)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.02)


def test_smc_gaussian_evidence(key):
    """SMC on conjugate Gaussian: check posterior moments and log-evidence.

    prior N(0,1), lik N(x | theta, sigma=0.5) with x=1.0:
    posterior N(mu_p, s_p), evidence = N(x | 0, sqrt(1 + 0.25)).
    """
    x_obs, s_lik = 1.0, 0.5
    log_prior = lambda v: -0.5 * jnp.sum(v * v) - 0.5 * jnp.log(2 * jnp.pi)
    log_lik = lambda v: -0.5 * ((x_obs - v[0]) / s_lik) ** 2 - jnp.log(
        s_lik * jnp.sqrt(2 * jnp.pi)
    )
    n = 4096
    particles0 = jax.random.normal(key, (n, 1), jnp.float64)
    res = jax.jit(
        lambda k, p: run_smc(log_prior, log_lik, k, p, n_mutations=10, rw_scale=0.5)
    )(jax.random.PRNGKey(11), particles0)
    post_var = 1.0 / (1.0 + 1.0 / s_lik**2)
    post_mean = post_var * x_obs / s_lik**2
    p = np.asarray(res.particles[:, 0])
    np.testing.assert_allclose(p.mean(), post_mean, atol=0.05)
    np.testing.assert_allclose(p.var(), post_var, rtol=0.2)
    exact_logev = -0.5 * x_obs**2 / (1 + s_lik**2) - 0.5 * np.log(
        2 * np.pi * (1 + s_lik**2)
    )
    np.testing.assert_allclose(float(res.log_evidence), exact_logev, atol=0.1)
    assert float(res.final_beta) == 1.0


def test_smc_hmc_mutation(key):
    log_prior = lambda v: -0.5 * jnp.sum(v * v)
    log_lik = lambda v: -0.5 * jnp.sum((v - 2.0) ** 2)
    particles0 = jax.random.normal(key, (1024, 2), jnp.float64)
    res = jax.jit(
        lambda k, p: run_smc(
            log_prior, log_lik, k, p, mutation="hmc", n_mutations=3, hmc_eps=0.5
        )
    )(jax.random.PRNGKey(12), particles0)
    p = np.asarray(res.particles)
    np.testing.assert_allclose(p.mean(0), 1.0, atol=0.1)  # posterior mean = 1


def test_nuts_ordered_distribution(key):
    """Sampling transformed(ordered(iid Normal)) via NUTS matches the
    order-statistics moments of sorting iid draws (reference
    test/bijectors/ordered.jl runs the same check with AdvancedHMC)."""
    n = 4
    d = dists.IIDProduct(dists.Normal(0.0, 1.0), n)
    od = tb.ordered(d)
    b = tb.bijector(od)  # ordered -> unconstrained

    def logp(v):
        x, ld = tb.inverse(b).forward_and_log_det(v)
        return d.logpdf(x) + ld

    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(13), (16, n), jnp.float64)
    samples, _, stats = jax.jit(
        lambda k, q: warmup_and_sample(logp, k, q, n_warmup=400, n_samples=1200)
    )(key, q0)
    x = np.asarray(jax.vmap(tb.inverse(b).forward)(samples.reshape(-1, n)))
    assert np.all(np.diff(x, axis=-1) >= -1e-10), "NUTS left the ordered set"
    # oracle: moments of sorted iid normal draws (NUTS mean MC se ~0.01 at
    # 16x1200 autocorrelated draws; 0.06 is a 5-sigma bar)
    z = np.sort(np.asarray(
        dists.Normal(0.0, 1.0).sample(jax.random.PRNGKey(14), (200_000, n))
    ), axis=-1)
    np.testing.assert_allclose(x.mean(0), z.mean(0), atol=0.06)
    np.testing.assert_allclose(x.std(0), z.std(0), atol=0.06)


def test_nuts_dense_metric_correlated_gaussian(key):
    """Dense mass matrix (Stan dense_e): a rho=0.95 correlated Gaussian —
    adaptation should recover the covariance and sampling stays exact."""
    rho = 0.95
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float64)
    prec = jnp.linalg.inv(cov)
    logp = lambda v: -0.5 * v @ prec @ v
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(21), (8, 2), jnp.float64)
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp, k, q, n_warmup=500, n_samples=800, metric="dense"
        )
    )(key, q0)
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), 0.0, atol=0.08)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.12)
    # adapted inverse mass approximates the target covariance
    im = np.asarray(state.inv_mass)
    assert im.shape == (2, 2)
    np.testing.assert_allclose(im, np.asarray(cov), atol=0.25)
    assert np.asarray(stats.diverging).sum() == 0


def test_nuts_batched_kernel_matches_moments(key):
    """The natively-batched NUTS kernel (hmc_batched.py) recovers the same
    posteriors as the vmapped per-chain kernel: conjugate Beta-Binomial +
    a correlated Gaussian."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"]) + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    logp_b = model.batched_logdensity_fn()
    q0 = model.init_positions(jax.random.PRNGKey(31), 16)
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp_b, k, q, n_warmup=400, n_samples=600, kernel="nuts_batched"
        )
    )(key, q0)
    p = np.asarray(model.constrain(samples.reshape(-1, 1))["p"]).ravel()
    a_post, b_post = a + heads, b + n_trials - heads
    exact_mean = a_post / (a_post + b_post)
    exact_var = a_post * b_post / ((a_post + b_post) ** 2 * (a_post + b_post + 1))
    np.testing.assert_allclose(p.mean(), exact_mean, atol=5 * np.sqrt(exact_var / 1000))
    np.testing.assert_allclose(p.var(), exact_var, rtol=0.3)
    assert np.asarray(stats.diverging).sum() == 0

    # correlated Gaussian, dense metric, batched kernel
    rho = 0.9
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float64)
    prec = jnp.linalg.inv(cov)
    logp2 = lambda v: -0.5 * jnp.sum((v @ prec) * v, -1) if v.ndim > 1 else -0.5 * v @ prec @ v
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(32), (16, 2), jnp.float64)
    samples, _, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp2, k, q, n_warmup=400, n_samples=600, kernel="nuts_batched",
            metric="dense",
        )
    )(key, q0)
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.12)


def test_nuts_batched_t_kernel_matches_moments(key):
    """The transposed-layout batched NUTS kernel (state (dim, chains),
    hmc_batched.nuts_kernel_batched(transposed=True)) recovers the same
    posteriors: conjugate Beta-Binomial via Model.batched_logdensity_t_fn,
    and a correlated Gaussian under a dense metric (exercising the
    transposed-layout M^{-1}p and momentum draw)."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"]) + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    logp_t = model.batched_logdensity_t_fn()
    # the _t density equals the batch-major density on the transposed state
    logp_b = model.batched_logdensity_fn()
    v = 0.7 * np.random.default_rng(7).standard_normal((32, 1))
    np.testing.assert_allclose(
        np.asarray(logp_t(jnp.asarray(v).T)), np.asarray(logp_b(jnp.asarray(v))),
        rtol=1e-12,
    )
    q0 = model.init_positions(jax.random.PRNGKey(31), 16)
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp_t, k, q, n_warmup=400, n_samples=600, kernel="nuts_batched_t"
        )
    )(key, q0)
    p = np.asarray(model.constrain(samples.reshape(-1, 1))["p"]).ravel()
    a_post, b_post = a + heads, b + n_trials - heads
    exact_mean = a_post / (a_post + b_post)
    exact_var = a_post * b_post / ((a_post + b_post) ** 2 * (a_post + b_post + 1))
    np.testing.assert_allclose(p.mean(), exact_mean, atol=5 * np.sqrt(exact_var / 1000))
    np.testing.assert_allclose(p.var(), exact_var, rtol=0.3)
    assert np.asarray(stats.diverging).sum() == 0

    # correlated Gaussian, dense metric, transposed kernel
    rho = 0.9
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float64)
    prec = jnp.linalg.inv(cov)
    logp2_t = lambda vT: -0.5 * jnp.sum(vT * (prec @ vT), 0)
    q0 = 0.1 * jax.random.normal(jax.random.PRNGKey(32), (16, 2), jnp.float64)
    samples, _, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp2_t, k, q, n_warmup=400, n_samples=600, kernel="nuts_batched_t",
            metric="dense",
        )
    )(key, q0)
    s = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.12)
    assert np.asarray(stats.diverging).sum() == 0


def test_smc_transposed_matches(key):
    """Transposed SMC ((dim, N) particles, batch-capable densities) recovers
    the same conjugate-Gaussian posterior and evidence; both mutation kinds
    (the HMC one drives hmc_kernel_batched(transposed=True))."""
    x_obs, s_lik = 1.0, 0.5

    def log_prior_t(vT):
        return -0.5 * jnp.sum(vT * vT, 0) - 0.5 * jnp.log(2 * jnp.pi)

    def log_lik_t(vT):
        return -0.5 * ((x_obs - vT[0]) / s_lik) ** 2 - jnp.log(
            s_lik * jnp.sqrt(2 * jnp.pi)
        )

    log_prior_t.batch_capable = True
    log_lik_t.batch_capable = True
    n = 4096
    p0 = jax.random.normal(key, (1, n), jnp.float64)
    post_var = 1.0 / (1.0 + 1.0 / s_lik**2)
    post_mean = post_var * x_obs / s_lik**2
    exact_logev = -0.5 * x_obs**2 / (1 + s_lik**2) - 0.5 * np.log(
        2 * np.pi * (1 + s_lik**2)
    )
    for mutation in ("rwm", "hmc"):
        res = jax.jit(
            lambda k, p, m=mutation: run_smc(
                log_prior_t, log_lik_t, k, p, n_mutations=10, rw_scale=0.5,
                mutation=m, hmc_eps=0.4, hmc_leapfrog=8, transposed=True,
            )
        )(jax.random.PRNGKey(11), p0)
        assert res.particles.shape == (1, n)
        p = np.asarray(res.particles[0])
        np.testing.assert_allclose(p.mean(), post_mean, atol=0.05)
        np.testing.assert_allclose(p.var(), post_var, rtol=0.2)
        np.testing.assert_allclose(float(res.log_evidence), exact_logev, atol=0.1)
        assert float(res.final_beta) == 1.0
    # per-sample (non-batch-capable) densities are rejected in transposed mode
    with pytest.raises(ValueError):
        run_smc(lambda v: v.sum(), lambda v: v.sum(), key, p0, transposed=True)


def test_advi_transposed_matches(key):
    """Transposed ADVI (MC samples drawn (dim, n), batch-capable density)
    fits the same Beta-Binomial posterior as the batch-major path."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"]) + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    res = jax.jit(
        lambda k: fit_advi(
            model.batched_logdensity_t_fn(), k, model.dim(), n_steps=1500,
            n_mc=16, learning_rate=2e-2, dtype=jnp.float64, transposed=True,
        )
    )(jax.random.PRNGKey(3))
    # posterior over p: Beta(a+heads, b+n-heads); compare transformed moments
    keys = jax.random.split(jax.random.PRNGKey(4), 1)
    v = res.q.sample(keys[0], 4000)
    p = np.asarray(model.constrain(v)["p"]).ravel()
    a_post, b_post = a + heads, b + n_trials - heads
    exact_mean = a_post / (a_post + b_post)
    np.testing.assert_allclose(p.mean(), exact_mean, atol=0.03)
    # flow posteriors and per-sample densities are rejected in transposed mode
    with pytest.raises(ValueError):
        fit_advi(model.logdensity_fn(), jax.random.PRNGKey(0), model.dim(),
                 transposed=True)


def test_model_sample_auto_kernel(key):
    """Model.sample one-call API: kernel='auto' picks the transposed fused
    kernel for plan-eligible priors and reproduces the conjugate posterior;
    constrained=True returns the sample pytree with (n_kept, chains) axes."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"]) + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    samples, state, stats = jax.jit(
        lambda k: model.sample(k, n_chains=8, n_warmup=400, n_samples=600)
    )(key)
    p = np.asarray(samples["p"])
    assert p.shape == (600, 8)
    a_post, b_post = a + heads, b + n_trials - heads
    exact_mean = a_post / (a_post + b_post)
    exact_var = a_post * b_post / ((a_post + b_post) ** 2 * (a_post + b_post + 1))
    np.testing.assert_allclose(p.mean(), exact_mean, atol=4 * np.sqrt(exact_var / 500))
    # raw (linked) return path + an explicit kernel name both work
    raw, _, _ = model.sample(
        jax.random.PRNGKey(3), n_chains=4, n_warmup=50, n_samples=50,
        kernel="nuts", constrained=False,
    )
    assert raw.shape == (50, 4, model.dim())


def test_model_sample_warm_starts(key):
    """init='laplace' / 'pathfinder': chains start from the approximation's
    draws with the inverse mass seeded from its covariance; short warmup
    still reproduces the conjugate posterior (the seed is a good metric, so
    far fewer adaptation steps suffice than from identity)."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"])
        + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    a_post, b_post = a + heads, b + n_trials - heads
    exact_mean = a_post / (a_post + b_post)
    exact_var = a_post * b_post / (
        (a_post + b_post) ** 2 * (a_post + b_post + 1)
    )
    for init in ("laplace", "pathfinder"):
        samples, _, _ = model.sample(
            key, n_chains=8, n_warmup=150, n_samples=400, init=init,
            kernel="nuts",
        )
        p = np.asarray(samples["p"])
        np.testing.assert_allclose(
            p.mean(), exact_mean, atol=5 * np.sqrt(exact_var / 500)
        )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown init"):
        model.sample(key, init="bogus")


def test_inv_mass0_seeding_and_validation(key):
    """warmup_and_sample(inv_mass0=...) uses the seed before adaptation;
    mismatched shapes fail loudly."""
    from tpu_bijectors.infer import init_sampler

    logp = lambda v: -0.5 * jnp.sum(v * v)
    q0 = jax.random.normal(key, (4, 3))
    st = init_sampler(logp, key, q0, inv_mass0=jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(st.inv_mass), [1.0, 2.0, 3.0])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="inv_mass0"):
        init_sampler(logp, key, q0, inv_mass0=jnp.ones(5))
    with _pytest.raises(ValueError, match="inv_mass0"):
        init_sampler(logp, key, q0, metric="dense", inv_mass0=jnp.ones(3))


def test_smc_zero_likelihood_region_progresses(key):
    """More than half the prior mass has log_lik = -inf: the ESS target is
    unreachable at stage 1, which used to stall the loop with 0*(-inf) =
    NaN weights. The strict-progress guard tempers through; evidence ==
    log P(v > 0) = log 0.5 and every surviving particle is feasible."""
    logp = lambda v: -0.5 * jnp.sum(v * v, -1)
    loglik = lambda v: jnp.where(v[..., 0] > 0, 0.0, -jnp.inf)
    logp.batch_capable = loglik.batch_capable = True
    p0 = jax.random.normal(key, (2048, 1), jnp.float64)
    res = jax.jit(
        lambda k, p: run_smc(logp, loglik, k, p, n_mutations=5, rw_scale=0.5)
    )(jax.random.PRNGKey(1), p0)
    assert np.isfinite(float(res.log_evidence))
    np.testing.assert_allclose(float(res.log_evidence), np.log(0.5), atol=0.1)
    assert float(res.final_beta) == 1.0
    parts = np.asarray(res.particles)
    assert np.all(parts > 0)
    # truncated-normal moments: mean = sqrt(2/pi), sd = sqrt(1 - 2/pi)
    np.testing.assert_allclose(parts.mean(), np.sqrt(2 / np.pi), atol=0.08)


def test_systematic_resample_skips_zero_weight_prefix(key):
    lw = jnp.asarray([-jnp.inf, 0.0, 0.0, 0.0], jnp.float64)
    for i in range(50):
        idx = np.asarray(systematic_resample(jax.random.PRNGKey(i), lw))
        assert np.all(idx >= 1), idx


def test_thinned_stats_aggregate_not_subsample(key):
    """thin=4: per-block stats must aggregate all 4 transitions (n_steps
    sums, diverging ORs) instead of keeping only the last one."""
    logp = lambda v: -0.5 * jnp.sum(v * v)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (4, 3), jnp.float64)
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp, k, q, n_warmup=200, n_samples=200, thin=4
        )
    )(key, q0)
    assert samples.shape == (50, 4, 3)
    assert stats.n_steps.shape[0] == 50
    assert int(np.asarray(stats.n_steps).min()) >= 4  # summed over the block
    assert stats.diverging.dtype == bool


def test_zero_warmup_runs(key):
    """n_warmup=0 (fully warm-started run) must not crash the schedule."""
    logp = lambda v: -0.5 * jnp.sum(v * v)
    q0 = jax.random.normal(jax.random.PRNGKey(3), (4, 2), jnp.float64)
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(
            logp, k, q, n_warmup=0, n_samples=100,
            inv_mass0=jnp.ones(2, jnp.float64), eps0=0.5,
        )
    )(key, q0)
    assert samples.shape == (100, 4, 2)
    assert np.all(np.isfinite(np.asarray(samples)))
