"""Parallel tempering: mode recovery on a bimodal target single-chain HMC
cannot mix (the engine's reason to exist), moment correctness on a unimodal
conjugate, and the thermodynamic-integration evidence against the analytic
value (SURVEY.md §4 moment tier)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.infer import (
    Model,
    default_ladder,
    run_parallel_tempering,
)


def test_ladder():
    b = np.asarray(default_ladder(6))
    assert b[0] == 0.0 and b[-1] == 1.0
    assert np.all(np.diff(b) > 0)


def _bimodal():
    """Prior N(0, 3²); likelihood a symmetric two-mode factor at ±4 with
    scale 0.5 — posterior modes are ~16 sd's apart in likelihood scale."""
    log_prior = lambda v: -0.5 * jnp.sum((v / 3.0) ** 2) - jnp.log(
        3.0 * jnp.sqrt(2 * jnp.pi)
    )
    log_lik = lambda v: jax.scipy.special.logsumexp(
        jnp.stack(
            [
                -0.5 * jnp.sum(((v - 4.0) / 0.5) ** 2),
                -0.5 * jnp.sum(((v + 4.0) / 0.5) ** 2),
            ]
        )
    ) - jnp.log(2.0)
    return log_prior, log_lik


def test_bimodal_mode_recovery(key):
    """Both modes populated with ~equal mass; the cold chain mean ≈ 0.
    (A single-temperature HMC chain started at one mode essentially never
    crosses: the between-mode density is ~exp(-32) of the peak.)"""
    log_prior, log_lik = _bimodal()
    q0 = jnp.full((32, 1), 4.0)  # all chains start in ONE mode
    res = jax.jit(
        lambda k: run_parallel_tempering(
            log_prior, log_lik, k, q0,
            n_temps=8, n_warmup=300, n_samples=600, n_leapfrog=8,
        )
    )(key)
    draws = np.asarray(res.samples).reshape(-1)
    frac_neg = float((draws < 0).mean())
    assert 0.3 < frac_neg < 0.7, frac_neg
    # modes in the right place
    assert abs(abs(draws).mean() - 4.0) < 0.3
    # swaps actually happen on every rung
    assert np.all(np.asarray(res.swap_accept) > 0.1)


def test_unimodal_moments_and_evidence(key):
    """Gaussian conjugate: x ~ N(0,1), y|x ~ N(1, 0.5²) ⇒ posterior
    N(0.8, 0.2), evidence N(y; 0, 1 + 0.25). PT must reproduce all three
    (TI is exact for this family up to MC/discretization error)."""
    y, s = 1.0, 0.5
    log_prior = lambda v: -0.5 * jnp.sum(v * v) - 0.5 * jnp.log(2 * jnp.pi)
    log_lik = lambda v: -0.5 * ((y - v[0]) / s) ** 2 - jnp.log(
        s * jnp.sqrt(2 * jnp.pi)
    )
    post_var = 1.0 / (1.0 + 1.0 / s**2)
    post_mean = post_var * y / s**2
    exact_logev = -0.5 * y**2 / (1 + s**2) - 0.5 * np.log(
        2 * np.pi * (1 + s**2)
    )
    q0 = jax.random.normal(jax.random.PRNGKey(1), (64, 1))
    res = jax.jit(
        lambda k: run_parallel_tempering(
            log_prior, log_lik, k, q0,
            n_temps=12, n_warmup=300, n_samples=800, n_leapfrog=8,
        )
    )(key)
    draws = np.asarray(res.samples).reshape(-1)
    np.testing.assert_allclose(draws.mean(), post_mean, atol=0.05)
    np.testing.assert_allclose(draws.var(), post_var, rtol=0.15)
    np.testing.assert_allclose(float(res.log_evidence), exact_logev, atol=0.1)
    # adapted step sizes grow toward the hot (wider) end
    assert float(res.eps[0]) > 0 and np.all(np.isfinite(np.asarray(res.eps)))


def test_pt_on_model_linked_densities(key):
    """PT through the vectorize layer (Model prior/likelihood split on a
    constrained support): Beta-Binomial moments."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    model = Model(priors=dists.NamedProduct.of(p=dists.Beta(a, b)))
    loglik = lambda x: heads * jnp.log(x["p"]) + (n_trials - heads) * jnp.log1p(
        -x["p"]
    )
    log_prior = model.batched_logdensity_fn()
    log_lik = lambda v: loglik(model.constrain(v))
    q0 = jax.random.normal(jax.random.PRNGKey(2), (32, 1))
    res = run_parallel_tempering(
        log_prior, log_lik, key, q0,
        n_temps=6, n_warmup=200, n_samples=500, n_leapfrog=8,
    )
    p = np.asarray(model.constrain(res.samples.reshape(-1, 1))["p"]).ravel()
    a_post, b_post = a + heads, b + n_trials - heads
    exact_mean = a_post / (a_post + b_post)
    np.testing.assert_allclose(p.mean(), exact_mean, atol=0.03)


def test_pt_zero_likelihood_region_beta0_stays_alive(key):
    """The β=0 (prior) rung wanders into log_lik = -inf territory by
    design; 0 * (-inf) used to freeze it with NaN. Guarded: the rung keeps
    moving, TI evidence is finite and matches log P(v > 0) = log 0.5."""
    import jax.numpy as jnp

    from tpu_bijectors.infer import run_parallel_tempering

    logp = lambda v: -0.5 * jnp.sum(v * v, -1)
    loglik = lambda v: jnp.where(v[..., 0] > 0, 0.0, -jnp.inf)
    logp.batch_capable = loglik.batch_capable = True
    q0 = jnp.abs(jax.random.normal(key, (16, 1), jnp.float64))  # feasible start
    res = run_parallel_tempering(
        logp, loglik, jax.random.PRNGKey(1), q0, n_temps=8,
        n_warmup=300, n_samples=500, n_leapfrog=8,
    )
    x = np.asarray(res.samples).ravel()
    assert np.all(np.isfinite(x))
    assert np.all(x > 0)  # cold chain respects the constraint
    # TI evidence is legitimately -inf here (E_prior[log lik] diverges for
    # hard constraints) — the guarded code must give -inf, NEVER NaN
    assert not np.isnan(float(res.log_evidence))
    assert np.all(np.isfinite(np.asarray(res.eps)))
    # the beta=0 rung stays ALIVE (0 * -inf used to freeze it with NaN)
    assert float(np.asarray(res.accept)[0]) > 0.2
    # cold-chain half-normal moments confirm real mixing
    np.testing.assert_allclose(x.mean(), np.sqrt(2 / np.pi), atol=0.1)


def test_default_ladder_single_rung():
    from tpu_bijectors.infer import default_ladder

    np.testing.assert_array_equal(np.asarray(default_ladder(1)), [1.0])
