"""Simulation-based calibration: exact-null uniformity machinery (positive
and negative analytic controls) and the end-to-end batched-NUTS study on a
conjugate model."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.infer import sbc_ranks, sbc_uniformity


def _analytic_ranks(rng, n_sims, n_draws, sd_scale=1.0, s_lik=1.0, n_obs=5):
    """Normal-Normal conjugate: rank theta0 among draws from the exact
    posterior with its sd multiplied by sd_scale (1.0 = calibrated)."""
    ranks = np.empty(n_sims, np.int64)
    for i in range(n_sims):
        theta0 = rng.standard_normal()
        y = theta0 + s_lik * rng.standard_normal(n_obs)
        prec = 1.0 + n_obs / s_lik**2
        m = (y.sum() / s_lik**2) / prec
        s = 1.0 / np.sqrt(prec)
        draws = m + sd_scale * s * rng.standard_normal(n_draws)
        ranks[i] = np.sum(draws < theta0)
    return ranks[:, None]


def test_sbc_uniformity_calibrated_vs_underdispersed(rng):
    n_sims, n_draws = 256, 127
    p_good = float(sbc_uniformity(_analytic_ranks(rng, n_sims, n_draws), n_draws)[0])
    assert p_good > 0.01
    # under-dispersed posterior: ranks pile at the extremes -> p ~ 0
    p_bad = float(
        sbc_uniformity(_analytic_ranks(rng, n_sims, n_draws, sd_scale=0.5), n_draws)[0]
    )
    assert p_bad < 1e-4
    # biased posterior fails too
    ranks_biased = np.clip(
        _analytic_ranks(rng, n_sims, n_draws) + n_draws // 4, 0, n_draws
    )
    assert float(sbc_uniformity(ranks_biased, n_draws)[0]) < 1e-4


def test_sbc_uniformity_exact_null_any_binning():
    """Expected counts are exact even when n_bins does not divide the rank
    range: a PERFECTLY uniform rank sample gives statistic ~ 0."""
    n_draws = 128  # 129 values, 8 bins -> uneven integer coverage
    reps = 4
    ranks = np.tile(np.arange(n_draws + 1), reps)[:, None]  # exactly uniform
    p = float(sbc_uniformity(ranks, n_draws, n_bins=8)[0])
    assert p > 0.999  # statistic ~ 0 under the exact-null expected counts


def test_sbc_nuts_normal_model(key):
    """End-to-end: one batched-NUTS SBC study on mu ~ N(0,1),
    tau ~ LogNormal(0, 0.5), y | mu,tau ~ N(mu, tau) — both linked
    coordinates must be calibrated."""
    n_obs = 5
    prior = dists.NamedProduct.of(
        mu=dists.Normal(0.0, 1.0), tau=dists.LogNormal(0.0, 0.5)
    )

    def simulate(k, x):
        return x["mu"] + x["tau"] * jax.random.normal(k, (n_obs,), jnp.float64)

    def loglik(y, x):
        return jnp.sum(
            -0.5 * ((y - x["mu"]) / x["tau"]) ** 2 - jnp.log(x["tau"])
        )

    res = jax.jit(
        lambda k: sbc_ranks(
            prior, simulate, loglik, k, n_sims=96, n_warmup=300,
            n_samples=512, thin=4,
        )
    )(key)
    assert res.ranks.shape == (96, 2)
    assert res.n_draws == 128
    assert int(res.ranks.min()) >= 0 and int(res.ranks.max()) <= 128
    p = np.asarray(sbc_uniformity(res.ranks, res.n_draws))
    assert np.all(p > 0.005), p


def test_sbc_calibrates_chees(key):
    """SBC as the acid test of the ChEES engine: uniform ranks on the same
    conjugate model (a biased sampler cannot fake this)."""
    n_obs = 5
    prior = dists.NamedProduct.of(
        mu=dists.Normal(0.0, 1.0), tau=dists.LogNormal(0.0, 0.5)
    )

    def simulate(k, x):
        return x["mu"] + x["tau"] * jax.random.normal(k, (n_obs,), jnp.float64)

    def loglik(y, x):
        return jnp.sum(
            -0.5 * ((y - x["mu"]) / x["tau"]) ** 2 - jnp.log(x["tau"])
        )

    res = jax.jit(
        lambda k: sbc_ranks(
            prior, simulate, loglik, k, n_sims=96, n_warmup=400,
            n_samples=512, thin=4, kernel="chees",
        )
    )(key)
    p = np.asarray(sbc_uniformity(res.ranks, res.n_draws))
    assert np.all(p > 0.005), p
