"""MCMC diagnostics: split-R-hat / bulk-ESS statistical sanity and the
summarize/summary_table posterior-summary API."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors.diagnostics import (
    ess_bulk,
    split_rhat,
    summarize,
    summary_table,
)


def _iid_draws(rng, n=500, m=4, event=()):
    return jnp.asarray(rng.standard_normal((n, m) + event))


def test_rhat_ess_iid(rng):
    x = _iid_draws(rng)
    r = float(split_rhat(x))
    assert abs(r - 1.0) < 0.05
    e = ess_bulk(np.asarray(x))
    assert 0.5 * 2000 < e <= 1.5 * 2000


def test_rhat_detects_unmixed_chains(rng):
    x = np.asarray(_iid_draws(rng))
    x = x + 10.0 * np.arange(4)[None, :]  # chains at different levels
    assert float(split_rhat(jnp.asarray(x))) > 2.0
    assert ess_bulk(x) < 100


def test_ess_detects_autocorrelation(rng):
    n, m = 2000, 4
    eps = rng.standard_normal((n, m))
    x = np.empty((n, m))
    x[0] = eps[0]
    for t in range(1, n):  # AR(1), rho = 0.9 -> tau ~ 19
        x[t] = 0.9 * x[t - 1] + np.sqrt(1 - 0.81) * eps[t]
    e = ess_bulk(x)
    assert e < 0.2 * n * m  # far fewer effective draws than nominal


def test_summarize_pytree(rng):
    samples = {
        "mu": _iid_draws(rng, event=(3,)),
        "sigma": jnp.exp(_iid_draws(rng)),
    }
    s = summarize(samples)
    (mu_key,) = [k for k in s if "mu" in k]
    (sig_key,) = [k for k in s if "sigma" in k]
    assert s[mu_key]["mean"].shape == (3,)
    np.testing.assert_allclose(s[mu_key]["mean"], 0.0, atol=0.1)
    np.testing.assert_allclose(s[mu_key]["sd"], 1.0, rtol=0.1)
    assert np.all(s[mu_key]["q5"] < s[mu_key]["q50"])
    assert np.all(s[mu_key]["q50"] < s[mu_key]["q95"])
    assert np.all(np.abs(s[mu_key]["rhat"] - 1.0) < 0.05)
    assert np.shape(s[sig_key]["mean"]) == ()
    # lognormal median ~ 1
    np.testing.assert_allclose(s[sig_key]["q50"], 1.0, atol=0.15)


def test_summary_table_renders(rng):
    samples = {"mu": _iid_draws(rng, event=(2,)), "s": _iid_draws(rng)}
    txt = summary_table(samples)
    lines = txt.splitlines()
    assert "mean" in lines[0] and "rhat" in lines[0]
    assert len(lines) == 1 + 2 + 1  # header + mu[0], mu[1] + s
    assert any("[1]" in ln for ln in lines)


def test_summarize_rejects_missing_chain_axis(rng):
    try:
        summarize({"x": jnp.zeros(10)})
    except ValueError as e:
        assert "draws, chains" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_rank_normalized_folded_rhat_and_tail_ess(rng):
    """The Vehtari-2021 set: folded rank-normalized R-hat catches
    scale-mismatched chains that plain split-R-hat misses; tail ESS and
    MCSE behave on iid draws."""
    from tpu_bijectors.diagnostics import ess_tail, mcse_mean, rhat

    x = np.asarray(_iid_draws(rng))
    n, m = x.shape
    assert abs(float(rhat(x)) - 1.0) < 0.03
    et = float(ess_tail(x))
    assert 0.4 * n * m < et <= 1.6 * n * m
    mc = float(mcse_mean(x))
    np.testing.assert_allclose(mc, x.std(ddof=1) / np.sqrt(n * m), rtol=0.35)

    # one chain with the right MEAN but 4x the sd: location-based split-Rhat
    # barely moves, the folded statistic flags it
    y = x.copy()
    y[:, 0] *= 4.0
    assert float(rhat(y)) > 1.05
    # mean-shifted chains still flagged through the rank-normalized path
    z = x + 10.0 * np.arange(m)[None, :]
    assert float(rhat(z)) > 1.5


def test_summarize_includes_new_columns(rng):
    s = summarize({"mu": _iid_draws(rng)})
    (mu_key,) = [k for k in s if "mu" in k]
    for c in ("ess_tail", "mcse", "rhat"):
        assert c in s[mu_key], c
    txt = summary_table({"mu": _iid_draws(rng)})
    assert "ess_tail" in txt.splitlines()[0] and "mcse" in txt.splitlines()[0]
