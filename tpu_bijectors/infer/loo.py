"""PSIS-LOO cross-validation and WAIC (Vehtari, Gelman & Gabry 2017).

Net-new inference layer (SURVEY.md §2.7): model criticism from posterior
draws. Input is the pointwise log-likelihood matrix ll[s, i] =
log p(y_i | θ_s) — engine-agnostic (compute it from any sampler's draws
with one vmapped call), so the API is a pure array transform.

The Pareto-smoothed importance weights use the Zhang & Stephens (2009)
profile-posterior GPD fit, vectorized across observations: per observation
the tail is a fixed-size sorted slice (static shapes — one `jnp.sort` per
column, no data-dependent control flow), the θ-grid profile likelihood is
one broadcast, and the smoothed tail is the fitted GPD's expected order
statistics. Everything jit-compatible; `pareto_k` flags the observations
whose importance distribution is too heavy-tailed to trust (k > 0.7)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LOOResult(NamedTuple):
    elpd_loo: jax.Array  # expected log pointwise predictive density (sum)
    se: jax.Array  # standard error of elpd_loo
    p_loo: jax.Array  # effective number of parameters
    pointwise: jax.Array  # (n_obs,) per-observation elpd contributions
    pareto_k: jax.Array  # (n_obs,) GPD shape diagnostics (k > 0.7 = bad)


class WAICResult(NamedTuple):
    elpd_waic: jax.Array
    se: jax.Array
    p_waic: jax.Array
    pointwise: jax.Array


def fit_gpd(y):
    """Generalized-Pareto (k, σ) fit to exceedances y ≥ 0 by the Zhang &
    Stephens (2009) profile posterior — closed-form grid, no optimizer.
    Returned k is the TAIL INDEX ξ (cdf = 1 - (1 + k y/σ)^{-1/k}, k > 0
    heavy tail — the convention of PSIS diagnostics); ZS work in b = -ξ/σ
    internally. k is regularized toward 0.5 with a weak prior (ArviZ's
    stabilization) so tiny tails don't produce wild shapes."""
    import math

    y = jnp.sort(jnp.asarray(y))
    n = y.shape[0]  # static
    m = 30 + math.isqrt(n)  # static grid size
    dtype = y.dtype
    q1 = y[(n + 2) // 4]  # ~first-quartile exceedance
    jgrid = jnp.arange(1, m + 1, dtype=dtype)
    # candidate b values (ZS2009 eq. 7); b < 1/y_max required
    b = 1.0 / y[-1] + (1.0 - jnp.sqrt(m / (jgrid - 0.5))) / (3.0 * q1)

    def prof(t):
        # ZS shape k_zs = -ξ at this b; profile log-likelihood
        kzs = -jnp.mean(jnp.log1p(-t * y))
        return n * (jnp.log(t / kzs) + kzs - 1.0)

    w = jax.nn.softmax(jax.vmap(prof)(b))
    b_hat = jnp.sum(w * b)
    kzs = -jnp.mean(jnp.log1p(-b_hat * y))
    sigma_hat = kzs / b_hat  # same sign ⇒ σ > 0
    xi = -kzs
    # weak-prior regularization: pull ξ toward 0.5 with weight 10
    xi = (n * xi + 10 * 0.5) / (n + 10)
    return xi, sigma_hat


def _gpd_quantile(p, k, sigma):
    """(σ/k)((1-p)^{-k} - 1), exponential limit at k → 0."""
    small = jnp.abs(k) < 1e-8
    ksafe = jnp.where(small, 1.0, k)
    return jnp.where(
        small,
        -sigma * jnp.log1p(-p),
        sigma * jnp.expm1(-ksafe * jnp.log1p(-p)) / ksafe,
    )


def psis_loo(ll) -> LOOResult:
    """ll: (n_draws, n_obs) pointwise log-likelihood matrix. Importance
    ratios r_s ∝ 1/p(y_i|θ_s); the largest M = min(n/5, 3√n) ratios per
    observation are replaced by the fitted GPD's expected order statistics
    (capped at the raw maximum), then elpd_i = log Σ w̄ p / Σ w̄."""
    ll = jnp.asarray(ll)
    s, n_obs = ll.shape
    dtype = ll.dtype
    m = int(min(s / 5.0, 3.0 * s**0.5))
    if m < 5:
        raise ValueError(f"too few draws ({s}) for PSIS tail fitting")
    logr = -ll  # (s, n_obs), unnormalized log importance ratios

    def one(lr):
        # sort ascending; tail = last m entries
        srt = jnp.sort(lr)
        idx = jnp.argsort(lr)
        cutoff = srt[-m - 1]
        # exceedances on the exp scale, relative to the cutoff (stabilized
        # by the tail max so exp never overflows)
        tail = srt[-m:]
        mx = tail[-1]
        exc = jnp.exp(tail - mx) - jnp.exp(cutoff - mx)
        k_hat, sigma = fit_gpd(exc)
        # replace tail by GPD expected order statistics (ArviZ scheme)
        p = (jnp.arange(1, m + 1, dtype=dtype) - 0.5) / m
        smooth = jnp.log(
            _gpd_quantile(p, k_hat, sigma) + jnp.exp(cutoff - mx)
        ) + mx
        smooth = jnp.minimum(smooth, mx)  # never exceed the raw max
        new_sorted = jnp.concatenate([srt[:-m], smooth])
        # scatter back to original draw order
        lw = jnp.zeros_like(lr).at[idx].set(new_sorted)
        return lw, k_hat

    lw, k_hat = jax.vmap(one, in_axes=1, out_axes=(1, 0))(logr)
    # normalized log weights; elpd_i = lse(lw + ll) - lse(lw)
    lse = jax.scipy.special.logsumexp
    elpd_i = lse(lw + ll, axis=0) - lse(lw, axis=0)
    lpd_i = lse(ll, axis=0) - jnp.log(jnp.asarray(s, dtype))
    p_loo = jnp.sum(lpd_i - elpd_i)
    elpd = jnp.sum(elpd_i)
    se = jnp.sqrt(n_obs * jnp.var(elpd_i, ddof=1))
    return LOOResult(elpd, se, p_loo, elpd_i, k_hat)


def waic(ll) -> WAICResult:
    """ll: (n_draws, n_obs). elpd_waic = Σ_i [lpd_i - var_s(ll_si)]."""
    ll = jnp.asarray(ll)
    s, n_obs = ll.shape
    lse = jax.scipy.special.logsumexp
    lpd_i = lse(ll, axis=0) - jnp.log(jnp.asarray(s, ll.dtype))
    p_i = jnp.var(ll, axis=0, ddof=1)
    elpd_i = lpd_i - p_i
    return WAICResult(
        jnp.sum(elpd_i),
        jnp.sqrt(n_obs * jnp.var(elpd_i, ddof=1)),
        jnp.sum(p_i),
        elpd_i,
    )
