"""Bridge-sampling marginal-likelihood estimation (Meng & Wong 1996).

Net-new inference layer (SURVEY.md §2.7). Given posterior draws (from any
engine) and a tractable proposal g spanning the posterior (a LaplaceApprox,
an ADVI Gaussian, or any object with `.sample(key, n)` and
`.logdensity(x)`), the optimal-bridge fixed point estimates

    log Z = log ∫ p̃(v) dv,      p̃ = exp(logdensity_fn)  (unnormalized)

typically 1-3 orders of magnitude more accurately than Laplace or naive
importance sampling, at the cost of N extra density evaluations. The whole
iteration is a fixed-length `lax.scan` in log space (logaddexp/logsumexp —
no overflow for arbitrarily peaked posteriors) and every density call is
batched (`as_batched`), so fused whole-model densities engage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ISResult(NamedTuple):
    log_evidence: jax.Array
    ess: jax.Array  # importance-weight effective sample size
    pareto_k: jax.Array  # GPD tail shape of the weights (>0.7 = unreliable)


def importance_sampling_evidence(
    logdensity_fn,
    proposal,
    key,
    n: int = 4096,
) -> ISResult:
    """One-shot importance-sampling log Z from any fitted proposal exposing
    `.sample(key, n)` + normalized `.logdensity(v)` (an ADVI Gaussian —
    especially an `estimator='iwelbo'` fit, whose objective IS this
    estimator's bound — or a LaplaceApprox):

        log Z ≈ lse_i(log p̃(v_i) - log g(v_i)) - log n,   v_i ~ g.

    Cheaper than bridge sampling (no posterior draws needed) but only
    trustworthy when g covers the posterior — check `ess` and `pareto_k`
    (Yao et al. 2018: k > 0.7 means the weights have effectively infinite
    variance). One batched density call; fused whole-model kernels engage."""
    from .loo import fit_gpd
    from .model import as_batched

    blogp = as_batched(logdensity_fn)
    draws = proposal.sample(key, n)
    logw = blogp(draws) - proposal.logdensity(draws)
    logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
    lse = jax.scipy.special.logsumexp
    log_z = lse(logw) - jnp.log(jnp.asarray(float(n), logw.dtype))
    ess = jnp.exp(2.0 * lse(logw) - lse(2.0 * logw))
    # GPD fit to the top ~20% of the weights, exactly as psis_loo does it
    # (loo.py:96-106): exclusive cutoff, exceedances stabilized by the tail
    # MAX so exp never overflows even for wildly mismatched proposals —
    # the regime this diagnostic exists to flag (fit_gpd's k is scale-free)
    m_tail = int(min(0.2 * n, 3.0 * (n**0.5)))
    if m_tail < 5:
        raise ValueError(f"too few draws ({n}) for the Pareto-k tail fit")
    srt = jnp.sort(logw)
    cutoff = srt[-m_tail - 1]
    tail = srt[-m_tail:]
    mx = tail[-1]
    exc = jnp.exp(tail - mx) - jnp.exp(cutoff - mx)
    k_fit, _ = fit_gpd(exc)
    # degenerate tail (a near-perfect proposal: all weights equal to float
    # precision) starves the ZS grid (quartile exceedance ~ 0 -> division
    # blowups -> NaN); that regime is by definition light-tailed
    spread = mx - cutoff
    k = jnp.where(spread > 1e-8, k_fit, jnp.asarray(-0.5, logw.dtype))
    return ISResult(log_z, ess, k)


class BridgeResult(NamedTuple):
    log_evidence: jax.Array  # final log Z estimate
    trace: jax.Array  # (n_iters,) per-iteration log r (convergence check)
    rel_mc_error: jax.Array  # rough relative MC error of exp-scale Z


def bridge_sampling_evidence(
    logdensity_fn,
    posterior_draws,
    proposal,
    key,
    n_proposal: int | None = None,
    n_iters: int = 64,
) -> BridgeResult:
    """posterior_draws: (N1, dim) linked-space draws from the posterior
    (Model.sample with constrained=False, SMC particles, ensemble output —
    flattened over chains). `proposal` must expose `.sample(key, n)` and
    `.logdensity(x)` returning NORMALIZED log g (LaplaceApprox does;
    map_laplace's output is the standard choice).

    The optimal-bridge iteration (log-space form of Meng & Wong eq. 4.4):

        log r ← [lse_j(l2_j - A_j) - log N2] - [lse_i(-B_i) - log N1]
        A = logaddexp(log s1 + l2, log s2 + log r)
        B = logaddexp(log s1 + l1, log s2 + log r)

    with l = log p̃ - log g at posterior (l1) / proposal (l2) draws and
    s1 = N1/(N1+N2), s2 = N2/(N1+N2). Fixed n_iters (the fixed point is a
    contraction; 64 is far past convergence — check `trace`)."""
    from .model import as_batched

    blogp = as_batched(logdensity_fn)
    draws = jnp.asarray(posterior_draws)
    n1 = draws.shape[0]
    n2 = n_proposal or n1
    prop = proposal.sample(key, n2)

    l1 = blogp(draws) - proposal.logdensity(draws)
    l2 = blogp(prop) - proposal.logdensity(prop)
    l1 = jnp.where(jnp.isfinite(l1), l1, -jnp.inf)
    l2 = jnp.where(jnp.isfinite(l2), l2, -jnp.inf)

    dtype = l1.dtype
    ls1 = jnp.log(jnp.asarray(n1 / (n1 + n2), dtype))
    ls2 = jnp.log(jnp.asarray(n2 / (n1 + n2), dtype))
    lse = jax.scipy.special.logsumexp

    def body(log_r, _):
        a = jnp.logaddexp(ls1 + l2, ls2 + log_r)
        b = jnp.logaddexp(ls1 + l1, ls2 + log_r)
        num = lse(l2 - a) - jnp.log(jnp.asarray(n2, dtype))
        den = lse(-b) - jnp.log(jnp.asarray(n1, dtype))
        log_r2 = num - den
        return log_r2, log_r2

    # start at the (cheap, biased-low) reciprocal-importance estimate
    log_r0 = lse(l2) - jnp.log(jnp.asarray(n2, dtype))
    log_z, trace = jax.lax.scan(body, log_r0, None, length=n_iters)

    # Frühwirth-Schnatter-style rough relative error: var of the two
    # bridge-weight populations (good as a sanity flag, not a CI)
    a = jnp.logaddexp(ls1 + l2, ls2 + log_z)
    b = jnp.logaddexp(ls1 + l1, ls2 + log_z)
    f2 = jnp.exp(l2 - a - (lse(l2 - a) - jnp.log(jnp.asarray(n2, dtype))))
    f1 = jnp.exp(log_z - b - (lse(log_z - b) - jnp.log(jnp.asarray(n1, dtype))))
    rel = jnp.sqrt(jnp.var(f2) / n2 + jnp.var(f1) / n1)
    return BridgeResult(log_z, trace, rel)
