"""Simulation-based calibration (Talts, Betancourt, Simpson, Vehtari &
Gelman 2018): the standard end-to-end correctness check for a Bayesian
sampler + model pair.

For each simulation, draw θ₀ ~ prior, data y ~ p(y|θ₀), sample the
posterior p(θ|y), and record the rank of θ₀ among the posterior draws.
If (and only if) the sampler targets the correct posterior, every rank
statistic is exactly uniform on {0, …, L}. Any measurable scalar of θ
works as a rank statistic — we use the *linked* (unconstrained)
coordinates, which the samplers natively produce.

TPU shape: all n_sims posteriors run as ONE batched NUTS — simulations
ride the chain axis (the DP axis), each chain's density conditioned on its
own dataset (leading-axis lookup into the simulated data). One jitted
computation for the whole calibration study; no per-simulation Python loop.

Net-new vs the reference (no inference there — SURVEY.md §2.7); the
uniformity spec follows the reference's test-harness philosophy (§4:
property checks with exact oracles).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..vectorize import unconstrain


class SBCResult(NamedTuple):
    ranks: jax.Array  # (n_sims, dim) integer ranks in {0, ..., n_draws}
    n_draws: int  # L: posterior draws per simulation after thinning
    theta0: object  # the prior draws (constrained pytree, leading (n_sims,))


def sbc_ranks(
    prior,
    simulate,
    loglik,
    key,
    n_sims: int = 64,
    n_warmup: int = 300,
    n_samples: int = 512,
    thin: int = 4,
    kernel: str = "nuts_batched",
    **kernel_kwargs,
) -> SBCResult:
    """Run the full SBC study as one batched sampler computation.

    prior: any distribution `unconstrain` supports (the model's joint prior).
    simulate: callable(key, x) -> data pytree for ONE prior draw x.
    loglik: callable(data, x) -> scalar log-likelihood for ONE simulation.
    thin: keep every thin-th draw for the rank (SBC's uniformity needs
    near-independent draws; Talts et al. §5.1).
    kernel: any warmup_and_sample kernel, or 'chees' (run_chees) — SBC
    doubles as the acid correctness test for a sampler: a biased engine
    cannot produce uniform ranks.

    Chains start at the true draw (a posterior-typical point by
    construction), so short warmups adapt cleanly."""
    from .sampler import sample_with_kernel

    u = unconstrain(prior)
    k_prior, k_data, k_run = jax.random.split(key, 3)
    theta0 = prior.sample(k_prior, (n_sims,))
    v0, _ = u.to_linked_vec(theta0)
    data = jax.vmap(simulate)(jax.random.split(k_data, n_sims), theta0)

    def batched_logp(v):
        x, lp = u.from_linked_vec_with_logpdf(v)
        if v.ndim > 1:
            return lp + jax.vmap(loglik)(data, x)
        raise ValueError("sbc log-density is batch-only")

    batched_logp.batch_capable = True

    samples, _, _ = sample_with_kernel(
        batched_logp, k_run, v0, n_warmup=n_warmup, n_samples=n_samples,
        kernel=kernel, **kernel_kwargs,
    )
    kept = samples[::thin]  # (L, n_sims, dim)
    ranks = jnp.sum(kept < v0[None, :, :], axis=0)
    return SBCResult(ranks, kept.shape[0], theta0)


def sbc_uniformity(ranks, n_draws: int, n_bins: int | None = None):
    """Chi-square uniformity p-value per coordinate.

    ranks: (n_sims, dim) in {0..n_draws}. Per-bin expected counts are exact
    for ANY (n_draws+1, n_bins) pair (bins need not divide the rank range;
    Talts et al. recommend n_sims/n_bins >= ~5 expected counts). Returns
    (dim,) p-values; calibrated samplers give p ~ U(0,1), a biased or
    over/under-dispersed posterior drives p -> 0."""
    from jax.scipy.special import gammainc

    ranks = jnp.asarray(ranks)
    n_sims = ranks.shape[0]
    if n_bins is None:
        n_bins = max(2, min(20, n_sims // 8))
    edges = jnp.linspace(0.0, n_draws + 1.0, n_bins + 1)

    def bin_of(r):
        return jnp.clip(
            jnp.searchsorted(edges, r + 0.5, side="right") - 1, 0, n_bins - 1
        )

    counts = jax.vmap(
        lambda col: jnp.bincount(col, length=n_bins), in_axes=1
    )(bin_of(ranks))  # (dim, n_bins)
    # exact null: rank uniform on {0..n_draws} -> expected_b proportional to
    # the number of integer rank values landing in bin b
    vals_per_bin = jnp.bincount(bin_of(jnp.arange(n_draws + 1)), length=n_bins)
    expected = n_sims * vals_per_bin / (n_draws + 1.0)
    stat = jnp.sum((counts - expected) ** 2 / expected, axis=1)
    dof = n_bins - 1
    return 1.0 - gammainc(dof / 2.0, stat / 2.0)  # chi2 survival function
