"""Parallel tempering (replica exchange) with batched HMC mutations.

Net-new inference layer (SURVEY.md §2.7). For multimodal posteriors a
single-temperature NUTS/HMC chain cannot cross between well-separated
modes; PT runs a ladder of K tempered targets

    π_k(v) ∝ prior(v) · lik(v)^{β_k},      0 = β_0 < … < β_{K-1} = 1

and exchanges states between adjacent temperatures, so cold-chain modes mix
through the hot end. Interface mirrors `run_smc` (log_prior_fn + log_lik_fn
on flat unconstrained vectors — use `Model` for the fused linked densities).

TPU-first shape:
- the whole (K temps × N chains) lattice advances as ONE batched HMC update
  ((K·N, dim) leapfrogs under one vmap — one fused XLA computation, MXU-
  friendly at any lattice size); densities are evaluated through
  `as_batched`, so batch-capable (fused whole-model) densities see the
  full lattice;
- swaps are the deterministic even-odd (non-reversible) scheme of Syed et
  al. 2021 — alternating parity touches every adjacent pair each two
  steps, expressible as one static gather + where per step (no host
  control flow);
- per-temperature step sizes and diagonal mass adapt in warmup (dual
  averaging / Welford vmapped over the ladder);
- the thermodynamic-integration evidence estimate falls out of the same
  lattice: log Z = ∫₀¹ E_β[log lik] dβ, trapezoid over the ladder.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .adapt import (
    stepsize_init,
    stepsize_update,
    welford_init,
    welford_update_batch,
    welford_variance,
)
from .hmc import IntegratorState


class PTResult(NamedTuple):
    samples: jax.Array  # (n_kept, n_chains, dim) COLD-chain draws (β = 1)
    swap_accept: jax.Array  # (K-1,) per-ATTEMPT swap acceptance per adjacent pair
    accept: jax.Array  # (K,) mean HMC acceptance per temperature
    log_evidence: jax.Array  # thermodynamic-integration estimate of log Z
    betas: jax.Array  # (K,) the ladder
    eps: jax.Array  # (K,) adapted step sizes


def default_ladder(n_temps: int, power: float = 3.0, dtype=jnp.float64):
    """β_k = (k/(K-1))^power — dense near β=1 where tempered targets change
    fastest; β_0 = 0 samples the prior exactly (proper by construction).
    n_temps=1 degenerates to plain HMC on the posterior (β = 1, not 0/0)."""
    if n_temps == 1:
        return jnp.ones(1, jnp.result_type(dtype, float))
    k = jnp.arange(n_temps, dtype=jnp.result_type(dtype, float))
    return (k / (n_temps - 1)) ** power


def run_parallel_tempering(
    log_prior_fn,
    log_lik_fn,
    key,
    q0,
    n_temps: int = 8,
    betas=None,
    n_warmup: int = 300,
    n_samples: int = 500,
    n_leapfrog: int = 16,
    eps0: float = 0.2,
    target_accept: float = 0.7,
    thin: int = 1,
    axis_name: str | None = None,
) -> PTResult:
    """q0: (n_chains, dim) initial positions, replicated up the ladder.
    Both density callables are lifted with `as_batched` (vmap fallback),
    so the whole lattice evaluates per call. Fully jittable.

    Returns cold-chain draws; `log_evidence` averages E_β[log lik] over
    the sampling phase and integrates the ladder by trapezoid.

    With `axis_name` set (inside shard_map — see
    shard.chain_parallel_pt), chains are the sharded axis: adaptation
    statistics, swap rates, and the TI means pmean across devices inside
    the step, so every device adapts identical ladders (swaps themselves
    are chain-column-local — zero communication)."""
    from .model import as_batched

    bprior = as_batched(log_prior_fn)
    blik = as_batched(log_lik_fn)

    q0 = jnp.asarray(q0)
    n_chains, dim = q0.shape
    dtype = q0.dtype
    if betas is None:
        betas = default_ladder(n_temps, dtype=dtype)
    betas = jnp.asarray(betas, dtype)
    k_temps = betas.shape[0]

    def cmean(x):
        """Mean over the chain axis, shared across devices when sharded."""
        m = jnp.mean(x, axis=1)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        return m

    def pieces(q):  # q: (K, N, dim) -> per-replica (log prior, log lik)
        flat = q.reshape(k_temps * n_chains, dim)
        lp = bprior(flat).reshape(k_temps, n_chains)
        ll = blik(flat).reshape(k_temps, n_chains)
        return lp, jnp.where(jnp.isfinite(ll), ll, -jnp.inf)

    def _blik_term(b, ll):
        # β·L with the β=0 convention made explicit: the prior-only rung
        # must stay finite even where L = -inf (0 * -inf would be NaN and
        # permanently freeze that rung + poison the TI integrand)
        return jnp.where(b > 0, b * ll, jnp.zeros_like(ll))

    def tempered(lp, ll):
        return lp + _blik_term(betas[:, None], ll)

    def lpg(q, betas_):
        """Values + gradients for the whole (K, N) lattice as ONE batched
        value/vjp pair per density (the fused whole-model kernels dispatch
        on the real (K*N, dim) batch; a per-example vmap would never
        engage them). Per-rung β enters as the vjp cotangent on the
        likelihood term."""
        flat = q.reshape(k_temps * n_chains, dim)
        bcol = jnp.repeat(betas_, n_chains)
        lp, vjp_p = jax.vjp(bprior, flat)
        ll, vjp_l = jax.vjp(blik, flat)
        ll = jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
        (gp,) = vjp_p(jnp.ones_like(lp))
        (gl,) = vjp_l(bcol.astype(lp.dtype))
        vals = (lp + _blik_term(bcol, ll)).reshape(k_temps, n_chains)
        grads = (gp + jnp.where(bcol[:, None] > 0, gl, 0.0)).reshape(
            k_temps, n_chains, dim
        )
        return vals, grads

    def hmc_update(key, q, logp, eps, inv_mass):
        """One fixed-trajectory HMC transition of the whole lattice; eps
        (K,), inv_mass (K, dim) per-temperature DIAGONAL metrics (the hmc.py
        helpers dispatch dense on ndim > 1, so the broadcastable diag algebra
        is local). The gradient is re-derived from (q, betas) internally
        (swaps relocate states, so a carried gradient would be stale)."""
        k_mom, k_acc = jax.random.split(key)
        e = eps[:, None, None]
        im = inv_mass[:, None, :]  # (K, 1, dim) broadcasting over chains
        z = jax.random.normal(k_mom, q.shape, dtype)
        p0 = z / jnp.sqrt(im)  # p ~ N(0, M), M = diag(1/inv_mass)

        def kin(p):
            return 0.5 * jnp.sum(p * p * im, axis=-1)

        energy0 = -logp + kin(p0)
        _, g0 = lpg(q, betas)
        state = IntegratorState(q, p0, logp, g0)

        def step(s, _):
            qq, pp, _, gg = s
            p_half = pp + 0.5 * e * gg
            q_new = qq + e * (p_half * im)
            logp_new, g_new = lpg(q_new, betas)
            p_new = p_half + 0.5 * e * g_new
            return IntegratorState(q_new, p_new, logp_new, g_new), None

        state, _ = jax.lax.scan(step, state, None, length=n_leapfrog)
        energy1 = -state.logp + kin(state.p)
        delta = energy1 - energy0
        acc_p = jnp.minimum(1.0, jnp.exp(jnp.minimum(-delta, 0.0)))
        acc_p = jnp.where(jnp.isfinite(delta), acc_p, 0.0)
        accept = jax.random.uniform(k_acc, acc_p.shape, dtype) < acc_p
        q1 = jnp.where(accept[..., None], state.q, q)
        logp1 = jnp.where(accept, state.logp, logp)
        return q1, logp1, acc_p

    def swap(key, q, lp, ll, parity):
        """Even-odd adjacent swaps: pair (k, k+1) for k ≡ parity (mod 2).
        Acceptance exp((β_{k+1}-β_k)(L_k - L_{k+1})) per chain column."""
        k_idx = jnp.arange(k_temps)
        is_lo = (k_idx % 2 == parity) & (k_idx < k_temps - 1)
        partner = jnp.where(
            is_lo, k_idx + 1, jnp.where((k_idx - 1) % 2 == parity, k_idx - 1, k_idx)
        )
        d_beta = betas[partner] - betas  # (K,)
        log_r = jnp.where(
            is_lo[:, None], d_beta[:, None] * (ll - ll[partner]), -jnp.inf
        )  # decision made at the lower index of each pair
        u = jax.random.uniform(key, (k_temps, n_chains), dtype)
        acc_lo = jnp.log(u) < log_r  # (K, N), False on non-lo rows
        # a row swaps if it is the lo of an accepted pair, or the hi of one
        acc = acc_lo | acc_lo[partner]
        q2 = jnp.where(acc[..., None], q[partner], q)
        lp2 = jnp.where(acc, lp[partner], lp)
        ll2 = jnp.where(acc, ll[partner], ll)
        # per-pair acceptance rate, indexed by the lo temperature; each pair
        # is only ATTEMPTED on its parity's sweeps, so also return the
        # attempt mask — averaging raw per-sweep rates would halve the
        # per-attempt acceptance the ladder is tuned on
        pair_acc = cmean(acc_lo.astype(dtype))[:-1]
        attempted = is_lo[:-1].astype(dtype)
        return q2, lp2, ll2, pair_acc, attempted

    # --- init ------------------------------------------------------------
    q = jnp.broadcast_to(q0[None], (k_temps, n_chains, dim))
    lp0, ll0 = pieces(q)
    logp = tempered(lp0, ll0)

    ss0 = jax.vmap(lambda _: stepsize_init(eps0, dtype))(jnp.arange(k_temps))
    wf0 = jax.vmap(lambda _: welford_init(dim, dtype))(jnp.arange(k_temps))
    inv_mass0 = jnp.ones((k_temps, dim), dtype)

    def sweep(carry, xs):
        """One HMC update + one swap round (+ adaptation in warmup)."""
        key, q, logp, lp, ll, ss, wf, inv_mass, it, warm = carry
        k1, k2, key = jax.random.split(key, 3)
        eps = jnp.exp(ss.log_eps)
        q, logp, acc_p = hmc_update(k1, q, logp, eps, inv_mass)
        lp, ll = pieces(q)
        q, lp, ll, pair_acc, attempted = swap(k2, q, lp, ll, it % 2)
        logp = tempered(lp, ll)
        # adaptation (frozen after warmup); stats pmean across devices
        acc_mean = cmean(acc_p)
        ss_new = jax.vmap(
            lambda s, a: stepsize_update(s, a, target=target_accept)
        )(ss, acc_mean)
        wf_new = jax.vmap(
            lambda s, x: welford_update_batch(s, x, axis_name=axis_name)
        )(wf, q)
        ss = jax.tree_util.tree_map(
            lambda a, b: jnp.where(warm, a, b), ss_new, ss
        )
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(warm, a, b), wf_new, wf
        )
        return (
            (key, q, logp, lp, ll, ss, wf, inv_mass, it + 1, warm),
            (q[-1], acc_mean, pair_acc, attempted, cmean(ll)),
        )

    warm_carry = (
        key, q, logp, lp0, ll0, ss0, wf0, inv_mass0,
        jnp.asarray(0, jnp.int32), jnp.asarray(True),
    )
    warm_carry, _ = jax.lax.scan(sweep, warm_carry, None, length=n_warmup)

    # freeze: step size to the dual-averaging mean, mass to Welford variance
    key, q, logp, lp, ll, ss, wf, _, it, _ = warm_carry
    eps = jnp.exp(ss.log_eps_bar)
    ss = ss._replace(log_eps=ss.log_eps_bar)
    inv_mass = jnp.maximum(jax.vmap(welford_variance)(wf), 1e-10)
    carry = (key, q, logp, lp, ll, ss, wf, inv_mass, it, jnp.asarray(False))
    carry, (cold, acc_p, pair_acc, attempted, mean_ll) = jax.lax.scan(
        sweep, carry, None, length=n_samples
    )

    log_z = jnp.trapezoid(jnp.mean(mean_ll, axis=0), betas)
    # per-ATTEMPT acceptance: each adjacent pair is only tried on its
    # parity's sweeps (every other one)
    swap_accept = jnp.sum(pair_acc, axis=0) / jnp.maximum(
        jnp.sum(attempted, axis=0), 1.0
    )
    return PTResult(
        samples=cold[:: max(thin, 1)],
        swap_accept=swap_accept,
        accept=jnp.mean(acc_p, axis=0),
        log_evidence=log_z,
        betas=betas,
        eps=eps,
    )
