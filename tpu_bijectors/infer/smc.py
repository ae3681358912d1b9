"""Tempered Sequential Monte Carlo with systematic resampling.

Net-new vs the reference (SURVEY.md §2.2): particles are the data-parallel
axis; resampling uses a prefix-sum (cumulative weights) + one vectorized
searchsorted — O(N) and fully parallel. Under shard_map the weight
normalization and ESS use psum over the device axis and resampling gathers
ride an all_gather (see ../shard/chain_parallel.py).

Algorithm: adaptive-temperature SMC from prior to posterior:
  particles ~ prior (via from_linked_vec of N(0,I) or prior sampling),
  at each stage pick the next inverse temperature beta so the effective
  sample size of the incremental weights hits `target_ess` (bisection on
  beta inside the jitted step), resample systematically, then mutate with a
  few random-walk-Metropolis or HMC steps at the current temperature.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

def systematic_resample(key, log_weights):
    """Systematic resampling: returns parent indices (N,). Prefix-sum based
    (cumsum + searchsorted) — parallel on TPU."""
    n = log_weights.shape[0]
    w = jax.nn.softmax(log_weights)
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), w.dtype)
    pts = (u0 + jnp.arange(n, dtype=w.dtype)) / n
    # side="right": first index with cum > pt — u0 == 0.0 (uniform's range
    # includes it) must not resurrect a zero-weight prefix particle
    idx = jnp.searchsorted(cum, pts, side="right")
    return jnp.clip(idx, 0, n - 1)


def ess(log_weights):
    lw = log_weights - jax.scipy.special.logsumexp(log_weights)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))


class SMCState(NamedTuple):
    key: jax.Array
    particles: jax.Array  # (N, dim), or (dim, N) in transposed mode
    log_prior: jax.Array
    log_lik: jax.Array
    beta: jax.Array
    log_evidence: jax.Array
    stage: jax.Array


class SMCResult(NamedTuple):
    particles: jax.Array
    log_evidence: jax.Array
    n_stages: jax.Array
    final_beta: jax.Array


def _find_next_beta(log_lik, beta, target_ess_frac, n_bisect: int = 30):
    """Largest beta' in (beta, 1] with ESS(incremental weights) >= target."""
    n = log_lik.shape[0]
    target = target_ess_frac * n

    def ess_at(b):
        return ess((b - beta) * log_lik)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    full = ess_at(jnp.ones_like(beta))
    lo, hi = jax.lax.fori_loop(
        0, n_bisect, body, (beta, jnp.ones_like(beta))
    )
    nb = jnp.where(full >= target, jnp.ones_like(beta), lo)
    # strict-progress guard: if NO beta' reaches the target (e.g. most
    # particles have log_lik = -inf), lo stays exactly at beta and the
    # incremental weights would be 0 * (-inf) = NaN while the stage loop
    # stalls forever. Force a minimal step (low ESS for one stage is fine
    # — resampling handles it); at beta ~ 1 the clamp lands on 1 and ends
    # the loop.
    min_step = jnp.asarray(1e-6, log_lik.dtype)
    return jnp.minimum(jnp.maximum(nb, beta + min_step), 1.0)


def run_smc(
    log_prior_fn,
    log_lik_fn,
    key,
    particles0,
    n_mutations: int = 5,
    target_ess: float = 0.5,
    max_stages: int = 50,
    rw_scale: float = 0.3,
    mutation: str = "rwm",
    hmc_eps: float = 0.2,
    hmc_leapfrog: int = 8,
    transposed: bool = False,
) -> SMCResult:
    """Tempered SMC from `log_prior_fn` to `log_prior_fn + log_lik_fn` on flat
    unconstrained vectors. particles0: (N, dim) draws from the prior — or,
    with transposed=True, (dim, N) in the TPU-native orientation (particles
    on the 128-wide lane axis: density evaluation, the RWM/HMC mutation
    log-densities, and the HMC leapfrog's reverse pass all run on the whole
    particle block, engaging the whole-model fused kernels for eligible
    priors — pass Model.batched_logdensity_t_fn-style callables).

    Both densities are evaluated BATCHED everywhere (weights and mutation
    acceptance): per-sample callables are lifted with as_batched (vmap
    fallback); transposed mode requires batch-capable callables (there is
    no per-sample (dim,) semantics to vmap)."""
    if transposed:
        dim, n = particles0.shape
    else:
        n, dim = particles0.shape
    dtype = particles0.dtype

    from .model import as_batched

    if transposed and not (
        getattr(log_prior_fn, "batch_capable", False)
        and getattr(log_lik_fn, "batch_capable", False)
    ):
        raise ValueError(
            "transposed=True requires batch-capable log densities mapping "
            "(dim, N) -> (N,) (e.g. Model.batched_logdensity_t_fn)"
        )
    blp, bll = as_batched(log_prior_fn), as_batched(log_lik_fn)
    lp0 = blp(particles0)
    ll0 = bll(particles0)

    bexp = (lambda m: m[None, :]) if transposed else (lambda m: m[:, None])
    gather = (lambda P, i: P[:, i]) if transposed else (lambda P, i: P[i])

    def btempered(beta):
        def f(v):
            return blp(v) + beta * bll(v)

        return f

    def mutate_rwm(key, particles, beta):
        f = btempered(beta)

        def one_step(carry, k):
            particles, lp = carry
            k1, k2 = jax.random.split(k)
            prop = particles + rw_scale * jax.random.normal(
                k1, particles.shape, dtype
            )
            lp_prop = f(prop)
            accept = (
                jnp.log(jax.random.uniform(k2, (n,), dtype)) < lp_prop - lp
            )
            particles = jnp.where(bexp(accept), prop, particles)
            lp = jnp.where(accept, lp_prop, lp)
            return (particles, lp), jnp.mean(accept)

        lp = f(particles)
        keys = jax.random.split(key, n_mutations)
        (particles, _), acc = jax.lax.scan(one_step, (particles, lp), keys)
        return particles

    def mutate_hmc(key, particles, beta):
        from .hmc_batched import hmc_kernel_batched

        f = btempered(beta)
        kern = hmc_kernel_batched(
            f, n_leapfrog=hmc_leapfrog, transposed=transposed
        )
        lp, vjpf = jax.vjp(f, particles)
        (grad,) = vjpf(jnp.ones_like(lp))
        inv_mass = jnp.ones(dim, dtype)

        def one(carry, k):
            q, lp, grad = carry
            q, lp, grad, _ = kern(
                k, q, lp, grad, jnp.asarray(hmc_eps, dtype), inv_mass
            )
            return (q, lp, grad), None

        keys = jax.random.split(key, n_mutations)
        (particles, _, _), _ = jax.lax.scan(one, (particles, lp, grad), keys)
        return particles

    mutate = mutate_hmc if mutation == "hmc" else mutate_rwm

    def stage(state: SMCState):
        k, k_res, k_mut = jax.random.split(state.key, 3)
        new_beta = _find_next_beta(state.log_lik, state.beta, target_ess)
        inc = (new_beta - state.beta) * state.log_lik
        log_ev = state.log_evidence + (
            jax.scipy.special.logsumexp(inc) - jnp.log(float(n))
        )
        idx = systematic_resample(k_res, inc)
        particles = gather(state.particles, idx)
        particles = mutate(k_mut, particles, new_beta)
        lp = blp(particles)
        ll = bll(particles)
        return SMCState(k, particles, lp, ll, new_beta, log_ev, state.stage + 1)

    def cond(state: SMCState):
        return (state.beta < 1.0) & (state.stage < max_stages)

    init = SMCState(
        key, particles0, lp0, ll0,
        jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, stage, init)
    return SMCResult(final.particles, final.log_evidence, final.stage, final.beta)
