"""NUTS/HMC sampling driver: warmup (windowed adaptation) + sampling, chains
vectorized with vmap, everything inside lax.scan — ONE jitted computation for
the whole run. Cross-chain adaptation statistics are averaged over the local
chain axis and pmean-ed over `axis_name` when running inside shard_map
(see ../shard/chain_parallel.py).

Checkpointable: the full sampler state (positions, rng key, step-size state,
Welford state, iteration) is a pytree — see ../shard/checkpoint.py
(SURVEY.md §5 failure-recovery requirement).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .adapt import (
    StepSizeAdaptState,
    WelfordState,
    build_schedule,
    stepsize_init,
    stepsize_update,
    welford_cov_init,
    welford_cov_update_batch,
    welford_covariance,
    welford_init,
    welford_update_batch,
    welford_variance,
)
from .hmc import hmc_kernel, nuts_kernel


class SamplerState(NamedTuple):
    """Complete, checkpointable sampler state."""

    key: jax.Array
    q: jax.Array  # (chains, dim)
    logp: jax.Array  # (chains,)
    grad: jax.Array  # (chains, dim)
    eps: jax.Array  # scalar step size (shared across chains)
    inv_mass: jax.Array  # (dim,) diagonal or (dim, dim) dense inverse mass
    ss: StepSizeAdaptState
    welford: WelfordState
    iteration: jax.Array


class RunStats(NamedTuple):
    accept_prob: jax.Array
    diverging: jax.Array
    n_steps: jax.Array
    tree_depth: jax.Array


def init_sampler(
    logdensity_fn, key, q0, eps0: float = 0.1, metric: str = "diag",
    batched: bool = False, inv_mass0=None,
) -> SamplerState:
    """q0: (chains, dim) initial positions. metric: 'diag' (Welford variance)
    or 'dense' (full covariance, Stan's dense_e). batched: logdensity_fn maps
    (chains, dim) -> (chains,) directly. inv_mass0 seeds the initial inverse
    mass (a posterior-covariance estimate, e.g. from Laplace/Pathfinder —
    (dim,) for diag, (dim, dim) for dense) instead of the identity; warmup
    still re-adapts it in the mass windows."""
    dtype = q0.dtype
    if batched:
        # use the SAME value-and-grad path the leapfrog runs
        # (hmc_batched._batched_logp_and_grad): with the fused one-pass
        # kernel engaged, the initial state's logp comes from the identical
        # density definition as every transition's, so the first MH
        # acceptance never compares energies across two formulations that
        # differ at the f32-association / eps-nudge level
        vg = getattr(logdensity_fn, "value_and_grad_fn", None)
        if vg is not None:
            logp, grad = vg(q0)
        else:
            logp, vjp = jax.vjp(logdensity_fn, q0)
            (grad,) = vjp(jnp.ones_like(logp))
    else:
        logp, grad = jax.vmap(jax.value_and_grad(logdensity_fn))(q0)
    dim = q0.shape[-1]
    if metric == "diag":
        inv_mass = jnp.ones(dim, dtype)
        wf = welford_init(dim, dtype)
    elif metric == "dense":
        inv_mass = jnp.eye(dim, dtype=dtype)
        wf = welford_cov_init(dim, dtype)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    if inv_mass0 is not None:
        inv_mass0 = jnp.asarray(inv_mass0, dtype)
        if inv_mass0.shape != inv_mass.shape:
            raise ValueError(
                f"inv_mass0 shape {inv_mass0.shape} does not match the "
                f"{metric!r} metric shape {inv_mass.shape}"
            )
        inv_mass = inv_mass0
    return SamplerState(
        key=key,
        q=q0,
        logp=logp,
        grad=grad,
        eps=jnp.asarray(eps0, dtype),
        inv_mass=inv_mass,
        ss=stepsize_init(eps0, dtype),
        welford=wf,
        iteration=jnp.asarray(0, jnp.int32),
    )


def _build_vkernel(logdensity_fn, kernel: str, max_depth: int, n_leapfrog: int):
    """Shared transition-kernel construction for warmup_and_sample and
    resume_sampling (same settings => bit-identical transitions). Returns
    (vkernel, init_logdensity)."""
    if kernel == "nuts":
        step_kernel = nuts_kernel(logdensity_fn, max_depth=max_depth)
    elif kernel == "nuts_batched":
        # natively multi-chain: logdensity_fn must map (chains, dim) -> (chains,)
        # (e.g. Model.batched_logdensity_fn) — Pallas kernels + one-backward
        # VJP engage in the leapfrog (see hmc_batched.py)
        from .hmc_batched import nuts_kernel_batched

        step_kernel = nuts_kernel_batched(logdensity_fn, max_depth=max_depth)
    elif kernel == "nuts_batched_t":
        # transposed-layout multi-chain: logdensity_fn must map
        # (dim, chains) -> (chains,) (e.g. Model.batched_logdensity_t_fn).
        # The whole tree runs on (dim, chains) state, so the whole-model
        # fused Pallas kernels evaluate the density and its reverse pass as
        # one kernel each per leapfrog; state transposes only at the
        # transition boundary (amortized over the up-to-2^depth leapfrogs).
        from .hmc_batched import nuts_kernel_batched

        step_kernel = nuts_kernel_batched(
            logdensity_fn, max_depth=max_depth, transposed=True
        )
    elif kernel == "hmc":
        step_kernel = hmc_kernel(logdensity_fn, n_leapfrog=n_leapfrog)
    else:
        raise ValueError(kernel)
    if kernel == "nuts_batched":
        vkernel = lambda keys, q, lp, g, eps, im: step_kernel(keys[0], q, lp, g, eps, im)
    elif kernel == "nuts_batched_t":

        def vkernel(keys, q, lp, g, eps, im):
            q1t, lp1, g1t, info = step_kernel(keys[0], q.T, lp, g.T, eps, im)
            return q1t.T, lp1, g1t.T, info

    else:
        vkernel = jax.vmap(step_kernel, in_axes=(0, 0, 0, 0, None, None))

    if kernel == "nuts_batched_t":
        init_logdensity = lambda q: logdensity_fn(q.T)
        vg = getattr(logdensity_fn, "value_and_grad_fn", None)
        if vg is not None:
            # propagate the leapfrog's fused value-and-grad path (layout-
            # adapted) so init_sampler's state.logp/grad come from the
            # same density definition as every transition's
            def _init_vg(q, vg=vg):
                lp, g = vg(q.T)
                return lp, g.T

            init_logdensity.value_and_grad_fn = _init_vg
    else:
        init_logdensity = logdensity_fn
    return vkernel, init_logdensity


def _fold_axis(sub, axis_name):
    """Per-device randomness under shard_map: fold the mesh position into
    the per-step subkey. Keeping the fold PER STEP (not once at entry)
    keeps SamplerState.key REPLICATED across the mesh — so a checkpoint of
    the state is complete and resume_sampling continues bit-identically on
    any mesh of the same width (shard/chain_parallel.py)."""
    if axis_name is None:
        return sub
    return jax.random.fold_in(sub, jax.lax.axis_index(axis_name))


def _run_sampling(
    vkernel, state: SamplerState, n_samples: int, thin: int, axis_name=None
):
    """The post-warmup sampling scan (shared verbatim by warmup_and_sample
    and resume_sampling so a resumed run is bit-identical to the tail of an
    uninterrupted one)."""

    def sample_step(state: SamplerState, _):
        k, sub = jax.random.split(state.key)
        keys = jax.random.split(_fold_axis(sub, axis_name), state.q.shape[0])
        q, logp, grad, info = vkernel(
            keys, state.q, state.logp, state.grad, state.eps, state.inv_mass
        )
        new_state = state._replace(
            key=k, q=q, logp=logp, grad=grad, iteration=state.iteration + 1
        )
        stats = RunStats(info.accept_prob, info.diverging, info.n_steps, info.tree_depth)
        return new_state, (q, stats)

    if thin <= 1:
        state, (samples, stats) = jax.lax.scan(
            sample_step, state, None, length=n_samples
        )
    else:
        def thinned(state, _):
            def inner(s, _):
                s, out = sample_step(s, None)
                return s, out[1]
            state, st = jax.lax.scan(inner, state, None, length=thin)
            # aggregate stats over the thin block — subsampling would
            # silently discard divergences from the skipped transitions
            block = RunStats(
                accept_prob=jnp.mean(st.accept_prob, axis=0),
                diverging=jnp.any(st.diverging, axis=0),
                n_steps=jnp.sum(st.n_steps, axis=0),
                tree_depth=jnp.max(st.tree_depth, axis=0),
            )
            return state, (state.q, block)

        state, (samples, stats) = jax.lax.scan(
            thinned, state, None, length=n_samples // thin
        )
    return samples, state, stats


def resume_sampling(
    logdensity_fn,
    state: SamplerState,
    n_samples: int,
    kernel: str = "nuts",
    max_depth: int = 10,
    n_leapfrog: int = 32,
    thin: int = 1,
    axis_name: str | None = None,
):
    """Continue post-warmup sampling from a SamplerState — e.g. one restored
    by shard/checkpoint.load_sampler_state after a preemption. With the same
    kernel settings, the continuation is BIT-IDENTICAL to the tail of an
    uninterrupted warmup_and_sample run (tests/test_shard.py; the driver's
    multichip dryrun exercises it on a device mesh through a save/load
    round-trip). Returns (samples, state, stats) like warmup_and_sample.

    The reference ships no failure recovery (SURVEY.md §5) — this is the
    net-new deployment obligation for long pod-slice runs."""
    vkernel, _ = _build_vkernel(logdensity_fn, kernel, max_depth, n_leapfrog)
    return _run_sampling(vkernel, state, n_samples, thin, axis_name)


def warmup_and_sample(
    logdensity_fn,
    key,
    q0,
    n_warmup: int = 500,
    n_samples: int = 500,
    kernel: str = "nuts",
    max_depth: int = 10,
    n_leapfrog: int = 32,
    target_accept: float = 0.8,
    eps0: float = 0.1,
    axis_name: str | None = None,
    thin: int = 1,
    metric: str = "diag",
    inv_mass0=None,
):
    """Run windowed-adaptation warmup then sampling.

    Returns (samples (n_samples//thin, chains, dim), SamplerState, RunStats).
    Fully jittable; call under jit/shard_map. With `axis_name` set, step-size
    and mass adaptation share statistics across all devices via collectives
    inside the step (no host sync). inv_mass0 seeds the pre-adaptation
    inverse mass (see init_sampler).
    """
    vkernel, init_logdensity = _build_vkernel(
        logdensity_fn, kernel, max_depth, n_leapfrog
    )
    state = init_sampler(
        init_logdensity, key, q0, eps0, metric=metric,
        batched=kernel.startswith("nuts_batched"), inv_mass0=inv_mass0,
    )
    window_id, window_end = build_schedule(n_warmup)
    dense = metric == "dense"
    wf_update = welford_cov_update_batch if dense else welford_update_batch
    wf_estimate = welford_covariance if dense else welford_variance
    wf_fresh = (
        (lambda d, dt: welford_cov_init(d, dt)) if dense else (lambda d, dt: welford_init(d, dt))
    )

    def mean_over_chains(x):
        m = jnp.mean(x)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        return m

    def warmup_step(state: SamplerState, sched):
        wid, wend = sched
        k, sub = jax.random.split(state.key)
        keys = jax.random.split(_fold_axis(sub, axis_name), state.q.shape[0])
        q, logp, grad, info = vkernel(
            keys, state.q, state.logp, state.grad, state.eps, state.inv_mass
        )
        # step size: dual averaging on the cross-chain mean accept prob
        acc = mean_over_chains(info.accept_prob)
        ss = stepsize_update(state.ss, acc, target=target_accept)
        eps = jnp.exp(ss.log_eps)
        # mass: Welford inside mass windows; refresh + reset at window ends
        in_window = wid >= 0
        wf_new = wf_update(state.welford, q, axis_name=axis_name)
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(in_window, a, b), wf_new, state.welford
        )
        var = wf_estimate(wf)
        refresh = wend & (wf.count > 2)
        inv_mass = jnp.where(refresh, var, state.inv_mass)
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(refresh, a, b),
            wf_fresh(state.q.shape[-1], state.q.dtype),
            wf,
        )
        # restart step-size adaptation after a metric refresh (Stan behavior)
        ss = jax.tree_util.tree_map(
            lambda a, b: jnp.where(refresh, a, b),
            stepsize_init_like(eps, ss),
            ss,
        )
        new_state = SamplerState(
            k, q, logp, grad, eps, inv_mass, ss, wf, state.iteration + 1
        )
        stats = RunStats(info.accept_prob, info.diverging, info.n_steps, info.tree_depth)
        return new_state, stats

    state, warm_stats = jax.lax.scan(
        warmup_step, state, (window_id, window_end), length=n_warmup
    )
    # final step size: the dual-averaged value
    state = state._replace(eps=jnp.exp(state.ss.log_eps_bar))
    return _run_sampling(vkernel, state, n_samples, thin, axis_name)


def stepsize_init_like(eps, ss: StepSizeAdaptState) -> StepSizeAdaptState:
    dtype = ss.log_eps.dtype
    log_eps = jnp.log(eps).astype(dtype)
    return StepSizeAdaptState(
        log_eps, log_eps, jnp.zeros((), dtype),
        jnp.log(10.0) + log_eps, jnp.zeros((), jnp.int32),
    )


def sample_with_kernel(
    logdensity_fn, key, q0, n_warmup, n_samples, kernel="nuts_batched",
    **kwargs,
):
    """The ONE place engine names are routed (Model.sample, neutra_sample,
    and sbc_ranks all dispatch through here): any warmup_and_sample kernel
    name, plus 'chees' -> run_chees. ChEES adapts its own mass matrix from
    scratch, so a warm-start `inv_mass0` (a warmup_and_sample kwarg) is
    dropped for it."""
    if kernel == "chees":
        from .chees import run_chees

        kwargs.pop("inv_mass0", None)
        return run_chees(
            logdensity_fn, key, q0, n_warmup=n_warmup, n_samples=n_samples,
            **kwargs,
        )
    return warmup_and_sample(
        logdensity_fn, key, q0, n_warmup=n_warmup, n_samples=n_samples,
        kernel=kernel, **kwargs,
    )
