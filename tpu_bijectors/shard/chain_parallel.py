"""Chain-parallel NUTS / particle-parallel SMC over a jax.sharding.Mesh.

Chains/particles are the data-parallel axis (SURVEY.md §2.2): per-chain state
is embarrassingly parallel; the ONLY cross-device traffic is

  * dual-averaging accept statistics and Welford mass-matrix accumulators:
    `pmean`/`psum` over the 'chain' mesh axis INSIDE the jitted warmup step
    (tiny scalars/(dim,) vectors, hidden under compute; no host sync);
  * SMC resampling: log-weights `all_gather` over the axis + global
    systematic resampling with static index arithmetic.

Multi-host: `multihost_init` wraps `jax.distributed.initialize`; the same
`shard_map` program runs across hosts with the mesh spanning all devices
(ICI within a slice, DCN across slices — XLA owns the transport).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..infer.sampler import warmup_and_sample
from ..infer.smc import systematic_resample


def multihost_init(**kwargs):
    """Initialize the multi-host process group over DCN
    (jax.distributed.initialize; no-op if already initialized)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def make_mesh(axis_name: str = "chain", devices=None) -> Mesh:
    """1-D mesh over all (local or global) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_chains(mesh: Mesh, x, axis_name: str = "chain"):
    """Place a (chains, ...) array with the chain axis sharded over the mesh."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def build_nuts_sharded(
    logdensity_fn,
    mesh: Mesh,
    n_chains: int,
    axis_name: str = "chain",
    **kwargs,
):
    """The jitted chain-parallel NUTS program (key, q0) -> (samples, state,
    stats), exposed so tools can `.lower(...).compile()` it for per-device
    HLO cost / collective-count analysis (tools/scaling_bench.py)."""
    n_dev = mesh.devices.size
    if n_chains % n_dev:
        raise ValueError(f"n_chains={n_chains} not divisible by mesh size {n_dev}")

    def local_run(key, q0_local):
        # Per-device: q0_local is (n_chains/n_dev, dim). Device-independent
        # randomness comes from the PER-STEP axis-index fold inside
        # warmup_and_sample (_fold_axis) — the master key in SamplerState
        # stays replicated across the mesh, so checkpoints of the state are
        # complete and chain_parallel_resume continues bit-identically.
        return warmup_and_sample(
            logdensity_fn, key, q0_local, axis_name=axis_name, **kwargs
        )

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None)),
        out_specs=(
            P(None, axis_name, None),  # samples (T, chains, dim)
            _state_specs(axis_name),
            P(None, axis_name),  # stats (T, chains)
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def chain_parallel_nuts(
    logdensity_fn,
    mesh: Mesh,
    key,
    q0,
    axis_name: str = "chain",
    **kwargs,
):
    """Run warmup_and_sample with chains sharded over `mesh`.

    q0: (n_chains, dim) with n_chains divisible by the mesh size. Adaptation
    statistics are shared across ALL chains on ALL devices via collectives
    inside the step (kwargs forwarded to warmup_and_sample).
    """
    return build_nuts_sharded(
        logdensity_fn, mesh, q0.shape[0], axis_name=axis_name, **kwargs
    )(key, q0)


def build_resume_sharded(
    logdensity_fn,
    mesh: Mesh,
    n_samples: int,
    axis_name: str = "chain",
    **kwargs,
):
    """The jitted resume program (state) -> (samples, state, stats),
    exposed so tools can `.lower(...).compile()` it for per-device HLO
    cost / collective-count analysis (tools/scaling_bench.py)."""
    from ..infer.sampler import resume_sampling

    def local_resume(state_local):
        return resume_sampling(
            logdensity_fn, state_local, n_samples, axis_name=axis_name, **kwargs
        )

    specs = _state_specs(axis_name)
    sharded = jax.shard_map(
        local_resume,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=(
            P(None, axis_name, None),  # samples (T, chains, dim)
            specs,
            P(None, axis_name),  # stats (T, chains)
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


def chain_parallel_resume(
    logdensity_fn,
    mesh: Mesh,
    state,
    n_samples: int,
    axis_name: str = "chain",
    **kwargs,
):
    """Continue post-warmup sampling from a (checkpoint-restored)
    SamplerState with chains sharded over `mesh` — the preemption-recovery
    path for pod runs: save_sampler_state mid-run, reload on the new slice,
    resume. With the same kernel settings the continuation is BIT-IDENTICAL
    to the tail of an uninterrupted chain_parallel_nuts run (exercised on
    the mesh by the driver's dryrun_multichip). Host arrays from
    load_sampler_state are accepted: shard_map re-lays them out per
    _state_specs."""
    n_chains = int(jnp.shape(state.q)[0])
    n_dev = mesh.devices.size
    if n_chains % n_dev:
        # same contract as build_nuts_sharded — a checkpoint from a
        # 16-chain run cannot resume on a 3-device mesh; fail with the
        # clear error, not shard_map's opaque reshape failure
        raise ValueError(
            f"checkpointed n_chains={n_chains} not divisible by mesh size {n_dev}"
        )
    specs = _state_specs(axis_name)
    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        state,
        specs,
    )
    return build_resume_sharded(
        logdensity_fn, mesh, n_samples, axis_name=axis_name, **kwargs
    )(state)


def _state_specs(axis_name):
    """PartitionSpecs for SamplerState: per-chain fields sharded, shared
    adaptation state replicated."""
    from ..infer.sampler import SamplerState

    return SamplerState(
        key=P(),
        q=P(axis_name, None),
        logp=P(axis_name),
        grad=P(axis_name, None),
        eps=P(),
        inv_mass=P(None),
        ss=jax.tree_util.tree_map(lambda _: P(), _ss_proto()),
        welford=jax.tree_util.tree_map(lambda _: P(), _wf_proto()),
        iteration=P(),
    )


def _ss_proto():
    from ..infer.adapt import StepSizeAdaptState

    z = jnp.zeros(())
    return StepSizeAdaptState(z, z, z, z, z)


def _wf_proto():
    from ..infer.adapt import WelfordState

    z = jnp.zeros(())
    return WelfordState(z, z, z)


def chain_parallel_chees(
    logdensity_fn,
    mesh: Mesh,
    key,
    q0,
    axis_name: str = "chain",
    **kwargs,
):
    """run_chees with chains sharded over `mesh`: leapfrogs are lockstep
    ACROSS DEVICES too (the trajectory schedule is a shared scalar), and
    the ChEES gradient / harmonic acceptance / Welford mass all pmean over
    the axis inside the step — the same zero-host-sync contract as
    chain_parallel_nuts."""
    from ..infer.chees import CheesState, run_chees

    n_dev = mesh.devices.size
    if q0.shape[0] % n_dev:
        raise ValueError(
            f"n_chains={q0.shape[0]} not divisible by mesh size {n_dev}"
        )

    def local_run(key, q0_local):
        idx = jax.lax.axis_index(axis_name)
        key_local = jax.random.fold_in(key, idx)
        return run_chees(
            logdensity_fn, key_local, q0_local, axis_name=axis_name, **kwargs
        )

    z = P()
    state_specs = CheesState(
        key=z, q=P(axis_name, None), logp=P(axis_name), grad=P(axis_name, None),
        eps=z, log_t=z, inv_mass=P(None),
        ss=jax.tree_util.tree_map(lambda _: z, _ss_proto()),
        welford=jax.tree_util.tree_map(lambda _: z, _wf_proto()),
        adam_m=z, adam_v=z, iteration=z,
    )
    from ..infer.chees import CheesStats

    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None)),
        out_specs=(
            P(None, axis_name, None),  # samples
            state_specs,
            CheesStats(
                P(None, axis_name), P(None, axis_name), P(None), P(None)
            ),
        ),
        check_vma=False,
    )
    return jax.jit(sharded)(key, q0)


def chain_parallel_pathfinder(
    logdensity_fn,
    mesh: Mesh,
    key,
    v0s,
    n_draws: int = 1000,
    per_path_draws: int = 200,
    axis_name: str = "chain",
    **kwargs,
):
    """Multi-path Pathfinder with the PATH axis sharded over `mesh`: each
    device runs its block of independent L-BFGS paths (the embarrassingly
    parallel axis), then the per-draw log importance weights and pooled
    draws all_gather once for the GLOBAL truncated-importance resampling
    (the truncation threshold uses the global mean weight, so the sharded
    result is identical to `infer.multipath_pathfinder` on the same key —
    the per-path key block is the same slice of the same split).

    v0s: (n_paths, dim), n_paths divisible by the mesh size. Returns
    (draws (n_draws, dim) replicated, per-path PathfinderResult stack
    sharded on its leading axis). kwargs forward to fit_pathfinder."""
    from ..infer.pathfinder import fit_pathfinder

    p, dim = v0s.shape
    n_dev = mesh.devices.size
    if p % n_dev:
        raise ValueError(f"n_paths={p} not divisible by mesh size {n_dev}")
    kp, kr = jax.random.split(key)
    keys = jax.random.split(kp, p)

    def local_run(keys_local, v0s_local):
        res = jax.vmap(
            lambda k, v: fit_pathfinder(
                logdensity_fn, k, v, n_draws=per_path_draws, **kwargs
            )
        )(keys_local, v0s_local)
        pool_l = res.draws.reshape(-1, dim)
        logw_l = (res.logp - res.logq).reshape(-1)
        # gather the (small) weight vector + pooled draws; the resampling
        # then runs identically on every device (kr is replicated)
        pool = jax.lax.all_gather(pool_l, axis_name).reshape(-1, dim)
        logw = jax.lax.all_gather(logw_l, axis_name).reshape(-1)
        logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
        n = logw.shape[0]
        log_mean_w = jax.scipy.special.logsumexp(logw) - jnp.log(n)
        logw_t = jnp.minimum(logw, log_mean_w + 0.5 * jnp.log(n))
        take = jax.random.categorical(kr, logw_t, shape=(n_draws,))
        return pool[take], res

    # spec tree for the per-path result stack (eval_shape outside the mesh
    # context: local_run itself contains collectives)
    res_shape = jax.eval_shape(
        lambda k, v: jax.vmap(
            lambda kk, vv: fit_pathfinder(
                logdensity_fn, kk, vv, n_draws=per_path_draws, **kwargs
            )
        )(k, v),
        keys,
        v0s,
    )
    res_specs = jax.tree_util.tree_map(lambda _: P(axis_name), res_shape)
    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name, None)),
        out_specs=(P(), res_specs),
        check_vma=False,
    )
    return jax.jit(sharded)(keys, v0s)


def build_advi_sharded(
    logdensity_fn,
    mesh: Mesh,
    dim: int,
    q,
    axis_name: str = "chain",
    **kwargs,
):
    """The jitted MC-sharded ADVI program (key, q0) -> ADVIResult, exposed
    so tools can `.lower(...).compile()` it for per-device HLO cost /
    collective-count analysis (tools/scaling_bench.py)."""
    from ..infer.advi import ADVIResult, fit_advi

    n_dev = mesh.devices.size
    n_mc = kwargs.get("n_mc", 32)
    if n_mc % n_dev:
        raise ValueError(f"n_mc={n_mc} not divisible by mesh size {n_dev}")

    def local_run(key, q):
        return fit_advi(
            logdensity_fn, key, dim, q=q,
            axis_name=axis_name, n_dev=n_dev, **kwargs,
        )

    q_specs = jax.tree_util.tree_map(lambda _: P(), q)
    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(), q_specs),
        out_specs=ADVIResult(q=q_specs, losses=P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def chain_parallel_advi(
    logdensity_fn,
    mesh: Mesh,
    key,
    dim: int,
    q=None,
    axis_name: str = "chain",
    **kwargs,
):
    """fit_advi with the MC-sample batch sharded over `mesh` (the ADVI leg
    of the DP axis — BASELINE.md north star "chain-parallel NUTS/ADVI/SMC";
    SURVEY.md §2.2 DP row).

    Each device draws the identical full (n_mc, dim) reparameterized batch
    from the replicated per-step key, evaluates the target density only on
    its n_mc/n_dev slice, and the ELBO value and gradient are pmean'd over
    the axis INSIDE the jitted scan step — the same zero-host-sync,
    in-step-collective design as chain_parallel_nuts. The optimizer state
    and q stay replicated, so the whole trajectory equals the unsharded
    fit_advi's up to summation order (asserted in tests/test_shard.py).

    Works with all fit_advi families/estimators (mean-field / full-rank /
    flow q; elbo / stl / iwelbo; transposed=True for the whole-model
    fused-kernel density path). n_mc must be divisible by the mesh size.
    kwargs are forwarded to fit_advi. Returns ADVIResult (replicated)."""
    from ..infer.advi import MeanFieldGaussian

    if q is None:
        q = MeanFieldGaussian.init(dim, kwargs.get("dtype", jnp.float32))
    return build_advi_sharded(
        logdensity_fn, mesh, dim, q, axis_name=axis_name, **kwargs
    )(key, q)


# ---------------------------------------------------------------------------
# Particle-parallel SMC
# ---------------------------------------------------------------------------


def distributed_systematic_resample(key, log_weights_local, axis_name: str):
    """Global systematic resampling with particles sharded over `axis_name`.

    all_gather the (small) per-particle log-weights, compute the global
    parents, then gather the local slice of parent indices and fetch parent
    particles by a gather over the full particle array (all_gather of
    particles; for very large states an index-exchange ppermute scheme would
    replace this — weights-first keeps it simple and correct).
    Returns local parent indices into the GLOBAL particle array.
    """
    n_local = log_weights_local.shape[0]
    lw_all = jax.lax.all_gather(log_weights_local, axis_name)  # (n_dev, n_local)
    lw_flat = lw_all.reshape(-1)
    parents = systematic_resample(key, lw_flat)  # (n_global,) same on all devices
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(parents, idx * n_local, n_local)


def build_smc_sharded(
    log_prior_fn,
    log_lik_fn,
    mesh: Mesh,
    n: int,
    dim: int,
    axis_name: str = "chain",
    n_mutations: int = 5,
    target_ess: float = 0.5,
    max_stages: int = 50,
    rw_scale: float = 0.3,
):
    """The jitted particle-parallel tempered-SMC program
    (key, particles0) -> (particles, log_evidence, beta, stages), exposed
    so tools can `.lower(...).compile()` it for per-device HLO cost /
    collective-count analysis (tools/scaling_bench.py). Resampling uses
    all_gather'd weights + a global systematic pick; mutation is local."""
    n_dev = mesh.devices.size
    if n % n_dev:
        raise ValueError(f"particles {n} not divisible by mesh {n_dev}")

    from ..infer.model import as_batched

    blp, bll = as_batched(log_prior_fn), as_batched(log_lik_fn)

    def local_smc(key, parts_local):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        n_local = parts_local.shape[0]
        dtype = parts_local.dtype

        def tempered(beta):
            # batched over the local particle block (batch kernels engage
            # when the caller passes batch-capable densities)
            return lambda v: blp(v) + beta * bll(v)

        def ess_global(lw_local):
            m = jax.lax.pmax(jnp.max(lw_local), axis_name)
            w = jnp.exp(lw_local - m)
            s1 = jax.lax.psum(jnp.sum(w), axis_name)
            s2 = jax.lax.psum(jnp.sum(w * w), axis_name)
            return s1 * s1 / s2

        def next_beta(ll_local, beta):
            target = target_ess * (n_local * n_dev)

            def body(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                ok = ess_global((mid - beta) * ll_local) >= target
                return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

            full_ok = ess_global((1.0 - beta) * ll_local) >= target
            lo, hi = jax.lax.fori_loop(0, 30, body, (beta, jnp.ones_like(beta)))
            nb = jnp.where(full_ok, jnp.ones_like(beta), lo)
            # strict-progress guard (see infer/smc.py::_find_next_beta):
            # nb == beta would make inc = 0 * (-inf) = NaN and stall
            return jnp.minimum(jnp.maximum(nb, beta + 1e-6), 1.0)

        def mutate(key, parts, beta):
            f = tempered(beta)
            lp = f(parts)

            def one(carry, k):
                parts, lp = carry
                k1, k2 = jax.random.split(k)
                prop = parts + rw_scale * jax.random.normal(k1, parts.shape, dtype)
                lp_prop = f(prop)
                acc = jnp.log(jax.random.uniform(k2, (n_local,), dtype)) < lp_prop - lp
                return (jnp.where(acc[:, None], prop, parts),
                        jnp.where(acc, lp_prop, lp)), None

            (parts, _), _ = jax.lax.scan(
                one, (parts, lp), jax.random.split(key, n_mutations)
            )
            return parts

        def stage(state):
            k, parts, ll, beta, log_ev, it = state
            k, k_res, k_mut = jax.random.split(k, 3)
            # the resampling key must be IDENTICAL on all devices
            k_res = jax.lax.pmax(
                jax.random.key_data(jax.random.fold_in(key, 0)), axis_name
            )
            k_res = jax.random.wrap_key_data(k_res)
            k_res = jax.random.fold_in(k_res, it)
            nb = next_beta(ll, beta)
            inc = (nb - beta) * ll
            m = jax.lax.pmax(jnp.max(inc), axis_name)
            sum_w = jax.lax.psum(jnp.sum(jnp.exp(inc - m)), axis_name)
            log_ev = log_ev + m + jnp.log(sum_w) - jnp.log(float(n_local * n_dev))
            parents = distributed_systematic_resample(k_res, inc, axis_name)
            all_parts = jax.lax.all_gather(parts, axis_name).reshape(-1, dim)
            parts = all_parts[parents]
            parts = mutate(k_mut, parts, nb)
            ll = bll(parts)
            return (k, parts, ll, nb, log_ev, it + 1)

        def cond(state):
            _, _, _, beta, _, it = state
            return (beta < 1.0) & (it < max_stages)

        ll0 = bll(parts_local)
        init = (
            key, parts_local, ll0,
            jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.asarray(0, jnp.int32),
        )
        k, parts, ll, beta, log_ev, it = jax.lax.while_loop(cond, stage, init)
        return parts, log_ev, beta, it

    sharded = jax.shard_map(
        local_smc,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None)),
        out_specs=(P(axis_name, None), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def chain_parallel_smc(
    log_prior_fn,
    log_lik_fn,
    mesh: Mesh,
    key,
    particles0,
    axis_name: str = "chain",
    **kwargs,
):
    """Run tempered SMC with particles sharded over the mesh (see
    build_smc_sharded for the program and kwargs)."""
    n, dim = particles0.shape
    return build_smc_sharded(
        log_prior_fn, log_lik_fn, mesh, n, dim, axis_name=axis_name, **kwargs
    )(key, particles0)


def chain_parallel_pt(
    log_prior_fn,
    log_lik_fn,
    mesh: Mesh,
    key,
    q0,
    axis_name: str = "chain",
    **kwargs,
):
    """Parallel tempering with the CHAIN axis of the (temps × chains)
    lattice sharded over `mesh` (infer.run_parallel_tempering kwargs
    forwarded). Replica exchange is chain-column-local — zero exchange
    communication; only the scalar adaptation/TI statistics pmean across
    devices inside each sweep. q0: (n_chains, dim), divisible by the mesh
    size."""
    from ..infer.tempering import PTResult, run_parallel_tempering

    n_dev = mesh.devices.size
    if q0.shape[0] % n_dev:
        raise ValueError(
            f"n_chains={q0.shape[0]} not divisible by mesh size {n_dev}"
        )

    def local_run(key, q0_local):
        idx = jax.lax.axis_index(axis_name)
        key_local = jax.random.fold_in(key, idx)
        return run_parallel_tempering(
            log_prior_fn, log_lik_fn, key_local, q0_local,
            axis_name=axis_name, **kwargs,
        )

    out_specs = PTResult(
        samples=P(None, axis_name, None),
        swap_accept=P(),
        accept=P(),
        log_evidence=P(),
        betas=P(),
        eps=P(),
    )
    sharded = jax.shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)(key, q0)
