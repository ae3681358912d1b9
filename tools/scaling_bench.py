"""Strong-scaling harness on the virtual CPU mesh (VERDICT r1 Next #7).

Real pods are out of scope in this environment (one TPU chip via a tunnel),
so this measures the STRUCTURAL cost of the sharding machinery: the same
total work (fixed total chains/particles) is partitioned over 1/2/4/8
virtual CPU devices that all share ONE physical core. Ideal strong scaling
on shared hardware is flat wall time; efficiency_N = t_1 / t_N measures the
overhead the mesh partitioning + collectives add (>= 0.85 is the SURVEY §2.2
multi-host proxy target). Writes SCALING_r05.json and prints a markdown
table for docs/sharding.md.

Usage: python tools/scaling_bench.py [--quick]
"""

import json
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def _mesh(n_dev):
    from tpu_bijectors.shard import make_mesh

    return make_mesh("chain", devices=jax.devices()[:n_dev])


def time_nuts(n_dev, total_chains, dim, n_warmup, n_samples):
    from tpu_bijectors.shard import chain_parallel_nuts, shard_chains

    # anisotropic Gaussian: representative leapfrog cost, deterministic
    scales = jnp.asarray(np.geomspace(0.5, 3.0, dim))

    def logp(v):
        return -0.5 * jnp.sum((v / scales) ** 2)

    mesh = _mesh(n_dev)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (total_chains, dim))
    q0 = shard_chains(mesh, q0)
    key = jax.random.PRNGKey(1)

    def run():
        samples, state, stats = chain_parallel_nuts(
            logp, mesh, key, q0, n_warmup=n_warmup, n_samples=n_samples
        )
        return jax.block_until_ready(samples)

    run()  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_smc(n_dev, total_particles, dim, n_mutations):
    from tpu_bijectors.shard import chain_parallel_smc, shard_chains

    def log_prior(v):
        return -0.5 * jnp.sum(v**2)

    def log_lik(v):
        return -0.5 * jnp.sum(((v - 1.5) / 0.5) ** 2)

    mesh = _mesh(n_dev)
    parts0 = jax.random.normal(jax.random.PRNGKey(3), (total_particles, dim))
    parts0 = shard_chains(mesh, parts0)
    key = jax.random.PRNGKey(4)

    def run():
        parts, log_ev, beta, stages = chain_parallel_smc(
            log_prior, log_lik, mesh, key, parts0, n_mutations=n_mutations
        )
        return jax.block_until_ready(parts)

    run()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)


def compiled_cost(n_dev, total_chains, dim, n_warmup, n_samples):
    """Per-device COMPILED cost of the chain-parallel NUTS program at mesh
    width n_dev: HLO collective-op counts + XLA cost_analysis (flops /
    bytes accessed / transcendentals) for one device's executable.

    This is the honest scaling artifact on this environment (VERDICT r2
    Weak #7): wall-clock on N virtual devices sharing ONE physical core
    measures fixed-overhead amortization, not scaling — efficiencies > 1
    are noise. The compiled program, by contrast, is exactly what a real
    N-chip mesh would run: device-count-invariant per-device cost + a
    small fixed set of scalar/(dim,) collectives IS the ≥85 % scaling
    story, modulo ICI latency that cannot be measured here."""
    from tpu_bijectors.shard import build_nuts_sharded, shard_chains

    scales = jnp.asarray(np.geomspace(0.5, 3.0, dim))

    def logp(v):
        return -0.5 * jnp.sum((v / scales) ** 2)

    mesh = _mesh(n_dev)
    q0 = jax.random.normal(jax.random.PRNGKey(0), (total_chains, dim))
    q0 = shard_chains(mesh, q0)
    prog = build_nuts_sharded(
        logp, mesh, total_chains, n_warmup=n_warmup, n_samples=n_samples
    )
    compiled = prog.lower(jax.random.PRNGKey(1), q0).compile()
    txt = compiled.as_text()
    counts = {op: txt.count(f" {op}(") + txt.count(f" {op}-start(") for op in _COLLECTIVES}
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    keep = {}
    for k in ("flops", "bytes accessed", "transcendentals", "utilization operand 0 {}"):
        if k in ca:
            keep[k.replace(" ", "_")] = float(ca[k])
    return counts, keep


def compiled_cost_smc(n_dev, total_particles, dim):
    """Same compiled-cost probe for the particle-parallel SMC program —
    the all_gather-heavy path (weights + particle exchange per stage)."""
    from tpu_bijectors.shard import shard_chains
    from tpu_bijectors.shard.chain_parallel import build_smc_sharded

    def log_prior(v):
        return -0.5 * jnp.sum(v**2)

    def log_lik(v):
        return -0.5 * jnp.sum(((v - 1.5) / 0.5) ** 2)

    mesh = _mesh(n_dev)
    parts0 = jax.random.normal(jax.random.PRNGKey(3), (total_particles, dim))
    parts0 = shard_chains(mesh, parts0)
    prog = build_smc_sharded(
        log_prior, log_lik, mesh, total_particles, dim, n_mutations=2
    )
    compiled = prog.lower(jax.random.PRNGKey(4), parts0).compile()
    txt = compiled.as_text()
    counts = {op: txt.count(f" {op}(") + txt.count(f" {op}-start(") for op in _COLLECTIVES}
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    keep = {
        k.replace(" ", "_"): float(ca[k])
        for k in ("flops", "bytes accessed", "transcendentals")
        if k in ca
    }
    return counts, keep


def _cost_of(compiled):
    txt = compiled.as_text()
    counts = {
        op: txt.count(f" {op}(") + txt.count(f" {op}-start(")
        for op in _COLLECTIVES
    }
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    keep = {
        k.replace(" ", "_"): float(ca[k])
        for k in ("flops", "bytes accessed", "transcendentals")
        if k in ca
    }
    return counts, keep


def compiled_cost_resume(n_dev, total_chains, dim, n_samples):
    """Compiled cost of the checkpoint-resume program (r5: the `_fold_axis`
    key-replication redesign changed this graph at e75a9b8 — VERDICT r4
    weak-2 asked for a recapture that covers it)."""
    from tpu_bijectors.infer import init_sampler
    from tpu_bijectors.shard import build_resume_sharded, shard_chains

    scales = jnp.asarray(np.geomspace(0.5, 3.0, dim))

    def logp(v):
        return -0.5 * jnp.sum((v / scales) ** 2)

    mesh = _mesh(n_dev)
    q0 = jax.random.normal(jax.random.PRNGKey(5), (total_chains, dim))
    state = init_sampler(logp, jax.random.PRNGKey(6), q0)
    from tpu_bijectors.shard.chain_parallel import _state_specs
    from jax.sharding import NamedSharding

    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        state,
        _state_specs("chain"),
    )
    prog = build_resume_sharded(logp, mesh, n_samples)
    return _cost_of(prog.lower(state).compile())


def compiled_cost_advi(n_dev, n_mc, dim, n_steps):
    """Compiled cost of the MC-sharded ADVI program (the r5 ADVI leg of the
    DP axis): per-device DENSITY flops drop ~1/N (each device evaluates
    n_mc/n_dev samples) with one (loss, grad) pmean per step. The probe
    density is a 64-component mixture so the density dominates the
    (replicated, deliberately so) q-sampling — the regime MC-sharding is
    for; with a density as cheap as the sampler the fraction saturates at
    the sampling cost, which is the honest physics, not an artifact."""
    from tpu_bijectors.infer.advi import MeanFieldGaussian
    from tpu_bijectors.shard import build_advi_sharded

    scales = jnp.asarray(np.geomspace(0.5, 3.0, dim))
    centers = jnp.linspace(-2.0, 2.0, 64)[:, None] * jnp.ones((dim,))

    def logp(v):
        d2 = jnp.sum(
            ((v[..., None, :] - centers) / scales) ** 2, axis=-1
        )  # (..., 64)
        return jax.scipy.special.logsumexp(-0.5 * d2, axis=-1)

    logp.batch_capable = True
    mesh = _mesh(n_dev)
    q = MeanFieldGaussian.init(dim, jnp.float64)
    prog = build_advi_sharded(
        logp, mesh, dim, q, n_mc=n_mc, n_steps=n_steps, dtype=jnp.float64
    )
    return _cost_of(prog.lower(jax.random.PRNGKey(7), q).compile())


def main():
    quick = "--quick" in sys.argv
    total_chains = 32 if quick else 256
    dim = 16
    n_warmup = 60 if quick else 100
    n_samples = 60 if quick else 100
    total_particles = 256 if quick else 4096
    n_mc = 64 if quick else 256
    n_advi_steps = 20 if quick else 50

    rows = []
    for n_dev in (1, 2, 4, 8):
        coll, cost = compiled_cost(n_dev, total_chains, dim, n_warmup, n_samples)
        coll_smc, cost_smc = compiled_cost_smc(n_dev, total_particles, dim)
        coll_res, cost_res = compiled_cost_resume(
            n_dev, total_chains, dim, n_samples
        )
        coll_advi, cost_advi = compiled_cost_advi(n_dev, n_mc, dim, n_advi_steps)
        t_nuts = time_nuts(n_dev, total_chains, dim, n_warmup, n_samples)
        t_smc = time_smc(n_dev, total_particles, dim, n_mutations=4)
        rows.append({
            "n_dev": n_dev,
            "collectives": coll,
            "cost_analysis_per_device": cost,
            "smc_collectives": coll_smc,
            "smc_cost_analysis_per_device": cost_smc,
            "resume_collectives": coll_res,
            "resume_cost_analysis_per_device": cost_res,
            "advi_collectives": coll_advi,
            "advi_cost_analysis_per_device": cost_advi,
            "t_nuts_s": round(t_nuts, 3),
            "t_smc_s": round(t_smc, 3),
        })
        print(
            f"n_dev={n_dev}: collectives={coll} cost={cost} "
            f"advi={cost_advi} nuts {t_nuts:.3f}s smc {t_smc:.3f}s",
            file=sys.stderr,
        )

    # per-device flops should drop ~1/N at fixed total work; collectives
    # should stay a small constant count (they carry scalars/(dim,) vecs)
    f1 = rows[0]["cost_analysis_per_device"].get("flops")
    a1 = rows[0]["advi_cost_analysis_per_device"].get("flops")
    for r in rows:
        fN = r["cost_analysis_per_device"].get("flops")
        if f1 and fN:
            r["flops_fraction_of_1dev"] = round(fN / f1, 4)
        aN = r["advi_cost_analysis_per_device"].get("flops")
        if a1 and aN:
            r["advi_flops_fraction_of_1dev"] = round(aN / a1, 4)

    out = {
        "setup": {
            "kind": (
                "virtual CPU mesh, 1 physical core. PRIMARY artifact: "
                "per-device COMPILED cost (HLO collective counts + XLA "
                "cost_analysis) — what a real N-chip mesh would run. "
                "Wall-clock rows are a smoke check only: N virtual devices "
                "share one core, so wall-time 'efficiency' measures "
                "fixed-overhead amortization, not scaling."
            ),
            "total_chains": total_chains,
            "dim": dim,
            "n_warmup": n_warmup,
            "n_samples": n_samples,
            "total_particles": total_particles,
        },
        "rows": rows,
    }
    with open(_os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "SCALING_r05.json"), "w") as f:
        json.dump(out, f, indent=1)

    print("| devices | per-device flops (frac of 1-dev) | all-reduce | all-gather | NUTS wall (s) | SMC wall (s) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        c = r["collectives"]
        print(
            f"| {r['n_dev']} | {r['cost_analysis_per_device'].get('flops', 0):.3g}"
            f" ({r.get('flops_fraction_of_1dev', '—')}) | {c['all-reduce']} |"
            f" {c['all-gather']} | {r['t_nuts_s']} | {r['t_smc_s']} |"
        )


if __name__ == "__main__":
    main()
