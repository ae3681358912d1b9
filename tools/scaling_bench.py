"""Strong-scaling harness on the virtual CPU mesh (VERDICT r1 Next #7).

Real pods are out of scope in this environment (one TPU chip via a tunnel),
so this measures the STRUCTURAL cost of the sharding machinery: the same
total work (fixed total chains/particles) is partitioned over 1/2/4/8
virtual CPU devices that all share ONE physical core. Ideal strong scaling
on shared hardware is flat wall time; efficiency_N = t_1 / t_N measures the
overhead the mesh partitioning + collectives add (>= 0.85 is the SURVEY §2.2
multi-host proxy target). Writes SCALING_r02.json and prints a markdown
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


def main():
    quick = "--quick" in sys.argv
    total_chains = 32 if quick else 256
    dim = 16
    n_warmup = 60 if quick else 100
    n_samples = 60 if quick else 100
    total_particles = 256 if quick else 4096

    rows = []
    for n_dev in (1, 2, 4, 8):
        t_nuts = time_nuts(n_dev, total_chains, dim, n_warmup, n_samples)
        t_smc = time_smc(n_dev, total_particles, dim, n_mutations=4)
        rows.append({"n_dev": n_dev, "t_nuts_s": round(t_nuts, 3), "t_smc_s": round(t_smc, 3)})
        print(f"n_dev={n_dev}: nuts {t_nuts:.3f}s smc {t_smc:.3f}s", file=sys.stderr)

    t1n, t1s = rows[0]["t_nuts_s"], rows[0]["t_smc_s"]
    for r in rows:
        r["eff_nuts"] = round(t1n / r["t_nuts_s"], 3)
        r["eff_smc"] = round(t1s / r["t_smc_s"], 3)

    out = {
        "setup": {
            "kind": "virtual CPU mesh, 1 physical core — structural overhead proxy",
            "total_chains": total_chains,
            "dim": dim,
            "n_warmup": n_warmup,
            "n_samples": n_samples,
            "total_particles": total_particles,
            "efficiency_def": "t_1 / t_N at FIXED total work (ideal 1.0)",
        },
        "rows": rows,
        "min_efficiency": min(min(r["eff_nuts"], r["eff_smc"]) for r in rows),
    }
    with open(_os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "SCALING_r02.json"), "w") as f:
        json.dump(out, f, indent=1)

    print("| devices | NUTS wall (s) | NUTS eff | SMC wall (s) | SMC eff |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_dev']} | {r['t_nuts_s']} | {r['eff_nuts']} | "
            f"{r['t_smc_s']} | {r['eff_smc']} |"
        )


if __name__ == "__main__":
    main()
