"""NUTS samples/s/chip — the north-star metric BASELINE.md names that no
prior round measured (VERDICT r4 item 3): slope-timed END-TO-END
`Model.sample` throughput on the bench model (dim=151 hierarchical
mixed-support, bench.py's _model), warmup excluded by the slope, at
B in {8, 64, 1024} chains, with the fused one-pass value-and-grad kernel
ON vs OFF (kernels.enable toggles the trace; 'off' is the composed
transposed jnp path — the same sampler, no Pallas).

Protocol: per configuration, run the IDENTICAL key at two sampling
lengths (N1, N2); per-draw wall time = (t2 - t1)/(N2 - N1) — compile,
handshake, warmup, and constrain costs cancel in the slope. Reported:
draws/s/chip (B * draws/s) and min-ESS/s (bulk ESS minimum over
dimensions on the N2 run / its sampling wall time) — the honest "how much
posterior per second" number.

Run in background mode:  python tools/nuts_throughput.py
Writes NUTS_THROUGHPUT.json at the repo root (bench.py regresses the B=64
row each round).
"""
import json
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists, kernels
from tpu_bijectors.diagnostics import ess_bulk
from tpu_bijectors.infer import Model

K = 16
N_WARMUP = 300
N1, N2 = 64, 256


def model():
    return Model(
        priors=dists.NamedProduct.of(
            mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
            sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
            w=dists.Dirichlet(jnp.ones(K)),
            corr=dists.LKJ(K, 2.0),
        ),
        loglik=None,
    )


def timed_run(m, B, n, key):
    t0 = time.perf_counter()
    samples, state, stats = m.sample(
        key,
        n_chains=B,
        n_warmup=N_WARMUP,
        n_samples=n,
        kernel="nuts_batched_t",
        constrained=False,
        max_depth=8,
    )
    s = float(jnp.sum(samples))  # force completion through the transfer
    assert s == s, "NaN in samples"
    return time.perf_counter() - t0, samples, stats


def bench_config(B, kernels_on):
    kernels.enable(kernels_on)
    m = model()
    key = jax.random.PRNGKey(7)
    t1a, _, _ = timed_run(m, B, N1, key)
    t2a, samples, stats = timed_run(m, B, N2, key)
    # one repeat pair for a median-of-2 slope (each pair already averages
    # N2-N1 = 192 draws of signal)
    t1b, _, _ = timed_run(m, B, N1, key)
    t2b, _, _ = timed_run(m, B, N2, key)
    per_draw = min((t2a - t1a), (t2b - t1b)) / (N2 - N1)
    draws_per_s = B / per_draw
    ess = np.asarray(ess_bulk(np.asarray(samples)))
    min_ess_per_s = float(ess.min() / (N2 * per_draw))
    div = float(np.asarray(stats.diverging, float).mean())
    out = {
        "per_draw_ms": round(per_draw * 1e3, 3),
        "draws_per_s_chip": round(draws_per_s, 1),
        "min_ess_per_s": round(min_ess_per_s, 1),
        "divergence_rate": round(div, 4),
    }
    kernels.enable(True)
    return out


def main():
    dim = model().dim()
    print(f"dim={dim}", flush=True)
    t0 = time.perf_counter()
    # handshake on a tiny run
    timed_run(model(), 8, 2, jax.random.PRNGKey(0))
    print(f"handshake {time.perf_counter() - t0:.1f}s", flush=True)

    out = {
        "model": f"bench hierarchical (dim={dim}, LKJ K={K})",
        "n_warmup": N_WARMUP,
        "slope_lengths": [N1, N2],
        "kernel": "nuts_batched_t (max_depth=8)",
        "configs": {},
    }
    for B in (8, 64, 1024):
        for kernels_on in (True, False):
            tag = f"B{B}_" + ("fusedvg" if kernels_on else "jnp")
            out["configs"][tag] = bench_config(B, kernels_on)
            print(tag, out["configs"][tag], flush=True)
    for B in (8, 64, 1024):
        a = out["configs"][f"B{B}_fusedvg"]["draws_per_s_chip"]
        b = out["configs"][f"B{B}_jnp"]["draws_per_s_chip"]
        out["configs"][f"B{B}_fusedvg"]["vs_jnp"] = round(a / b, 2)
    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "NUTS_THROUGHPUT.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
