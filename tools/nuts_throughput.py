"""NUTS samples/s/chip — the north-star metric BASELINE.md names that no
prior round measured (VERDICT r4 item 3): slope-timed END-TO-END NUTS
throughput on the bench model (dim=151 hierarchical mixed-support,
bench.py's _model), warmup excluded by the slope, at B in {8, 64, 1024}
chains, with the fused one-pass value-and-grad kernel ON vs OFF
(kernels.enable toggles the trace; 'off' is the composed transposed jnp
path — the same sampler, no Pallas).

Protocol (learned the hard way on this tunnel): each (B, kernels, n)
program is jitted ONCE and called once to compile + once to warm, then
timed over `reps` repeat calls (median) — Model.sample would re-trace per
call and the jnp path's compile-time variance exceeds the signal
(negative slopes observed). per-draw = (t(N2) - t(N1))/(N2 - N1): the
warmup phase and all per-call constants cancel in the slope. Reported:
draws/s/chip and min-ESS/s (bulk ESS minimum over dimensions on the N2
run / its sampling wall time).

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
from tpu_bijectors.infer.sampler import warmup_and_sample

K = 16
N_WARMUP = 300
N1, N2 = 64, 256
MAX_DEPTH = 8


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


def build(m, B, n, kernels_on):
    """One jitted (key, q0) -> samples program; kernels toggled at TRACE
    time (the body runs while tracing), so each program is self-contained."""
    logp = m.batched_logdensity_t_fn()

    def run(key, q0):
        if not kernels_on:
            kernels.enable(False)
        try:
            samples, state, stats = warmup_and_sample(
                logp, key, q0,
                n_warmup=N_WARMUP, n_samples=n,
                kernel="nuts_batched_t", max_depth=MAX_DEPTH,
            )
        finally:
            if not kernels_on:
                kernels.enable(True)
        return samples, stats

    return jax.jit(run)


def timed(prog, key, q0, reps=3):
    """Median wall time of `reps` cached executions (first two calls —
    compile + warm — excluded); sync via a forced scalar transfer."""
    out = None

    def once():
        nonlocal out
        t0 = time.perf_counter()
        out = prog(key, q0)
        s = float(jnp.sum(out[0]))
        assert s == s, "NaN in samples"
        return time.perf_counter() - t0

    once()  # compile
    once()  # warm
    ts = sorted(once() for _ in range(reps))
    return ts[reps // 2], out


def bench_config(m, B, kernels_on, key):
    q0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, m.dim()))
    p1 = build(m, B, N1, kernels_on)
    p2 = build(m, B, N2, kernels_on)
    t1, _ = timed(p1, key, q0)
    t2, out2 = timed(p2, key, q0)
    per_draw = (t2 - t1) / (N2 - N1)
    samples, stats = out2
    ess = np.asarray(ess_bulk(np.asarray(samples)))
    div = float(np.asarray(stats.diverging, float).mean())
    return {
        "per_draw_ms": round(per_draw * 1e3, 3),
        "draws_per_s_chip": round(B / per_draw, 1),
        "min_ess_per_s": round(float(ess.min() / (N2 * per_draw)), 1),
        "divergence_rate": round(div, 4),
        "t_n1_s": round(t1, 3),
        "t_n2_s": round(t2, 3),
    }


def main():
    m = model()
    print(f"dim={m.dim()}", flush=True)
    t0 = time.perf_counter()
    # handshake on a tiny program
    timed(build(m, 8, 2, True), jax.random.PRNGKey(0),
          0.3 * jax.random.normal(jax.random.PRNGKey(1), (8, m.dim())), reps=1)
    print(f"handshake {time.perf_counter() - t0:.1f}s", flush=True)

    out = {
        "model": f"bench hierarchical (dim={m.dim()}, LKJ K={K})",
        "n_warmup": N_WARMUP,
        "slope_lengths": [N1, N2],
        "kernel": f"nuts_batched_t (max_depth={MAX_DEPTH})",
        "configs": {},
    }
    key = jax.random.PRNGKey(7)
    for B in (8, 64, 1024):
        for kernels_on in (True, False):
            tag = f"B{B}_" + ("fusedvg" if kernels_on else "jnp")
            out["configs"][tag] = bench_config(m, B, kernels_on, key)
            print(tag, out["configs"][tag], flush=True)
    for B in (8, 64, 1024):
        a = out["configs"][f"B{B}_fusedvg"]["draws_per_s_chip"]
        b = out["configs"][f"B{B}_jnp"]["draws_per_s_chip"]
        if b > 0:
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
