"""Benchmark: batched transform+logdetJ evals/s/chip on the real device.

Measures the fused `linked_logdensity` hot path (what every NUTS leapfrog
step evaluates) for a hierarchical mixed-support model
(location + positive scales + simplex weights + LKJ(16) correlation),
batched at 131072.

The fused path never decomposes a matrix: the LKJ density is evaluated from
the Cholesky factor diagonal the inverse link already computes
(factor-aware fusion, reference src/bijectors/corr.jl:56-79 semantics).
The naive baseline is the honest unfused alternative a user without the
fused API would write: per-sample from_linked_vec, then logpdf(x) (which
must re-Cholesky the correlation matrix) minus a separately recomputed
forward log-det, vmapped.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": R}

The reference publishes no throughput numbers (BASELINE.md), so
`vs_baseline` is the fusion speedup t_naive / t_fused.

Measurement design (see CLAUDE.md + memory tpu-benchmark-gotchas; each rule
exists because the axon tunnel violates the usual assumptions):
- TIME-TO-RESULT: each sample queues N dispatches WITHOUT intermediate
  blocking and then forces completion by transferring a 4-byte scalar
  reduction of the LAST output. Device streams execute in submission
  order, so the transfer cannot return before all N programs ran — this is
  robust even where block_until_ready returns early.
- One variant per FRESH SUBPROCESS: any host<->device transfer flips the
  tunnel into a ~0.6 ms/dispatch mode, so the final forced transfer would
  pollute later measurements in the same process.
- Variants are INTERLEAVED (f,n,f,n,...) across subprocesses and the ratio
  is the median of adjacent pairs: machine-level latency drift (2-5x on a
  minutes timescale) cancels.
- value = batch / min(fused times): the best sustained window is the
  device's actual throughput; drifted windows are tunnel state, not chip
  state. A ratio < 1.2 prints a loud stderr warning.
"""

import json
import os
import subprocess
import sys
import time

BATCH = 131072
K = 16  # LKJ dimension: naive logpdf must Cholesky a (BATCH,K,K) per eval
N_ITERS = 120
PAIRS = 3  # (fused, naive) subprocess pairs


def _model():
    import jax.numpy as jnp

    from tpu_bijectors import dists

    return dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(16)),
        corr=dists.LKJ(K, 2.0),
    )


def measure(variant: str) -> float:
    """Seconds per eval-batch, time-to-result over N_ITERS dispatches."""
    import jax
    import jax.numpy as jnp

    from tpu_bijectors.vectorize import unconstrain

    priors = _model()
    dim = unconstrain(priors).linked_vec_length
    # params ride as jit ARGUMENTS (closure capture forces a transfer at
    # trace time, which flips the tunnel into slow mode)
    if variant == "fused":

        @jax.jit
        def f(v, priors):
            return unconstrain(priors).linked_logdensity(v)

    else:

        @jax.jit
        def f(v, priors):
            un = unconstrain(priors)

            def naive_one(vi):
                x, _ = un.from_linked_vec(vi)
                _, ld = un.to_linked_vec(x)  # recompute logdet the long way
                return priors.logpdf(x) - ld

            return jax.vmap(naive_one)(v)

    @jax.jit
    def reduce(lp):
        return jnp.sum(lp)

    v = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (BATCH, dim))
    # compile + steady state (no transfers)
    for _ in range(10):
        out = f(v, priors)
    jax.block_until_ready(reduce(out))

    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = f(v, priors)
    s = float(reduce(out))  # forces completion of the whole queue
    t = (time.perf_counter() - t0) / N_ITERS
    assert s == s, "NaN logdensity in bench"
    return t


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--measure":
        print("RESULT %.9f" % measure(sys.argv[2]), flush=True)
        return

    here = os.path.abspath(__file__)
    times = {"fused": [], "naive": []}
    for _ in range(PAIRS):
        for variant in ("fused", "naive"):
            r = subprocess.run(
                [sys.executable, here, "--measure", variant],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(here),
                timeout=600,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(
                    "bench subprocess failed (%s):\n%s" % (variant, r.stderr[-2000:]),
                    file=sys.stderr,
                )
                raise SystemExit(1)
            times[variant].append(float(line[0].split()[1]))

    ratios = sorted(tn / tf for tf, tn in zip(times["fused"], times["naive"]))
    vs_baseline = ratios[len(ratios) // 2]
    t_best = min(times["fused"])
    evals_per_s = BATCH / t_best

    if vs_baseline < 1.2:
        print(
            "WARNING: fusion ratio %.3f < 1.2 — fused path not paying; "
            "times (us): fused=%s naive=%s"
            % (
                vs_baseline,
                [round(t * 1e6, 1) for t in times["fused"]],
                [round(t * 1e6, 1) for t in times["naive"]],
            ),
            file=sys.stderr,
        )

    dim = 8 + 8 + 15 + K * (K - 1) // 2
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
