"""Benchmark: batched transform+logdetJ evals/s/chip (the BASELINE.json
headline metric) on the real device.

Measures the fused `from_linked_vec` + logpdf + logdetJ hot path (what every
NUTS leapfrog step evaluates) for the hierarchical mixed-support model
(config 5 shape: simplex + corr + positive + location), batched.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": R}

The reference publishes no throughput numbers (BASELINE.md), so
`vs_baseline` reports the speedup of the fused batched path over a naive
per-sample (vmap-of-scalar-composed, unfused logdet recomputation) variant
measured in the same run — the meaningful "did fusion/batching pay" ratio.
"""

import json
import time

import jax
import jax.numpy as jnp


def _model():
    from tpu_bijectors import dists
    from tpu_bijectors.infer import Model

    return Model(
        priors=dists.NamedProduct.of(
            mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
            sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
            w=dists.Dirichlet(jnp.ones(16)),
            corr=dists.LKJ(8, 2.0),
        ),
        loglik=None,
    )


def _time(fn, *args, n_iter=200, warmup=10, blocks=5):
    # generous warmup (first post-compile dispatches are slower through the
    # tunnel), then median over timing blocks to damp tunnel state noise
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    per = max(1, n_iter // blocks)
    times = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(per):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / per)
    times.sort()
    return times[len(times) // 2]


def main():
    model = _model()
    # Params ride as jit ARGUMENTS (standard JAX style): capturing device
    # arrays as closure constants forces a device->host transfer at trace
    # time, and on this tunnel any transfer drops every later dispatch into
    # a ~0.6 ms slow mode (12x). Arg-passing keeps dispatches fast.
    from tpu_bijectors.vectorize import unconstrain

    @jax.jit
    def logp(v, priors):
        return unconstrain(priors).linked_logdensity(v)

    batch = 131072  # large enough to amortize per-dispatch latency (serving regime)
    dim = model.dim()
    key = jax.random.PRNGKey(0)
    v = 0.5 * jax.random.normal(key, (batch, dim))

    # fused batched path
    t_fused = _time(logp, v, model.priors)
    evals_per_s = batch / t_fused

    # naive baseline: per-sample evaluation via vmap over a python-composed,
    # non-shared computation (separate from_linked + separate logdet pass)
    @jax.jit
    def naive(v, priors):
        un = unconstrain(priors)

        def naive_one(vi):
            x, _ = un.from_linked_vec(vi)
            _, ld = un.to_linked_vec(x)  # recompute logdet the long way round
            return priors.logpdf(x) - ld

        return jax.vmap(naive_one)(v)

    t_naive = _time(naive, v, model.priors, n_iter=50)

    out = {
        "metric": "hierarchical transform+logdetJ evals/s/chip (batch=%d, dim=%d)" % (batch, dim),
        "value": round(evals_per_s, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(t_naive / t_fused, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
