"""Diagnose the bench hot path, one variant per FRESH process.

Usage: python tools/bench_diag.py {fused|fused_nopallas|naive|fused_x|logp_parts}

Prints one line: variant, median seconds/iter, evals/s.
Measurement rules per memory (fresh process, warmup>=10, blocks, no
host<->device transfer before timing).
"""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp


def _time(fn, *args, n_iter=200, warmup=20, blocks=5):
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
    variant = sys.argv[1]
    from tpu_bijectors import dists, kernels
    from tpu_bijectors.vectorize import unconstrain

    if "nopallas" in variant:
        kernels.enable(False)

    comp = sys.argv[2] if len(sys.argv) > 2 else "all"
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    parts = dict(
        mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(16)),
        corr=dists.LKJ(K, 2.0),
    )
    if comp == "all":
        priors = dists.NamedProduct.of(**parts)
    else:
        priors = parts[comp]
    batch = 131072
    dim = unconstrain(priors).linked_vec_length
    key = jax.random.PRNGKey(0)
    v = 0.5 * jax.random.normal(key, (batch, dim))

    if variant.startswith("fused"):

        @jax.jit
        def f(v, priors):
            return unconstrain(priors).linked_logdensity(v)

        t = _time(f, v, priors)
    elif variant == "naive":

        @jax.jit
        def f(v, priors):
            un = unconstrain(priors)

            def naive_one(vi):
                x, _ = un.from_linked_vec(vi)
                _, ld = un.to_linked_vec(x)
                return priors.logpdf(x) - ld

            return jax.vmap(naive_one)(v)

        t = _time(f, v, priors, n_iter=50)
    else:
        raise SystemExit("unknown variant " + variant)

    print(
        "%s: %.1f us/iter  %.3fB evals/s" % (variant, t * 1e6, batch / t / 1e9),
        flush=True,
    )


if __name__ == "__main__":
    main()
