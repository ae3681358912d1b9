"""Scanned-measurement prototype: N_INNER logdensity evals inside ONE
dispatch (lax.scan with a carried perturbation so iterations can't be
elided), which amortizes the tunnel's volatile per-dispatch latency.

Usage: python tools/bench_diag2.py {fused|naive} [K] [n_inner]
"""

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax import lax


def main():
    variant = sys.argv[1]
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_inner = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from tpu_bijectors import dists
    from tpu_bijectors.vectorize import unconstrain

    priors = dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(16)),
        corr=dists.LKJ(K, 2.0),
    )
    batch = 131072
    dim = unconstrain(priors).linked_vec_length
    key = jax.random.PRNGKey(0)
    v = 0.5 * jax.random.normal(key, (batch, dim))

    if variant == "fused":

        def one(v, priors):
            return unconstrain(priors).linked_logdensity(v)

    elif variant == "naive":

        def one(v, priors):
            un = unconstrain(priors)

            def naive_one(vi):
                x, _ = un.from_linked_vec(vi)
                _, ld = un.to_linked_vec(x)
                return priors.logpdf(x) - ld

            return jax.vmap(naive_one)(v)

    else:
        raise SystemExit("unknown variant")

    @jax.jit
    def many(v, priors):
        def body(carry, _):
            lp = one(v + carry[:, None] * 1e-38, priors)
            return lp, None

        z = jnp.zeros((batch,), v.dtype)
        lp, _ = lax.scan(body, z, None, length=n_inner)
        return jnp.sum(lp)

    # warmup (compile + steady state)
    for _ in range(3):
        jax.block_until_ready(many(v, priors))
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(many(v, priors))
        times.append((time.perf_counter() - t0) / n_inner)
    times.sort()
    t = times[len(times) // 2]
    print(
        "%s K=%d: %.1f us/eval-batch  %.3fB evals/s (dim=%d, min=%.1f max=%.1f)"
        % (variant, K, t * 1e6, batch / t / 1e9, dim, times[0] * 1e6, times[-1] * 1e6),
        flush=True,
    )


if __name__ == "__main__":
    main()
