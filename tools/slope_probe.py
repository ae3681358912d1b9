"""Slope-timed per-leaf probe on the real chip (the ONLY trustworthy timing:
see memory tpu-benchmark-gotchas — block_until_ready does not wait on this
tunnel; time-to-float of n-iteration scans, slope over n, cancels transfer
and host overheads).

Usage: python tools/slope_probe.py [leaf ...]   (default: w corr all)
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tpu_bijectors import dists
from tpu_bijectors.vectorize import unconstrain

BATCH = 131072


def build(name):
    parts = dict(
        mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(16)),
        corr=dists.LKJ(16, 2.0),
        lkjchol=dists.LKJCholesky(16, 2.0),
        wishart=dists.Wishart(18.0, jnp.eye(16)),
        invwishart=dists.InverseWishart(18.0, jnp.eye(16)),
    )
    if name == "all":
        return dists.NamedProduct.of(**parts)
    return parts[name]


def make(d, n):
    u = unconstrain(d)
    dim = u.linked_vec_length

    @jax.jit
    def many(v, d):
        def body(carry, _):
            lp = unconstrain(d).linked_logdensity(
                v + 1e-3 * jnp.tanh(0.01 * carry[:, None])
            )
            return lp, None

        lp, _ = lax.scan(body, jnp.zeros((BATCH,), v.dtype), None, length=n)
        return jnp.sum(lp)

    v = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (BATCH, dim))
    return many, v, dim


def t2f(prog, v, d):
    t0 = time.perf_counter()
    s = float(prog(v, d))
    assert s == s, "NaN"
    return time.perf_counter() - t0


def main():
    names = sys.argv[1:] or ["w", "corr", "all"]
    d0 = build(names[0])
    m, v, _ = make(d0, 1)
    t0 = time.perf_counter()
    float(m(v, d0))
    print("handshake %.1fs" % (time.perf_counter() - t0), flush=True)

    for name in names:
        d = build(name)
        # coarse estimate to size the n-spread so the slope signal is
        # >= ~60 ms (transfer noise is ~ +-1-3 ms)
        p8, v, dim = make(d, 8)
        p40, _, _ = make(d, 40)
        t2f(p8, v, d)
        t2f(p40, v, d)
        per0 = max((t2f(p40, v, d) - t2f(p8, v, d)) / 32, 1e-6)
        n1 = 16
        n2 = n1 + min(2048, max(64, int(0.06 / per0)))
        pa, _, _ = make(d, n1)
        pb, _, _ = make(d, n2)
        t2f(pa, v, d)
        t2f(pb, v, d)
        pers = []
        for _ in range(3):
            ta = t2f(pa, v, d)
            tb = t2f(pb, v, d)
            pers.append((tb - ta) / (n2 - n1))
        pers.sort()
        per = pers[1]
        print(
            "%6s dim=%3d n=(%d,%d) per-iter=%9.1f us  (%.0f GB/s)  rows/s=%.3fB  reps=%s"
            % (
                name,
                dim,
                n1,
                n2,
                per * 1e6,
                BATCH * dim * 4 / per / 1e9,
                BATCH / per / 1e9,
                [round(p * 1e6, 1) for p in pers],
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
