"""Slope-timed probe of the GRADIENT hot path on the real chip: the batched
NUTS leapfrog evaluates jax.vjp(linked_logdensity) (infer/hmc_batched.py:34),
so the Pallas primal + closed-form linear tangents must win there too.

Compares value-and-grad per-iteration time with kernels enabled vs disabled
(the disabled path = the pre-closed-form behavior, where differentiation
routed both primal and tangent through the jnp implementations), and checks
on-device agreement of the two gradients at a dispatch-eligible batch.

Usage: python tools/grad_probe.py [leaf ...]  (default: w corr lkjchol all)
Run in background mode — the first transfer costs 150-500 s (CLAUDE.md).
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tpu_bijectors import dists, kernels
from tpu_bijectors.vectorize import unconstrain

BATCH = 131072


def build(name):
    parts = dict(
        mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(16)),
        corr=dists.LKJ(16, 2.0),
        lkjchol=dists.LKJCholesky(16, 2.0),
    )
    if name == "all":
        return dists.NamedProduct.of(
            mu=parts["mu"], sigma=parts["sigma"], w=parts["w"], corr=parts["corr"]
        )
    return parts[name]


def make(d, n, batch=BATCH):
    u = unconstrain(d)
    dim = u.linked_vec_length

    @jax.jit
    def many(v, d):
        def lg(q):
            lp, vjp = jax.vjp(lambda q: unconstrain(d).linked_logdensity(q), q)
            (g,) = vjp(jnp.ones_like(lp))
            return lp, g

        def body(carry, _):
            lp, g = lg(v + 1e-3 * jnp.tanh(0.01 * carry))
            return g, lp

        g, _ = lax.scan(body, jnp.zeros((batch, dim), v.dtype), None, length=n)
        return jnp.sum(g)

    v = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (batch, dim))
    return many, v, dim


def t2f(prog, v, d):
    t0 = time.perf_counter()
    s = float(prog(v, d))
    assert s == s, "NaN"
    return time.perf_counter() - t0


def slope(d, label):
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
    pers = sorted((t2f(pb, v, d) - t2f(pa, v, d)) / (n2 - n1) for _ in range(3))
    per = pers[1]
    print(
        "%8s dim=%3d %8s per-iter=%9.1f us  reps=%s"
        % (label[0], dim, label[1], per * 1e6, [round(p * 1e6, 1) for p in pers]),
        flush=True,
    )
    return per


def check_grads(d, name):
    """On-device: kernel-path grad vs jnp-path grad at a dispatch batch."""
    u = unconstrain(d)
    dim = u.linked_vec_length
    v = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (2048, dim))

    def make_g():
        # fresh function object per toggle: jit caches per function id, so a
        # shared jitted g would silently reuse the kernels-on trace after
        # kernels.enable(False) (the flag is read at trace time)
        @jax.jit
        def g(v, d):
            return jax.vjp(lambda q: unconstrain(d).linked_logdensity(q), v)[1](
                jnp.ones((v.shape[0],), v.dtype)
            )[0]

        return g

    kernels.enable(True)
    g_on = jax.device_get(make_g()(v, d))
    kernels.enable(False)
    g_off = jax.device_get(make_g()(v, d))
    kernels.enable(True)
    import numpy as np

    denom = np.maximum(np.abs(g_off), 1e-3)
    rel = np.max(np.abs(g_on - g_off) / denom)
    print("%8s grad agreement: max rel diff %.2e" % (name, rel), flush=True)


def main():
    names = sys.argv[1:] or ["w", "corr", "lkjchol", "all"]
    d0 = build(names[0])
    m, v, _ = make(d0, 1)
    t0 = time.perf_counter()
    float(m(v, d0))
    print("handshake %.1fs" % (time.perf_counter() - t0), flush=True)

    for name in names:
        d = build(name)
        check_grads(d, name)
        kernels.enable(True)
        slope(d, (name, "fused"))
        kernels.enable(False)
        slope(d, (name, "jnp"))
        kernels.enable(True)


if __name__ == "__main__":
    main()
