"""Slope-timed mega-kernel decomposition probe (round 3 perf work).

Times the whole-model fused kernel's value / value-and-grad per iteration
at B=131072 for models that isolate each cost component:

  bench     — 8 Normal + 8 LogNormal + Dirichlet(16) + LKJ(16)  (dim 151)
  slabonly  — 151 IID Normals (pure slab, no loop entries)      (dim 151)
  lkjonly   — LKJ(18)+normals pad                               (dim ~153)
  dironly   — Dirichlet(16) x 10 IID (loop-entry heavy)         (dim 150)
  floor     — 151 IID Normals, identity-quadratic only: the closest
              measurable thing to the pure HBM floor

Usage (background mode; first transfer 150-500 s):
  python tools/mega_probe.py [names...]
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

B = 131072


def build(name):
    if name in ("bench",):
        return dists.NamedProduct.of(
            mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
            sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
            w=dists.Dirichlet(jnp.ones(16)),
            corr=dists.LKJ(16, 2.0),
        )
    if name == "slabonly":
        return dists.NamedProduct.of(mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 151))
    if name == "floor":
        return dists.NamedProduct.of(mu=dists.IIDProduct(dists.Normal(0.0, 1.0), 151))
    if name == "lkjonly":
        return dists.NamedProduct.of(corr=dists.LKJ(18, 2.0))  # dim 153
    if name == "pdonly":
        # K=16 PD loop entry (VERDICT r2 Next #10): value + fused vjp
        return dists.NamedProduct.of(
            W=dists.Wishart(18.0, jnp.eye(16)),
            m=dists.IIDProduct(dists.Normal(0.0, 1.0), 15),
        )  # dim 136 + 15 = 151
    if name == "dironly":
        return dists.NamedProduct.of(
            w=dists.IIDProduct(dists.Dirichlet(jnp.ones(16)), 10)
        )  # dim 150
    raise KeyError(name)


def prog(n, grad: bool):
    from tpu_bijectors.vectorize.fused_kernel import _mega_diffable

    @jax.jit
    def many(vT, priors):
        u = unconstrain(priors)

        def body(carry, _):
            vv = vT + 1e-3 * jnp.tanh(0.01 * carry[None, :])
            if grad:
                lp, g = jax.value_and_grad(
                    lambda v: jnp.sum(_mega_diffable(u, v))
                )(vv)
                return lp + 1e-6 * g[0, :], None
            return _mega_diffable(u, vv), None

        lp, _ = lax.scan(body, jnp.zeros((B,), vT.dtype), None, length=n)
        return jnp.sum(lp)

    return many


def t2f(p, vT, priors):
    t0 = time.perf_counter()
    s = float(p(vT, priors))
    assert s == s, "NaN"
    return time.perf_counter() - t0


def slope(vT, priors, grad, reps=3):
    p16, p400 = prog(16, grad), prog(400, grad)
    t2f(p16, vT, priors)
    t2f(p400, vT, priors)
    pers = sorted(
        (t2f(p400, vT, priors) - t2f(p16, vT, priors)) / 384.0
        for _ in range(reps)
    )
    return pers[reps // 2], pers


def main():
    names = sys.argv[1:] or [
        "floor", "slabonly", "bench", "dironly", "lkjonly", "pdonly",
    ]
    d0 = build(names[0])
    u0 = unconstrain(d0)
    v0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (u0.linked_vec_length, B))
    t0 = time.perf_counter()
    t2f(prog(1, False), v0, d0)
    print("handshake %.1fs" % (time.perf_counter() - t0), flush=True)

    for name in names:
        d = build(name)
        u = unconstrain(d)
        dim = u.linked_vec_length
        vT = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (dim, B))
        for grad in (False, True):
            per, reps = slope(vT, d, grad)
            gbs = (dim + (dim if grad else 0) + 1) * B * 4 / per / 1e9
            print(
                "%8s dim=%3d %-5s per-iter=%8.1f us  (%5.0f GB/s)  reps=%s"
                % (
                    name,
                    dim,
                    "v+g" if grad else "v",
                    per * 1e6,
                    gbs,
                    [round(p * 1e6, 1) for p in reps],
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
