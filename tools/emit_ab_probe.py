"""A/B probe for the loop-entry transcendental forms of the whole-model
fused kernel (fused_emit._BLOCK_T): per-row transcendentals (no register
relayouts) vs gathered block transcendentals (8/8-sublane ops but Mosaic
relayouts on the gather + row slices). Slope-timed on the real chip; the
measured winner sets the default in fused_emit.py.

Usage (background mode; first transfer 150-500 s):
  python tools/emit_ab_probe.py [names...]
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
from tpu_bijectors.vectorize import fused_emit

B = 131072


def build(name):
    if name == "bench":
        return dists.NamedProduct.of(
            mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
            sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
            w=dists.Dirichlet(jnp.ones(16)),
            corr=dists.LKJ(16, 2.0),
        )
    if name == "dironly":
        return dists.NamedProduct.of(
            w=dists.IIDProduct(dists.Dirichlet(jnp.ones(16)), 10)
        )  # dim 150
    if name == "pdonly":
        return dists.NamedProduct.of(
            W=dists.Wishart(18.0, jnp.eye(16)),
            m=dists.IIDProduct(dists.Normal(0.0, 1.0), 15),
        )  # dim 151
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


def slope(vT, priors, grad, n1=16, n2=200, reps=3):
    pa, pb = prog(n1, grad), prog(n2, grad)
    t2f(pa, vT, priors)
    t2f(pb, vT, priors)
    pers = sorted(
        (t2f(pb, vT, priors) - t2f(pa, vT, priors)) / (n2 - n1)
        for _ in range(reps)
    )
    return pers[reps // 2]


def main():
    names = sys.argv[1:] or ["dironly", "pdonly", "bench"]
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
            row = {}
            for block in (False, True):
                fused_emit._BLOCK_T = block
                row["block" if block else "perrow"] = slope(vT, d, grad)
            fused_emit._BLOCK_T = False
            print(
                "%8s dim=%3d %-4s perrow=%8.1f us  block=%8.1f us  (block/perrow %.2fx)"
                % (
                    name,
                    dim,
                    "v+g" if grad else "v",
                    row["perrow"] * 1e6,
                    row["block"] * 1e6,
                    row["block"] / row["perrow"],
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
