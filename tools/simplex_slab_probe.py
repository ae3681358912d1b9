"""A/B the TELESCOPED Dirichlet slab entry (fused_plan._SIMPLEX_SLAB)
against the round-3 per-row loop entry, on the real chip, on the bench
model (8 Normal + 8 LogNormal + Dirichlet(16) + LKJ(16), B=131072).

The loop entry runs ~75 single-sublane (1, W) transcendentals per grid
block (15 sigmoid + ~60 log); the telescoped form (see the Dirichlet
branch of fused_plan._leaf_entry for the derivation) folds the whole
Dirichlet linked density into the slab engine's ONE shared block softplus
pass. This probe decides the default and is the VERDICT r3 item-5
artifact: either the slab form wins (-> BENCH should approach the ~100 us
HBM floor) or the loser is documented and 192 us stands as the floor.

Protocol = bench.py's (slope-timed scans serialized through a MODEL
PARAMETER — the state stays a loop-invariant read-only buffer).

Run in background mode:  python tools/simplex_slab_probe.py
"""
import json
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tpu_bijectors import dists
from tpu_bijectors.vectorize import fused_plan, unconstrain
from tpu_bijectors.vectorize.fused_kernel import _mega_diffable

BATCH = 131072
K = 16


def model(loc=0.0):
    return dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(loc, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(K)),
        corr=dists.LKJ(K, 2.0),
    )


def prog(n, grad: bool):
    @jax.jit
    def many(vT):
        def body(carry, _):
            loc = 1e-3 * jnp.tanh(0.01 * jnp.mean(carry))
            u = unconstrain(model(loc))
            if grad:
                lp, g = jax.value_and_grad(
                    lambda v: jnp.sum(_mega_diffable(u, v))
                )(vT)
                return lp * 1e-12 + g[0, :] * 1e-9 + carry * 0.0, None
            return _mega_diffable(u, vT), None

        lp, _ = lax.scan(body, jnp.zeros((BATCH,), vT.dtype), None, length=n)
        return jnp.sum(lp)

    return many


def t2f(p, vT):
    t0 = time.perf_counter()
    s = float(p(vT))
    assert s == s
    return time.perf_counter() - t0


def slope(vT, grad, n1=16, n2=400, reps=3):
    pa, pb = prog(n1, grad), prog(n2, grad)
    t2f(pa, vT)
    t2f(pb, vT)
    pers = sorted((t2f(pb, vT) - t2f(pa, vT)) / (n2 - n1) for _ in range(reps))
    return pers[reps // 2]


def main():
    dim = unconstrain(model()).linked_vec_length
    vT = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (dim, BATCH))
    t0 = time.perf_counter()
    float(jnp.sum(_mega_diffable(unconstrain(model()), vT[:, :128])))
    print(f"handshake {time.perf_counter() - t0:.1f}s", flush=True)

    out = {}
    vals = {}
    for flag in (False, True):
        fused_plan._SIMPLEX_SLAB = flag
        tag = "slab" if flag else "loop"
        vals[tag] = np.asarray(
            _mega_diffable(unconstrain(model()), vT[:, :4096]), np.float64
        )
        v_us = slope(vT, False) * 1e6
        vg_us = slope(vT, True, n2=256) * 1e6
        out[tag] = {"value_us": round(v_us, 1), "value_and_grad_us": round(vg_us, 1)}
        print(tag, out[tag], flush=True)
    d = np.abs(vals["slab"] - vals["loop"])
    out["max_abs_diff"] = float(d.max())
    out["max_rel_diff"] = float((d / np.abs(vals["loop"])).max())
    out["batch"] = BATCH
    out["evals_per_s_slab"] = round(BATCH / (out["slab"]["value_us"] * 1e-6))
    out["evals_per_s_loop"] = round(BATCH / (out["loop"]["value_us"] * 1e-6))
    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "SIMPLEX_SLAB_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
