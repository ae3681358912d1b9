"""Whole-model mega-kernel crossover at realistic chain counts
(VERDICT r2 Next #6): slope-timed value and value-and-grad of the bench
model's transposed density at B in {64..131072}, three ways:

  mega      — the whole-model fused Pallas kernel (forced: MIN_BATCH
              temporarily lowered so the plan dispatches at every B)
  composed  — per-leaf path, kernels still on (their own batch gates apply)
  jnp       — kernels disabled (pure XLA, batched, transposed)

The mega kernel's economics differ from the per-leaf kernels' (ONE HBM pass
vs ~4), so its crossover was never implied by the per-leaf table
(docs/kernels.md). The measured crossover sets the dispatch bands
`kernels.MEGA_OFF_BAND` / `kernels.MEGA_VG_OFF_BAND` used by
try_mega / try_mega_value_and_grad.

Run in background mode (first transfer 150-500 s):
  python tools/mega_crossover.py [--quick]
"""

import json
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tpu_bijectors import dists, kernels
from tpu_bijectors.vectorize import unconstrain


def model():
    return dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(16)),
        corr=dists.LKJ(16, 2.0),
    )


def step_fns():
    from tpu_bijectors.vectorize.fused_kernel import (
        _mega_diffable,
        mega_value_and_grad_t,
    )

    def mega(vT, priors):
        # force the fused kernel regardless of the dispatch band
        return _mega_diffable(unconstrain(priors), vT)

    def composed(vT, priors):
        return unconstrain(priors)._linked_logdensity_t_children(vT)

    def jnp_path(vT, priors):
        kernels.enable(False)
        try:
            return unconstrain(priors)._linked_logdensity_t_children(vT)
        finally:
            kernels.enable(True)

    def megavg(vT, priors):
        # the ONE-PASS fused value-and-grad kernel (leapfrog fast path);
        # only meaningful in grad mode — prog() consumes (lp, g) directly
        return mega_value_and_grad_t(unconstrain(priors), vT)

    return {"mega": mega, "composed": composed, "jnp": jnp_path, "megavg": megavg}


def prog(step, n, B, grad: bool, direct_vg: bool = False):
    @jax.jit
    def many(vT, priors):
        def body(carry, _):
            vv = vT + 1e-3 * jnp.tanh(0.01 * carry[None, :])
            if direct_vg:
                lp, g = step(vv, priors)
                return lp + 1e-6 * g[0, :], None
            if grad:
                lp, g = jax.value_and_grad(lambda v: jnp.sum(step(v, priors)))(vv)
                return lp + 1e-6 * g[0, :], None
            return step(vv, priors), None

        lp, _ = lax.scan(body, jnp.zeros((B,), vT.dtype), None, length=n)
        return jnp.sum(lp)

    return many


def t2f(p, vT, priors):
    t0 = time.perf_counter()
    s = float(p(vT, priors))
    assert s == s, "NaN"
    return time.perf_counter() - t0


def slope(step, vT, priors, B, grad, reps=3, direct_vg=False):
    # size the spread for >= ~60 ms of signal
    p4 = prog(step, 4, B, grad, direct_vg)
    p20 = prog(step, 20, B, grad, direct_vg)
    t2f(p4, vT, priors)
    t2f(p20, vT, priors)
    per0 = max((t2f(p20, vT, priors) - t2f(p4, vT, priors)) / 16, 2e-7)
    n1 = 8
    n2 = n1 + min(4096, max(64, int(0.06 / per0)))
    pa = prog(step, n1, B, grad, direct_vg)
    pb = prog(step, n2, B, grad, direct_vg)
    t2f(pa, vT, priors)
    t2f(pb, vT, priors)
    pers = sorted(
        (t2f(pb, vT, priors) - t2f(pa, vT, priors)) / (n2 - n1)
        for _ in range(reps)
    )
    return pers[reps // 2]


def main():
    quick = "--quick" in sys.argv
    priors = model()
    u = unconstrain(priors)
    dim = u.linked_vec_length
    fns = step_fns()

    # includes the chain counts real NUTS users run (4-64), per VERDICT r3
    # item 3, plus the mid band where the composed path was measured to win
    # (the upper re-entry point sets kernels.MEGA_OFF_BAND)
    # 65536 included since r5: MEGA_OFF_BAND's upper re-entry edge was
    # previously interpolated between 32768 and 131072 (ADVICE r4 #4) —
    # the edge is now pinned by measurement
    batches = [4, 16, 64, 128, 256, 512, 1024, 4096, 8192, 16384, 32768, 65536, 131072]
    if quick:
        batches = [4, 64, 1024, 16384]

    # handshake on a tiny program
    v0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (dim, 64))
    t0 = time.perf_counter()
    t2f(prog(fns["composed"], 1, 64, False), v0, priors)
    print("handshake %.1fs" % (time.perf_counter() - t0), flush=True)

    rows = []
    for B in batches:
        vT = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (dim, B))
        row = {"B": B}
        for grad in (False, True):
            tag = "vg" if grad else "v"
            for name, fn in fns.items():
                if name == "megavg" and not grad:
                    continue
                per = slope(fn, vT, priors, B, grad, direct_vg=name == "megavg")
                row[f"{name}_{tag}_us"] = round(per * 1e6, 2)
            row[f"mega_wins_{tag}"] = row[f"mega_{tag}_us"] <= min(
                row[f"composed_{tag}_us"], row[f"jnp_{tag}_us"]
            )
        row["megavg_wins"] = row["megavg_vg_us"] <= min(
            row["composed_vg_us"], row["jnp_vg_us"], row["mega_vg_us"]
        )
        rows.append(row)
        print(row, flush=True)

    # value-path crossover band: mega wins outside [lo, hi)
    cross = next(
        (r["B"] for r in rows if r["mega_wins_v"] and r["mega_wins_vg"]), None
    )
    out = {"dim": dim, "rows": rows, "crossover_B": cross}
    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "MEGA_CROSSOVER.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("crossover_B =", cross, "->", path, flush=True)


if __name__ == "__main__":
    main()
