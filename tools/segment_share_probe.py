"""VERDICT r4 item 2 (kernel floor gap): two measurements in one artifact.

1. BAND MINIMALITY — the proposed "static row permutation grouping rows by
   weight key" lever presumes the per-term bands span rows they don't own.
   This probe computes, for the bench model, each weight-key group's span
   vs the rows its entries actually assign. Measured result: gap = 0 for
   every group (quad = the 16 Normal/LogNormal rows 0..16, absv/sp = the
   135 Dirichlet/LKJ rows 16..151, already contiguous) — a permutation
   cannot shrink any band, so the lever is a structural no-op on this
   model (and on any model whose same-family blocks are contiguous, which
   the vectorize layer's child-ordered layout produces by construction).

2. SEGMENT-SHARED MACHINERY A/B — the real redundancy was WITHIN the
   overlapping bands: absv and sp cover the same 135 rows and each
   recomputed the masked-V / D / |D| / sign passes (~6 us per serial VPU
   pass over a 135-row band, TRANSCEND_PROBE.json). Round 5 computes them
   once per disjoint segment (fused_base._slab_segment_val_par). This A/B
   toggles fused_base._SEGMENT_SHARE and slope-times value and
   value-and-grad on the bench model at B=131072, bench.py protocol.

Run in background mode:  python tools/segment_share_probe.py
Writes artifacts/SEGMENT_SHARE_AB.json.
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
from tpu_bijectors.utils import _eps
from tpu_bijectors.vectorize import unconstrain
from tpu_bijectors.vectorize import fused_base
from tpu_bijectors.vectorize.fused_base import _WEIGHT_OF
from tpu_bijectors.vectorize.fused_kernel import (
    _mega_diffable,
    _plan,
    mega_value_and_grad_t,
)

BATCH = 131072
K = 16


def model(loc=0.0):
    return dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(loc, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(K)),
        corr=dists.LKJ(K, 2.0),
    )


def band_minimality():
    u = unconstrain(model())
    plan = _plan(u, _eps(jnp.float32))
    key_group = {k: g for g, ks in _WEIGHT_OF.items() for k in ks}
    rows_of, spans = {}, {}
    for e in plan:
        if e.slab is None:
            continue
        gs = {
            key_group[k]
            for k in e.slab(jnp.float32).keys()
            if k in key_group
        }
        for g in gs:
            rows_of.setdefault(g, set()).update(range(e.row0, e.row0 + e.rows))
            lo, hi = spans.get(g, (10**9, 0))
            spans[g] = (min(lo, e.row0), max(hi, e.row0 + e.rows))
    out = {}
    for g in sorted(rows_of):
        lo, hi = spans[g]
        out[g] = {
            "span": [lo, hi],
            "span_rows": hi - lo,
            "owned_rows": len(rows_of[g]),
            "gap_rows": (hi - lo) - len(rows_of[g]),
        }
    return out


def prog(n, grad: bool):
    @jax.jit
    def many(vT):
        def body(carry, _):
            loc = 1e-3 * jnp.tanh(0.01 * jnp.mean(carry))
            u = unconstrain(model(loc))
            if grad:
                lp, g = mega_value_and_grad_t(u, vT)
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
    out = {"bands": band_minimality(), "batch": BATCH}
    print(json.dumps(out["bands"], indent=1), flush=True)

    dim = unconstrain(model()).linked_vec_length
    vT = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (dim, BATCH))
    t0 = time.perf_counter()
    float(jnp.sum(_mega_diffable(unconstrain(model()), vT[:, :128])))
    print(f"handshake {time.perf_counter() - t0:.1f}s", flush=True)

    vals = {}
    for flag in (False, True):
        fused_base._SEGMENT_SHARE = flag
        tag = "shared" if flag else "pergroup"
        vals[tag] = np.asarray(
            _mega_diffable(unconstrain(model()), vT[:, :4096]), np.float64
        )
        gv = mega_value_and_grad_t(unconstrain(model()), vT[:, :4096])
        vals[tag + "_vg"] = (
            np.asarray(gv[0], np.float64),
            np.asarray(gv[1], np.float64),
        )
        v_us = slope(vT, False) * 1e6
        vg_us = slope(vT, True, n2=256) * 1e6
        out[tag] = {
            "value_us": round(v_us, 1),
            "value_and_grad_us": round(vg_us, 1),
        }
        print(tag, out[tag], flush=True)
    fused_base._SEGMENT_SHARE = True
    out["value_max_abs_diff"] = float(
        np.abs(vals["shared"] - vals["pergroup"]).max()
    )
    out["vg_lp_max_abs_diff"] = float(
        np.abs(vals["shared_vg"][0] - vals["pergroup_vg"][0]).max()
    )
    out["vg_g_max_abs_diff"] = float(
        np.abs(vals["shared_vg"][1] - vals["pergroup_vg"][1]).max()
    )
    out["evals_per_s_shared"] = round(BATCH / (out["shared"]["value_us"] * 1e-6))
    out["evals_per_s_pergroup"] = round(
        BATCH / (out["pergroup"]["value_us"] * 1e-6)
    )
    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "artifacts",
        "SEGMENT_SHARE_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
