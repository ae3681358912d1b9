"""Per-element VPU/EUP cost decomposition of the mega kernel's slab math,
measured with raw Pallas kernels on the real chip (round 4 floor push).

The bench model's value path sits at ~180-195 us vs the ~100 us HBM floor
(docs/kernels.md). The slab engine's remaining per-element work is
  cheap pass:  mask-select, D = V - m, |D|, sign-select(c3p/c3n), fma
  sp band:     softplus(sa*|D|) = log1p(exp(.)), weight fma
over ~135 of 151 rows at B=131072. This probe times raw kernels that
isolate each component so the next optimization is chosen by measurement,
not guess:

  floor      read (151, B), fused-multiply-add per element, one (1, B) out
             -> the HBM + loop floor
  alu8       floor + 8 extra ALU ops/elem (abs/select/fma chain) -> VPU rate
  exp1       floor + exp per elem                  -> EUP exp cost
  log1       floor + log per elem                  -> EUP log cost
  sp         floor + log1p(exp(-2|V|)) per elem    -> current softplus cost
  sp_poly    floor + exp + degree-7 Horner log1p   -> poly replacement
  sig        floor + logistic per elem             -> current sigmoid cost
  spsig      sp + logistic, independent            -> current vg-kernel pair
  spsig_sh   ONE exp + poly log1p + e/(1+e)        -> shared-exp pair

Protocol = bench.py's (slope-timed scans serialized through a coefficient
OPERAND; the state buffer stays loop-invariant; forced float() sync).

Run in background mode:  python tools/transcend_probe.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 131072
DIM = 151
W = 2048  # = the real mega kernel's block width at this shape
# (kernels/layout.BLOCK_LANES; at W=128 the 1024-step grid overhead
# dominated: measured floor 307 us vs the real kernel's 181 us total)

# degree-7 minimax-ish poly for log1p(z) on z in [0, 1] (Chebyshev fit;
# timing-representative — exactness is checked before any adoption)
_zf = np.linspace(0, 1, 4001)
_P = np.polyfit(_zf, np.log1p(_zf), 7)  # highest-first for Horner


def _poly_log1p(z):
    acc = jnp.full_like(z, float(_P[0]))
    for c in _P[1:]:
        acc = acc * z + float(c)
    return acc


def make_kernel(variant):
    if variant == "floor_g":
        # vg-kernel floor: read the block, write the (1, W) lp AND a full
        # (DIM, W) grad block — the one-pass value-and-grad kernel's HBM
        # shape (read 151xB + write 151xB + write 1xB)
        def gkernel(v_ref, c_ref, o_ref, g_ref):
            X = v_ref[:, :] * c_ref[0, :].reshape(1, W)
            o_ref[:, :] = jnp.sum(X * X, axis=0).reshape(1, W)
            g_ref[:, :] = X + 1.0

        def grun(vT, c):
            out, _ = pl.pallas_call(
                gkernel,
                out_shape=(
                    jax.ShapeDtypeStruct((1, B), jnp.float32),
                    jax.ShapeDtypeStruct((DIM, B), jnp.float32),
                ),
                grid=(B // W,),
                in_specs=[
                    pl.BlockSpec((DIM, W), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((DIM, W), lambda i: (0, i), memory_space=pltpu.VMEM),
                ),
            )(vT, c)
            return out

        return grun

    def kernel(v_ref, c_ref, o_ref):
        V = v_ref[:, :]
        c = c_ref[0, :].reshape(1, W)
        X = V * c
        acc = jnp.sum(X * X, axis=0).reshape(1, W)
        if variant == "floor":
            pass
        elif variant == "alu8":
            U = jnp.abs(X)
            t = jnp.where(X >= 0, U * 1.25, U * 0.75)
            t = t * t + U
            t = jnp.where(t > 1.0, t - 1.0, t)
            acc = acc + jnp.sum(t * 0.5 + U, axis=0).reshape(1, W)
        elif variant == "exp1":
            acc = acc + jnp.sum(jnp.exp(-jnp.abs(X)), axis=0).reshape(1, W)
        elif variant == "log1":
            acc = acc + jnp.sum(jnp.log(1.5 + jnp.abs(X)), axis=0).reshape(1, W)
        elif variant == "sp":
            acc = acc + jnp.sum(
                jnp.log1p(jnp.exp(-2.0 * jnp.abs(X))), axis=0
            ).reshape(1, W)
        elif variant == "sp_poly":
            e = jnp.exp(-2.0 * jnp.abs(X))
            acc = acc + jnp.sum(_poly_log1p(e), axis=0).reshape(1, W)
        elif variant == "sig":
            acc = acc + jnp.sum(
                jax.nn.sigmoid(-2.0 * jnp.abs(X)), axis=0
            ).reshape(1, W)
        elif variant == "spsig":
            a = -2.0 * jnp.abs(X)
            acc = acc + jnp.sum(
                jnp.log1p(jnp.exp(a)) + jax.nn.sigmoid(a), axis=0
            ).reshape(1, W)
        elif variant == "spsig_sh":
            e = jnp.exp(-2.0 * jnp.abs(X))
            acc = acc + jnp.sum(
                _poly_log1p(e) + e / (1.0 + e), axis=0
            ).reshape(1, W)
        elif variant == "spsig_sh2":
            # shared exp, HARDWARE log1p, sigmoid as e/(1+e)
            e = jnp.exp(-2.0 * jnp.abs(X))
            acc = acc + jnp.sum(
                jnp.log1p(e) + e / (1.0 + e), axis=0
            ).reshape(1, W)
        elif variant == "sel4":
            # 4 where-selects/elem: the zguard / ownership-mask cost unit
            t = jnp.where(X > 0.0, X, 0.0)
            t = jnp.where(X > 1.0, t, X * 0.5)
            t = jnp.where(X < -1.0, t, X * 0.25)
            t = jnp.where(X != 0.0, t, 0.0)
            acc = acc + jnp.sum(t, axis=0).reshape(1, W)
        elif variant == "band16":
            # full quad math but only on a 16-row band: what per-key
            # banding buys vs paying it on all DIM rows
            Xs = X[:16, :]
            U = jnp.abs(Xs)
            t = jnp.where(Xs >= 0, U * 1.25, U * 0.75)
            t = t * t + U
            t = jnp.where(t > 1.0, t - 1.0, t)
            acc = acc + jnp.sum(t * 0.5 + U, axis=0).reshape(1, W)
        else:
            raise KeyError(variant)
        o_ref[:, :] = acc

    def run(vT, c):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
            grid=(B // W,),
            in_specs=[
                pl.BlockSpec((DIM, W), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, W), lambda i: (0, i), memory_space=pltpu.VMEM),
        )(vT, c)

    return run


def prog(variant, n):
    run = make_kernel(variant)

    @jax.jit
    def many(vT):
        def body(carry, _):
            c = 1.0 + 1e-3 * jnp.tanh(0.01 * carry[:1, :])  # (1, W) serializer
            out = run(vT, jnp.broadcast_to(c[:, :W], (1, W)))
            return jnp.broadcast_to(out[:, :W], carry.shape), None

        c0 = jnp.ones((1, W), jnp.float32)
        lp, _ = lax.scan(body, c0, None, length=n)
        return jnp.sum(lp)

    return many


def t2f(p, vT):
    t0 = time.perf_counter()
    s = float(p(vT))
    assert s == s
    return time.perf_counter() - t0


def slope(variant, vT, n1=16, n2=400, reps=3):
    pa, pb = prog(variant, n1), prog(variant, n2)
    t2f(pa, vT)
    t2f(pb, vT)
    pers = sorted((t2f(pb, vT) - t2f(pa, vT)) / (n2 - n1) for _ in range(reps))
    return pers[reps // 2]


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    vT = jax.random.normal(key, (DIM, B), jnp.float32)
    t0 = time.time()
    float(jnp.sum(vT))  # first-transfer handshake
    print(f"handshake {time.time()-t0:.0f}s")
    # poly accuracy (CPU-side arbitration, informational)
    z = np.linspace(0, 1, 100001)
    perr = float(np.abs(np.polyval(_P, z) - np.log1p(z)).max())
    out = {"poly_log1p_max_abs_err": perr}
    names = sys.argv[1:] or [
        "floor", "alu8", "exp1", "log1", "sp", "sp_poly", "sig",
        "spsig", "spsig_sh", "spsig_sh2", "sel4", "band16",
    ]
    for v in names:
        us = slope(v, vT) * 1e6
        out[v + "_us"] = round(us, 2)
        print(f"{v:10s} {us:8.2f} us")
    with open(_os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "TRANSCEND_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
