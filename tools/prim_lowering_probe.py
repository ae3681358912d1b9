"""Audit which whitelisted primitives actually LOWER through Mosaic on the
real TPU (VERDICT r3 item 1: `asinh` was whitelisted in
vectorize/fused_traced._SAFE_PRIMS but has no Pallas TPU lowering, so a
generic-traced model crashed at XLA compile time on chip,
TPUSWEEP_r03.txt:4).

For every candidate primitive this builds a one-op Pallas kernel on an
(8, 128) f32 block and AOT-compiles it for the attached TPU backend
(`jit(...).lower(...).compile()` — lowering is where Mosaic raises
NotImplementedError; no execution needed, so the probe is cheap). The
measured-lowerable set is written to PRIM_LOWERING.json at the repo root;
`fused_traced._SAFE_PRIMS` must stay a subset of it (enforced by
tests/test_fused_traced_safety.py).

Run from /root/repo:  python tools/prim_lowering_probe.py
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one entry per probed primitive: n_args, body(x[, y]) -> (8, 128) f32.
# Bodies are written so the PROBED primitive is the only interesting op;
# bool results ride through convert_element_type (probed separately).
_R = lambda z: jnp.broadcast_to(z, (8, 128)).astype(jnp.float32)

CASES = {
    # arithmetic
    "add": (2, lambda x, y: x + y),
    "sub": (2, lambda x, y: x - y),
    "mul": (2, lambda x, y: x * y),
    "div": (2, lambda x, y: x / y),
    "rem": (2, lambda x, y: lax.rem(x, y + 2.0)),
    "neg": (1, lambda x: -x),
    "abs": (1, lambda x: lax.abs(x)),
    "sign": (1, lambda x: lax.sign(x)),
    "max": (2, lambda x, y: lax.max(x, y)),
    "min": (2, lambda x, y: lax.min(x, y)),
    "pow": (2, lambda x, y: lax.pow(jnp.abs(x) + 1.0, y)),
    "integer_pow": (1, lambda x: lax.integer_pow(x, 3)),
    "square": (1, lambda x: lax.square(x)),
    "nextafter": (2, lambda x, y: lax.nextafter(x, y)),
    # transcendentals
    "exp": (1, lambda x: lax.exp(x)),
    "exp2": (1, lambda x: lax.exp2(x)),
    "log": (1, lambda x: lax.log(jnp.abs(x) + 1.0)),
    "log1p": (1, lambda x: lax.log1p(jnp.abs(x))),
    "expm1": (1, lambda x: lax.expm1(x)),
    "logistic": (1, lambda x: lax.logistic(x)),
    "tanh": (1, lambda x: lax.tanh(x)),
    "sqrt": (1, lambda x: lax.sqrt(jnp.abs(x))),
    "rsqrt": (1, lambda x: lax.rsqrt(jnp.abs(x) + 1.0)),
    "cbrt": (1, lambda x: lax.cbrt(x)),
    "sin": (1, lambda x: lax.sin(x)),
    "cos": (1, lambda x: lax.cos(x)),
    "tan": (1, lambda x: lax.tan(x)),
    "asin": (1, lambda x: lax.asin(lax.tanh(x))),
    "acos": (1, lambda x: lax.acos(lax.tanh(x))),
    "atan": (1, lambda x: lax.atan(x)),
    "atan2": (2, lambda x, y: lax.atan2(x, y + 2.0)),
    "sinh": (1, lambda x: lax.sinh(x)),
    "cosh": (1, lambda x: lax.cosh(x)),
    "asinh": (1, lambda x: lax.asinh(x)),
    "acosh": (1, lambda x: lax.acosh(jnp.abs(x) + 1.0)),
    "atanh": (1, lambda x: lax.atanh(lax.tanh(x))),
    # not currently whitelisted — probed for future decompositions
    "erf": (1, lambda x: lax.erf(x)),
    "erfc": (1, lambda x: lax.erfc(x)),
    "erf_inv": (1, lambda x: lax.erf_inv(lax.tanh(x))),
    "lgamma": (1, lambda x: lax.lgamma(jnp.abs(x) + 1.0)),
    "digamma": (1, lambda x: lax.digamma(jnp.abs(x) + 1.0)),
    # rounding / predicates
    "floor": (1, lambda x: lax.floor(x)),
    "ceil": (1, lambda x: lax.ceil(x)),
    "round": (1, lambda x: jnp.round(x)),
    "clamp": (1, lambda x: lax.clamp(-1.0, x, 1.0)),
    "is_finite": (1, lambda x: _R(jnp.where(lax.is_finite(x), 1.0, 0.0))),
    "gt": (2, lambda x, y: _R(jnp.where(x > y, 1.0, 0.0))),
    "lt": (2, lambda x, y: _R(jnp.where(x < y, 1.0, 0.0))),
    "ge": (2, lambda x, y: _R(jnp.where(x >= y, 1.0, 0.0))),
    "le": (2, lambda x, y: _R(jnp.where(x <= y, 1.0, 0.0))),
    "eq": (2, lambda x, y: _R(jnp.where(x == y, 1.0, 0.0))),
    "ne": (2, lambda x, y: _R(jnp.where(x != y, 1.0, 0.0))),
    "and": (2, lambda x, y: _R(jnp.where((x > 0) & (y > 0), 1.0, 0.0))),
    "or": (2, lambda x, y: _R(jnp.where((x > 0) | (y > 0), 1.0, 0.0))),
    "xor": (2, lambda x, y: _R(jnp.where((x > 0) ^ (y > 0), 1.0, 0.0))),
    "not": (1, lambda x: _R(jnp.where(~(x > 0), 1.0, 0.0))),
    "select_n": (2, lambda x, y: jnp.where(x > 0, x, y)),
    # structural / data movement
    # add_any: AD's accumulation add — appears in every derivative jaxpr
    "add_any": (2, lambda x, y: jax.jvp(lambda a, b: a * b, (x, y), (y, x))[1]),
    "split": (1, lambda x: jnp.concatenate(jnp.split(x, 2, axis=1), axis=1)),
    # the int32-iota + convert composition fused_decomp._d_iota emits
    "iota_i32": (1, lambda x: x + lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)),
    "convert_element_type": (1, lambda x: x.astype(jnp.int32).astype(jnp.float32)),
    "broadcast_in_dim": (1, lambda x: x + jnp.float32(1.0)),
    "reshape": (1, lambda x: x.reshape(4, 256).reshape(8, 128)),
    "squeeze": (1, lambda x: x[0:1, :].squeeze(0)[None, :] + x),
    "concatenate": (1, lambda x: jnp.concatenate([x[:4], x[4:]], axis=0)),
    "slice": (1, lambda x: jnp.concatenate([x[:, :64], x[:, 64:]], axis=1)),
    "transpose": (1, lambda x: x.reshape(8, 128).T.T),
    "stop_gradient": (1, lambda x: lax.stop_gradient(x)),
    "reduce_sum": (1, lambda x: _R(jnp.sum(x, axis=1, keepdims=True))),
    "reduce_max": (1, lambda x: _R(jnp.max(x, axis=1, keepdims=True))),
    "reduce_min": (1, lambda x: _R(jnp.min(x, axis=1, keepdims=True))),
    "reduce_and": (1, lambda x: _R(jnp.where(jnp.all(x > 0, axis=1, keepdims=True), 1.0, 0.0))),
    "reduce_or": (1, lambda x: _R(jnp.where(jnp.any(x > 0, axis=1, keepdims=True), 1.0, 0.0))),
    "cumsum": (1, lambda x: jnp.cumsum(x, axis=1)),
    "rev": (1, lambda x: jnp.flip(x, axis=1)),
    "iota": (1, lambda x: x + lax.broadcasted_iota(jnp.float32, (8, 128), 1)),
    "pad": (1, lambda x: lax.pad(x, jnp.float32(0), ((0, 0, 0), (0, 2, 0)))[:, :128]),
}


def probe(name, nargs, body):
    def kernel(*refs):
        ins, out = refs[:-1], refs[-1]
        out[:] = body(*[r[:] for r in ins]).astype(jnp.float32)

    shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    def f(*xs):
        return pl.pallas_call(
            kernel,
            out_shape=shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nargs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*xs)

    args = [shape] * nargs
    try:
        jax.jit(f).lower(*args).compile()
        return True, ""
    except Exception as e:  # noqa: BLE001 — record every failure mode
        return False, f"{type(e).__name__}: {e}"


def main():
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon") and "TPU" not in str(dev):
        print(f"refusing: first device is {dev}, not a TPU", file=sys.stderr)
        sys.exit(2)
    ok, fail = [], {}
    for name, (nargs, body) in sorted(CASES.items()):
        good, err = probe(name, nargs, body)
        (ok.append(name) if good else fail.__setitem__(name, err.splitlines()[0][:300]))
        print(f"{'OK  ' if good else 'FAIL'} {name}" + ("" if good else f": {err.splitlines()[0][:160]}"), flush=True)
    out = {"device": str(dev), "ok": ok, "fail": fail}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PRIM_LOWERING.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(ok)} ok / {len(fail)} fail")


if __name__ == "__main__":
    main()
