"""Serving export: AOT-compile + serialize the density hot paths.

Net-new production layer (nothing to port — the reference is an
in-process Julia library). For deployment, a server should not carry the
Python model-construction code, retrace on startup, or risk version
skew: `jax.export` lowers the jitted computation to StableHLO once, and
the serialized artifact is reloadable in any matching runtime (including
non-Python serving stacks) with the compilation contract frozen.

Exports are SHAPE-SPECIALIZED (fixed batch, the serving contract): the
whole-model Pallas kernels dispatch on static shapes, so a fixed-shape
artifact captures exactly the fused computation the bench measures.
Export one artifact per supported batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as _export


def _spec(batch_size, dim, dtype, transposed):
    shape = (dim, batch_size) if transposed else (batch_size, dim)
    return jax.ShapeDtypeStruct(shape, dtype)


def export_logdensity(
    model,
    batch_size: int,
    with_grad: bool = False,
    transposed: bool = False,
    dtype=None,
    path: str | None = None,
) -> bytes:
    """Serialize the batched linked log-density logp(v): (B, dim) -> (B,)
    (or the transposed (dim, B) layout the TPU kernels prefer).

    with_grad=True exports v -> (logp, dlogp/dv) instead — the exact
    computation a leapfrog step consumes (one fused forward+reverse pass).
    Returns the serialized bytes; also writes them to `path` if given."""
    dtype = dtype or jnp.result_type(float)
    fn = (
        model.batched_logdensity_t_fn()
        if transposed
        else model.batched_logdensity_fn()
    )
    if with_grad:
        base = fn

        def fn(v):
            logp, vjp = jax.vjp(base, v)
            (grad,) = vjp(jnp.ones_like(logp))
            return logp, grad

    exp = _export.export(jax.jit(fn))(
        _spec(batch_size, model.dim(), dtype, transposed)
    )
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_constrain(
    model,
    batch_size: int,
    dtype=None,
    path: str | None = None,
) -> bytes:
    """Serialize the inverse link v -> constrained sample pytree (the
    transform-serving path: flat draws in, native-support values out)."""
    dtype = dtype or jnp.result_type(float)
    fn = jax.jit(lambda v: model.constrain(v))
    exp = _export.export(fn)(
        _spec(batch_size, model.dim(), dtype, transposed=False)
    )
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load(blob_or_path):
    """Deserialize an exported artifact -> a callable with the frozen
    shape/dtype contract (raises on mismatched inputs)."""
    if isinstance(blob_or_path, (str, bytes)) and not isinstance(
        blob_or_path, bytes
    ):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = blob_or_path
    exp = _export.deserialize(
        blob if isinstance(blob, bytearray) else bytearray(blob)
    )
    return exp.call
