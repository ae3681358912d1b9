"""Parameter-dimension sharding: the sequence/context-parallel analogue.

The reference has no sequences; SURVEY.md §2.2 maps SP/CP onto "long flat
parameter vectors — shard the unconstrained vector + block ranges across
chips". This module implements that for the homogeneous-block case (the one
that actually gets long in practice: IID blocks of thousands-to-millions of
coefficients): the flat unconstrained vector is sharded over a mesh axis,
each device runs the block bijector on its slice, and only the scalar
log-det / log-density crosses the interconnect (`psum`).

For heterogeneous models the chain axis (chain_parallel.py) is the right
axis; combine both as a 2-D ('chain', 'param') mesh when a single model's
parameter vector outgrows one chip's HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..vectorize.core import IIDUnconstrainer, Unconstrainer, unconstrain


def shard_params(mesh: Mesh, v, axis_name: str = "param"):
    """Place a (..., dim) flat vector with the LAST axis sharded over the mesh."""
    spec = P(*([None] * (v.ndim - 1)), axis_name)
    return jax.device_put(v, NamedSharding(mesh, spec))


def _check_iid(u: Unconstrainer, n_dev: int) -> IIDUnconstrainer:
    if not isinstance(u, IIDUnconstrainer):
        raise ValueError(
            "param-parallel sharding needs a homogeneous IID block "
            f"(IIDUnconstrainer), got {type(u).__name__}; shard chains instead"
        )
    if u.n % n_dev:
        raise ValueError(f"block count {u.n} not divisible by mesh size {n_dev}")
    return u


def param_parallel_from_linked(u: Unconstrainer, mesh: Mesh, axis_name: str = "param"):
    """Build `from_linked_vec` with the parameter axis sharded over `mesh`.

    Returns fn(v) -> (x, logdet): v (..., dim) sharded on its last axis; x
    keeps the same sharding; logdet is psum'd (replicated scalar per batch
    element)."""
    n_dev = mesh.devices.size
    u = _check_iid(u, n_dev)
    local = IIDUnconstrainer(u.inner, u.n // n_dev)

    def local_fn(v_local):
        x, ld = local.from_linked_vec(v_local)
        return x, jax.lax.psum(ld, axis_name)

    def fn(v):
        nb = v.ndim - 1
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=P(*([None] * nb), axis_name),
            out_specs=(
                P(*([None] * nb), axis_name)
                if u.inner.vec_length == 1
                else P(*([None] * nb), axis_name, None),
                P(*([None] * nb)),
            ),
            check_vma=False,
        )(v)

    return fn


def param_parallel_logdensity(
    d_or_u, mesh: Mesh, axis_name: str = "param"
):
    """Sharded fused log-density: fn(v) -> logpdf(d, x) + logdet, with the
    flat vector's parameter axis sharded and ONE psum crossing the mesh."""
    u = d_or_u if isinstance(d_or_u, Unconstrainer) else unconstrain(d_or_u)
    n_dev = mesh.devices.size
    u = _check_iid(u, n_dev)
    local = IIDUnconstrainer(u.inner, u.n // n_dev)

    def local_fn(v_local):
        _, lpld = local.from_linked_vec_with_logpdf(v_local)
        return jax.lax.psum(lpld, axis_name)

    def fn(v):
        nb = v.ndim - 1
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=P(*([None] * nb), axis_name),
            out_specs=P(*([None] * nb)),
            check_vma=False,
        )(v)

    return fn
