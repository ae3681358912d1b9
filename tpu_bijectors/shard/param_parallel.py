"""Parameter-dimension sharding: the sequence/context-parallel analogue.

The reference has no sequences; SURVEY.md §2.2 maps SP/CP onto "long flat
parameter vectors — shard the unconstrained vector + block ranges across
chips". Two cases:

* homogeneous IID blocks (the one that actually gets long in practice:
  thousands-to-millions of coefficients of one family): the flat
  unconstrained vector is sharded over a mesh axis, each device runs the
  block bijector on its slice, and only the scalar log-det / log-density
  crosses the interconnect (`psum`);
* heterogeneous products (`TreeUnconstrainer` — the reference's `Stacked`
  block ranges, src/bijectors/stacked.jl): whole child blocks are assigned
  to devices by a balanced contiguous partition, per-device segments are
  zero-padded to a common length (`ParamLayout`), each device evaluates
  ONLY its children's linked densities on its local slice (a
  `lax.switch` over the device index inside `shard_map` — traced once,
  SPMD), and one scalar `psum` reassembles the model density.

Chains remain the first-choice axis for small models; combine both as a
2-D ('chain', 'param') mesh when a single model's parameter vector
outgrows one chip's HBM.
"""

from __future__ import annotations

import dataclasses as _dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..vectorize.core import (
    IIDUnconstrainer,
    TreeUnconstrainer,
    Unconstrainer,
    unconstrain,
)


def shard_params(mesh: Mesh, v, axis_name: str = "param"):
    """Place a (..., dim) flat vector with the LAST axis sharded over the mesh."""
    spec = P(*([None] * (v.ndim - 1)), axis_name)
    return jax.device_put(v, NamedSharding(mesh, spec))


def _check_iid(u: Unconstrainer, n_dev: int) -> IIDUnconstrainer:
    if not isinstance(u, IIDUnconstrainer):
        raise ValueError(
            "param-parallel sharding needs a homogeneous IID block "
            "(IIDUnconstrainer) or a heterogeneous product "
            f"(TreeUnconstrainer), got {type(u).__name__}; shard chains instead"
        )
    if u.n % n_dev:
        raise ValueError(f"block count {u.n} not divisible by mesh size {n_dev}")
    return u


@_dataclasses.dataclass(frozen=True)
class ParamLayout:
    """Static device layout for heterogeneous param-axis sharding.

    `assign[i]` is the tuple of child indices owned by device i (a balanced
    CONTIGUOUS partition of the TreeUnconstrainer's children — block order
    is preserved, so packing is a gather of contiguous v slices);
    `seg_len` is the common per-device segment length (max owned length,
    zero-padded). `pack(v)` maps the model's flat (..., dim) unconstrained
    vector to the padded (..., n_dev * seg_len) layout that
    `param_parallel_logdensity` shards."""

    child_ranges: tuple  # (start, len) per child in linked-vec space
    assign: tuple  # per device: tuple of child indices
    seg_len: int

    @property
    def n_dev(self):
        return len(self.assign)

    @property
    def packed_dim(self):
        return self.n_dev * self.seg_len

    def pack(self, v):
        batch_pad = [(0, 0)] * (jnp.ndim(v) - 1)
        segs = []
        for owned in self.assign:
            parts = [
                v[..., s : s + l]
                for s, l in (self.child_ranges[c] for c in owned)
            ]
            seg = (
                jnp.concatenate(parts, axis=-1)
                if parts
                else jnp.zeros(v.shape[:-1] + (0,), v.dtype)
            )
            pad = self.seg_len - seg.shape[-1]
            if pad:
                seg = jnp.pad(seg, batch_pad + [(0, pad)])
            segs.append(seg)
        return jnp.concatenate(segs, axis=-1)


def build_param_layout(u: TreeUnconstrainer, n_dev: int) -> ParamLayout:
    """Balanced contiguous partition of the children over n_dev devices:
    walk blocks in order, starting a new device whenever the running
    segment would exceed the ideal share (whole blocks only — entangled
    blocks like a simplex or an LKJ triangle never straddle devices, so
    every link runs device-local)."""
    lens = [l for _, l in u.linked_offsets]
    total = sum(lens)
    ideal = total / n_dev
    assign, cur, cur_len, used = [], [], 0, 0
    for i, li in enumerate(lens):
        if cur and cur_len + li > ideal and len(assign) < n_dev - 1:
            assign.append(tuple(cur))
            cur, cur_len = [], 0
        cur.append(i)
        cur_len += li
        used = max(used, cur_len)
    assign.append(tuple(cur))
    while len(assign) < n_dev:
        assign.append(())
    return ParamLayout(tuple(u.linked_offsets), tuple(assign), used)


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
    d_or_u, mesh: Mesh, axis_name: str = "param", batch_axis_name: str = None
):
    """Sharded fused log-density: fn(v) -> logpdf(d, x) + logdet, with the
    flat vector's parameter axis sharded and ONE psum crossing the mesh.

    Homogeneous IID blocks take v in the model's own (..., dim) layout.
    Heterogeneous products (TreeUnconstrainer) take v in the PADDED
    per-device layout: the returned fn carries `fn.layout` (a ParamLayout);
    call `fn.layout.pack(v)` once (or build states directly in the packed
    layout) and `shard_params` the result. Gradients flow through both.

    `batch_axis_name` composes with the chain axis on a 2-D
    ('chain', 'param') mesh: the LEADING batch axis of v shards over it
    while the psum still reduces over `axis_name` only — chain rows stay
    independent (docs/sharding.md)."""
    u = d_or_u if isinstance(d_or_u, Unconstrainer) else unconstrain(d_or_u)
    n_dev = mesh.shape[axis_name] if axis_name in mesh.shape else mesh.devices.size
    if isinstance(u, TreeUnconstrainer):
        return _tree_param_parallel_logdensity(
            u, mesh, axis_name, batch_axis_name, n_dev
        )
    u = _check_iid(u, n_dev)
    local = IIDUnconstrainer(u.inner, u.n // n_dev)

    def local_fn(v_local):
        _, lpld = local.from_linked_vec_with_logpdf(v_local)
        return jax.lax.psum(lpld, axis_name)

    def fn(v):
        bspec = _batch_spec(v.ndim - 1, batch_axis_name)
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=P(*bspec, axis_name),
            out_specs=P(*bspec),
            check_vma=False,
        )(v)

    return fn


def _batch_spec(nb: int, batch_axis_name):
    """Leading-batch PartitionSpec entries: the first batch axis rides
    `batch_axis_name` (2-D chain x param meshes), the rest replicate."""
    return [
        batch_axis_name if (i == 0 and batch_axis_name) else None
        for i in range(nb)
    ]


def _tree_param_parallel_logdensity(
    u: TreeUnconstrainer,
    mesh: Mesh,
    axis_name: str = "param",
    batch_axis_name: str = None,
    n_dev: int = None,
):
    """Heterogeneous (Stacked-block-range) param sharding, SURVEY.md §2.2 SP
    row: each device owns whole child blocks (ParamLayout), runs ONLY its
    children's links + densities on its local padded segment, and one
    scalar psum reassembles sum_i [logpdf_i + logdet_i]. The per-device
    program is a lax.switch over the device index — traced once (SPMD),
    each branch slices its children out of the local (..., seg_len) block
    at the local offsets the contiguous packing induces."""
    if n_dev is None:
        n_dev = (
            mesh.shape[axis_name]
            if axis_name in mesh.shape
            else mesh.devices.size
        )
    layout = build_param_layout(u, n_dev)

    def _branch(owned):
        def run(v_local):
            acc = jnp.zeros(v_local.shape[:-1], v_local.dtype)
            o = 0
            for c in owned:
                _, l = u.linked_offsets[c]
                acc = acc + u.children[c].linked_logdensity(
                    v_local[..., o : o + l]
                )
                o += l
            return acc

        return run

    branches = [_branch(owned) for owned in layout.assign]

    def local_fn(v_local):
        idx = jax.lax.axis_index(axis_name)
        lp = jax.lax.switch(idx, branches, v_local)
        return jax.lax.psum(lp, axis_name)

    def fn(v):
        bspec = _batch_spec(v.ndim - 1, batch_axis_name)
        return jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=P(*bspec, axis_name),
            out_specs=P(*bspec),
            check_vma=False,
        )(v)

    fn.layout = layout
    return fn
