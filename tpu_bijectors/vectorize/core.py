"""Vectorization layer: pytree sample <-> flat (unconstrained) vector.

TPU-native counterpart of the reference's VectorBijectors module
(/root/reference/src/vector/ — the PPL-facing API that DynamicPPL/Turing
consume, SURVEY.md §2.5). For any distribution `d`:

  u = unconstrain(d)
  u.vec_length / u.linked_vec_length      static ints (no sampling)
  u.to_vec(x) / u.from_vec(v)             shape ravel, logJ == 0
  u.to_linked_vec(x) -> (v, logdet)       ravel + unconstrain
  u.from_linked_vec(v) -> (x, logdet)     the sampler hot path
  u.optic_vec() / u.linked_optic_vec()    per-element provenance paths
                                          (None when entangled, e.g. simplex —
                                          reference interface.jl:143-184)

Everything is static-shape: offsets are computed at trace time, so a NUTS
state is ONE (n_chains, dim) array and `from_linked_vec` is a single fused
XLA computation. Homogeneous IID blocks take the batched fast path (the
TPU-native version of the reference's Elementwise/Fill optimization,
src/vector/product/fill.jl — batching over the block is where throughput
comes from).

Supported structure: any registered leaf distribution, IIDProduct, Product,
NamedProduct, TransformedDistribution (to_linked_vec(td) composes
inverse(td.transform) then the base link, reference src/vector/transformed.jl).
"""

from __future__ import annotations

import dataclasses as _dataclasses

import jax.numpy as jnp
import numpy as np

from ..bijectors.base import Bijector
from ..dists.base import Distribution
from ..dists.product import ElementwiseProduct, IIDProduct, NamedProduct, Product
from ..registry import bijector
from ..transformed import TransformedDistribution
from ..tree import pytree_dataclass
from ..utils import tril_to_vec, vec_to_tril


def _shape_len(shape) -> int:
    n = 1
    for s in shape:
        n *= int(s)
    return n


def _ravel_event(x, event_shape):
    ne = len(event_shape)
    batch = x.shape[: x.ndim - ne]
    return jnp.reshape(x, batch + (_shape_len(event_shape),))


def _unravel_event(v, event_shape):
    batch = v.shape[:-1]
    return jnp.reshape(v, batch + tuple(int(s) for s in event_shape))


@_dataclasses.dataclass(frozen=True)
class Optic:
    """Per-element provenance lens (the reference's AbstractPPL optics,
    src/vector/interface.jl:105-184): `path` walks product structure
    (dict keys / tuple positions / IID indices), `index` is the cartesian
    index into the leaf array (() for scalar-event leaves).

    `get(x)` extracts the element; equality is structural — the sweep's
    Jacobian-sparsity property matches linked optics against plain optics
    by == (reference test_utils.jl:419-473)."""

    path: tuple = ()
    index: tuple = ()

    def get(self, x):
        for k in self.path:
            x = x[k]
        return x[self.index] if self.index != () else x

    def prefix(self, key) -> "Optic":
        return Optic((key,) + self.path, self.index)

    def __repr__(self):
        p = "".join(
            ".%s" % k if isinstance(k, str) else "[%d]" % k for k in self.path
        )
        i = "[%s]" % ", ".join(map(str, self.index)) if self.index else ""
        return "Optic(_%s%s)" % (p, i)


def _prefix_optics(optics, key):
    return [None if o is None else o.prefix(key) for o in optics]


class Unconstrainer:
    """Abstract; see module docstring."""

    vec_length: int
    linked_vec_length: int

    def to_vec(self, x):
        raise NotImplementedError

    def from_vec(self, v):
        raise NotImplementedError

    def to_linked_vec(self, x):
        raise NotImplementedError

    def from_linked_vec(self, v):
        raise NotImplementedError

    def optic_vec(self):
        raise NotImplementedError

    def linked_optic_vec(self):
        raise NotImplementedError

    def from_linked_vec_with_logpdf(self, v):
        """(x, logpdf(d, x) + logdetJ) — the sampler hot path as ONE fused
        computation. Leaf distributions whose density is a function of a
        decomposition the inverse link already computes (LKJ: Cholesky factor
        of the correlation matrix; Wishart family: factor of the SPD matrix)
        override the generic path and never re-decompose x."""
        raise NotImplementedError

    def linked_logdensity(self, v):
        """logpdf(d, x) + logdetJ WITHOUT returning x — leaves whose density
        doesn't need the constrained sample (LKJ: only the factor diagonal)
        skip materializing it entirely (the Pallas kernels can't be DCE'd
        into like the jnp path can)."""
        return self.from_linked_vec_with_logpdf(v)[1]

    def linked_logdensity_t(self, vT):
        """linked_logdensity on the TRANSPOSED (dim, batch) layout — the
        TPU-native serving orientation: batch rides the 128-wide lane axis
        end to end, so leaf slices are contiguous row blocks and the Pallas
        kernels read their native (event, batch) layout with NO HBM
        relayout (each per-leaf (B, P) -> (P, B) transpose costs about one
        full extra pass at B=131072). vT must be 2-D (dim, batch).
        Default: fall back to the batch-major path."""
        return self.linked_logdensity(jnp.swapaxes(vT, 0, 1))


@pytree_dataclass(meta_fields=("event_shape", "linked_shape", "chol_pack", "entangled"))
class LeafUnconstrainer(Unconstrainer):
    """Any single distribution with a registry bijector.

    `chol_pack`: Cholesky-factor-valued events ravel as the packed triangle
    (n(n+1)/2) instead of the full matrix (reference
    src/vector/cholesky/cholesky.jl:11-68).
    `entangled`: linked coordinates depend on multiple input coordinates
    (simplex/pd/corr) -> linked optics are None (interface.jl:168-184).
    """

    dist: Distribution
    link: Bijector
    event_shape: tuple
    linked_shape: tuple
    chol_pack: bool = False
    entangled: bool = False

    @property
    def vec_length(self):  # type: ignore[override]
        if self.chol_pack:
            n = int(self.event_shape[-1])
            return n * (n + 1) // 2
        return _shape_len(self.event_shape)

    @property
    def linked_vec_length(self):  # type: ignore[override]
        return _shape_len(self.linked_shape)

    def to_vec(self, x):
        if self.chol_pack:
            return tril_to_vec(_to_lower(x, self.dist))
        return _ravel_event(x, self.event_shape)

    def from_vec(self, v):
        if self.chol_pack:
            return _from_lower(vec_to_tril(v), self.dist)
        return _unravel_event(v, self.event_shape)

    def to_linked_vec(self, x):
        y, ld = self.link.forward_and_log_det(x)
        ne_in = int(self.link.event_ndims_in)
        extra = len(self.event_shape) - ne_in
        if extra > 0:
            ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
        return _ravel_event(y, self.linked_shape), ld

    def from_linked_vec(self, v):
        y = _unravel_event(v, self.linked_shape)
        x, ld = self.link.inverse_and_log_det(y)
        ne_in = int(self.link.event_ndims_in)
        extra = len(self.event_shape) - ne_in
        if extra > 0:
            ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
        return x, ld

    def optic_vec(self):
        """Real element indices into the sample (reference interface.jl:105-141):
        cartesian C-order unravel for plain leaves — including matrix events
        and Reshaped wrappers, whose to_vec is the same C-order ravel — and
        the packed-triangle index arrays for Cholesky-factor leaves."""
        if self.chol_pack:
            from ..utils import _triu_index_arrays

            n = int(self.event_shape[-1])
            rows, cols = _triu_index_arrays(n, 0)
            if getattr(self.dist, "mode", "L") == "L":
                # tril_to_vec packs the transpose: slot k -> x[cols[k], rows[k]]
                return [Optic((), (int(c), int(r))) for r, c in zip(rows, cols)]
            return [Optic((), (int(r), int(c))) for r, c in zip(rows, cols)]
        if self.event_shape == ():
            return [Optic((), ())]
        return [
            Optic((), tuple(int(i) for i in np.unravel_index(k, self.event_shape)))
            for k in range(self.vec_length)
        ]

    def linked_optic_vec(self):
        """Per linked slot: the optic of the x element that SOLELY determines
        it, or None when entangled (reference interface.jl:143-184). For
        every registry link, non-entangled <=> the link acts elementwise in
        the C-order ravel (identity/Log/Logit/Truncated, incl. through a
        Reshape), so length-preserving non-entangled leaves reuse optic_vec;
        the sweep's Jacobian-sparsity property verifies this per family."""
        if self.entangled or self.linked_vec_length != self.vec_length:
            return [None] * self.linked_vec_length
        return self.optic_vec()

    def from_linked_vec_with_logpdf(self, v):
        b, d = self.link, self.dist
        hook = getattr(d, "fused_linked_logdensity", None)
        if hook is not None:
            y = _unravel_event(v, self.linked_shape)
            out = hook(b, y)
            if out is not None:
                return out
        if hasattr(b, "inverse_and_log_det_with_factor") and hasattr(
            d, "logpdf_from_factor"
        ):
            y = _unravel_event(v, self.linked_shape)
            x, ld, factor = b.inverse_and_log_det_with_factor(y)
            lp = _call_logpdf_from_factor(d, factor, x)
            extra = len(self.event_shape) - int(b.event_ndims_in)
            if extra > 0:
                ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
            return x, lp + ld
        x, ld = self.from_linked_vec(v)
        return x, d.logpdf(x) + ld

    def linked_logdensity(self, v):
        b, d = self.link, self.dist
        hook = getattr(d, "fused_linked_logdensity", None)
        if hook is not None:
            y = _unravel_event(v, self.linked_shape)
            out = hook(b, y, want_x=False)
            if out is not None:
                return out[1]
        if hasattr(b, "inverse_log_det_and_factor_only") and hasattr(
            d, "logpdf_from_factor"
        ):
            y = _unravel_event(v, self.linked_shape)
            ld, factor = b.inverse_log_det_and_factor_only(y)
            extra = len(self.event_shape) - int(b.event_ndims_in)
            if extra > 0:
                ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
            return _call_logpdf_from_factor(d, factor, None) + ld
        return self.from_linked_vec_with_logpdf(v)[1]

    def linked_logdensity_t(self, vT):
        b, d = self.link, self.dist
        if len(self.linked_shape) == 1:
            hook = getattr(d, "fused_linked_logdensity_t", None)
            if hook is not None:
                out = hook(b, vT)
                if out is not None:
                    return out
            if hasattr(b, "inverse_log_det_and_factor_only_t") and hasattr(
                d, "logpdf_from_factor"
            ):
                ld, factor = b.inverse_log_det_and_factor_only_t(vT)
                return _call_logpdf_from_factor(d, factor, None) + ld
        if self.linked_shape == () and self.event_shape == ():
            # scalar leaf: the link and density are elementwise, so the
            # (1, B) row works in place (through the normal leaf path, so
            # telescoped scalar hooks like LogNormal's still fire)
            return self.linked_logdensity(vT[0][..., None])
        return self.linked_logdensity(jnp.swapaxes(vT, 0, 1))


def _call_logpdf_from_factor(d, factor, x):
    """Dispatch the factor-density protocol by STATIC arity (two-argument
    `logpdf_from_factor(factor, x)` vs the older single-argument form) —
    a runtime `except TypeError` retry would swallow genuine TypeErrors
    raised INSIDE a two-argument implementation and mask the traceback."""
    import inspect

    fn = d.logpdf_from_factor
    try:
        n_pos = sum(
            p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
            for p in inspect.signature(fn).parameters.values()
        )
    except (TypeError, ValueError):  # builtins/partials without signatures
        n_pos = 2
    return fn(factor, x) if n_pos >= 2 else fn(factor)


def _to_lower(x, dist):
    mode = getattr(dist, "mode", "L")
    return x if mode == "L" else jnp.swapaxes(x, -1, -2)


def _from_lower(L, dist):
    mode = getattr(dist, "mode", "L")
    return L if mode == "L" else jnp.swapaxes(L, -1, -2)


@pytree_dataclass(meta_fields=("n",))
class IIDUnconstrainer(Unconstrainer):
    """Homogeneous block fast path: ONE bijector over a batched leading axis
    (replaces the reference's per-component loop + Elementwise fast path)."""

    inner: LeafUnconstrainer
    n: int

    @property
    def vec_length(self):  # type: ignore[override]
        return self.n * self.inner.vec_length

    @property
    def linked_vec_length(self):  # type: ignore[override]
        return self.n * self.inner.linked_vec_length

    def to_vec(self, x):
        # x: (..., n) + inner event; inner methods broadcast over the axis
        v = self.inner.to_vec(x)  # (..., n, inner_len)
        return jnp.reshape(v, v.shape[:-2] + (self.vec_length,))

    def from_vec(self, v):
        vi = jnp.reshape(v, v.shape[:-1] + (self.n, self.inner.vec_length))
        return self.inner.from_vec(vi)

    def to_linked_vec(self, x):
        y, ld = self.inner.to_linked_vec(x)  # y: (..., n, L_i); ld: (..., n)
        return jnp.reshape(y, y.shape[:-2] + (self.linked_vec_length,)), jnp.sum(
            ld, axis=-1
        )

    def from_linked_vec(self, v):
        vi = jnp.reshape(v, v.shape[:-1] + (self.n, self.inner.linked_vec_length))
        x, ld = self.inner.from_linked_vec(vi)
        return x, jnp.sum(ld, axis=-1)

    def from_linked_vec_with_logpdf(self, v):
        vi = jnp.reshape(v, v.shape[:-1] + (self.n, self.inner.linked_vec_length))
        x, lpld = self.inner.from_linked_vec_with_logpdf(vi)
        return x, jnp.sum(lpld, axis=-1)

    def linked_logdensity(self, v):
        vi = jnp.reshape(v, v.shape[:-1] + (self.n, self.inner.linked_vec_length))
        return jnp.sum(self.inner.linked_logdensity(vi), axis=-1)

    def linked_logdensity_t(self, vT):
        inner = self.inner
        if (
            inner.linked_shape == ()
            and inner.event_shape == ()
            and tuple(inner.dist.batch_shape) == ()
        ):
            # scalar inner: vT is (n, B) and everything is elementwise —
            # evaluate in place (batch stays on lanes, no 16x sublane
            # padding waste of the (B, n) orientation) and reduce the block
            # axis. The dummy trailing event axis feeds the leaf protocol.
            # (arraydist inners carry (n,)-batched params that would
            # misalign against (n, B); they take the swapaxes branch.)
            lpld = inner.linked_logdensity(vT[..., None])  # (n, B)
            return jnp.sum(lpld, axis=0)
        return self.linked_logdensity(jnp.swapaxes(vT, 0, 1))

    def optic_vec(self):
        inner = self.inner.optic_vec()
        return [o for i in range(self.n) for o in _prefix_optics(inner, i)]

    def linked_optic_vec(self):
        inner = self.inner.linked_optic_vec()
        return [o for i in range(self.n) for o in _prefix_optics(inner, i)]


@pytree_dataclass(meta_fields=("offsets", "linked_offsets", "names"))
class TreeUnconstrainer(Unconstrainer):
    """Tuple/dict product with static offsets (reference ProductVecTransform,
    src/vector/product/product.jl:20-320)."""

    children: tuple
    offsets: tuple  # (start, len) per child in vec space
    linked_offsets: tuple
    names: tuple = None  # type: ignore[assignment]  # None -> tuple-valued

    @classmethod
    def build(cls, children, names=None):
        ofs, lofs = [], []
        o = lo = 0
        for c in children:
            ofs.append((o, c.vec_length))
            lofs.append((lo, c.linked_vec_length))
            o += c.vec_length
            lo += c.linked_vec_length
        return cls(tuple(children), tuple(ofs), tuple(lofs), names)

    @property
    def vec_length(self):  # type: ignore[override]
        return sum(l for _, l in self.offsets)

    @property
    def linked_vec_length(self):  # type: ignore[override]
        return sum(l for _, l in self.linked_offsets)

    def _parts(self, x):
        if self.names is None:
            return list(x)
        return [x[n] for n in self.names]

    def _rebuild(self, parts):
        if self.names is None:
            return tuple(parts)
        return dict(zip(self.names, parts))

    def to_vec(self, x):
        return jnp.concatenate(
            [c.to_vec(xi) for c, xi in zip(self.children, self._parts(x))], axis=-1
        )

    def from_vec(self, v):
        parts = [
            c.from_vec(v[..., s : s + l])
            for c, (s, l) in zip(self.children, self.offsets)
        ]
        return self._rebuild(parts)

    def to_linked_vec(self, x):
        vs, ld = [], None
        for c, xi in zip(self.children, self._parts(x)):
            vi, ldi = c.to_linked_vec(xi)
            vs.append(vi)
            ld = ldi if ld is None else ld + ldi
        return jnp.concatenate(vs, axis=-1), ld

    def from_linked_vec(self, v):
        parts, ld = [], None
        for c, (s, l) in zip(self.children, self.linked_offsets):
            xi, ldi = c.from_linked_vec(v[..., s : s + l])
            parts.append(xi)
            ld = ldi if ld is None else ld + ldi
        return self._rebuild(parts), ld

    def from_linked_vec_with_logpdf(self, v):
        parts, acc = [], None
        for c, (s, l) in zip(self.children, self.linked_offsets):
            xi, a = c.from_linked_vec_with_logpdf(v[..., s : s + l])
            parts.append(xi)
            acc = a if acc is None else acc + a
        return self._rebuild(parts), acc

    def linked_logdensity(self, v):
        acc = None
        for c, (s, l) in zip(self.children, self.linked_offsets):
            a = c.linked_logdensity(v[..., s : s + l])
            acc = a if acc is None else acc + a
        return acc

    def linked_logdensity_t(self, vT):
        # the fused whole-model kernel when eligible: ONE Pallas pass over
        # the (dim, batch) state — the HBM floor — instead of per-leaf
        # kernels that each force their operand slice to materialize
        from .fused_kernel import try_mega

        out = try_mega(self, vT)
        if out is not None:
            return out
        return self._linked_logdensity_t_children(vT)

    def _linked_logdensity_t_children(self, vT):
        # composed per-leaf path: each child's block is a contiguous row
        # slice; also the tangent basis for the fused kernel's custom_jvp
        acc = None
        for c, (s, l) in zip(self.children, self.linked_offsets):
            a = c.linked_logdensity_t(vT[s : s + l, :])
            acc = a if acc is None else acc + a
        return acc

    def optic_vec(self):
        out = []
        for i, c in enumerate(self.children):
            key = i if self.names is None else self.names[i]
            out.extend(_prefix_optics(c.optic_vec(), key))
        return out

    def linked_optic_vec(self):
        out = []
        for i, c in enumerate(self.children):
            key = i if self.names is None else self.names[i]
            out.extend(_prefix_optics(c.linked_optic_vec(), key))
        return out


@pytree_dataclass
class TransformedUnconstrainer(Unconstrainer):
    """to_linked_vec(td) = to_linked_vec(td.base) ∘ inverse(td.transform)
    (reference src/vector/transformed.jl:4-11)."""

    base: Unconstrainer
    transform: Bijector
    td: TransformedDistribution

    @property
    def vec_length(self):  # type: ignore[override]
        return _shape_len(self.td.event_shape)

    @property
    def linked_vec_length(self):  # type: ignore[override]
        return self.base.linked_vec_length

    def to_vec(self, y):
        return _ravel_event(y, self.td.event_shape)

    def from_vec(self, v):
        return _unravel_event(v, self.td.event_shape)

    def to_linked_vec(self, y):
        x, ld = self.transform.inverse_and_log_det(y)
        extra = self.td.base.event_ndims - int(self.transform.event_ndims_in)
        if extra > 0:
            ld = jnp.sum(ld, axis=tuple(range(-extra, 0)))
        v, ld2 = self.base.to_linked_vec(x)
        return v, ld + ld2

    def from_linked_vec(self, v):
        x, ld = self.base.from_linked_vec(v)
        y, ld2 = self.transform.forward_and_log_det(x)
        extra = self.td.base.event_ndims - int(self.transform.event_ndims_in)
        if extra > 0:
            ld2 = jnp.sum(ld2, axis=tuple(range(-extra, 0)))
        return y, ld + ld2

    def from_linked_vec_with_logpdf(self, v):
        # logpdf(td, y) + ld(v->y) telescopes to base logpdf + base ld: the
        # transform's forward and inverse log-dets cancel
        x, lpld = self.base.from_linked_vec_with_logpdf(v)
        y = self.transform.forward(x)
        return y, lpld

    def linked_logdensity(self, v):
        # telescopes to the base density: no sample materialization, no
        # transform eval (the batch-major analogue of linked_logdensity_t)
        return self.base.linked_logdensity(v)

    def linked_logdensity_t(self, vT):
        # same telescoping: the density equals the base's, no transform eval
        return self.base.linked_logdensity_t(vT)

    def optic_vec(self):
        shape = tuple(int(s) for s in self.td.event_shape)
        if shape == ():
            return [Optic((), ())]
        return [
            Optic((), tuple(int(i) for i in np.unravel_index(k, shape)))
            for k in range(self.vec_length)
        ]

    def linked_optic_vec(self):
        # conservative: the user transform can entangle arbitrarily
        # (reference src/vector/transformed.jl keeps no provenance either)
        return [None] * self.linked_vec_length


@pytree_dataclass
class UnconstrainerBijector(Bijector):
    """Adapter exposing an Unconstrainer as a Bijector: pytree sample ->
    flat unconstrained vector (the reference's NamedStacked bijector,
    src/bijectors/named_stacked.jl, generalized to any product structure)."""

    u: Unconstrainer

    event_ndims_in = 0  # input is a pytree, not a single array
    event_ndims_out = 1

    def forward_and_log_det(self, x):
        return self.u.to_linked_vec(x)

    def forward(self, x):
        return self.u.to_linked_vec(x)[0]

    def inverse_and_log_det(self, v):
        return self.u.from_linked_vec(v)

    def inverse(self, v):
        return self.u.from_linked_vec(v)[0]

    def forward_event_shape(self, shape):
        return (self.u.linked_vec_length,)


# kinds whose link couples elements (linked slot k depends on more than
# x[k]) — their per-element linked optics must be None. "ordered" belongs
# here: slot k of the ordered link is log(x_k - x_{k-1}), a BIdiagonal
# Jacobian, not elementwise.
_ENTANGLED_KINDS = {"simplex", "pd", "corr", "chol_corr", "joint_order", "ordered"}


def unconstrain(d: Distribution) -> Unconstrainer:
    """Build the Unconstrainer for `d` (the reference's `to_linked_vec` et al.
    entry points, src/vector/interface.jl)."""
    if isinstance(d, TransformedDistribution):
        return TransformedUnconstrainer(unconstrain(d.base), d.transform, d)
    if isinstance(d, IIDProduct):
        inner = unconstrain(d.base)
        if isinstance(inner, LeafUnconstrainer):
            return IIDUnconstrainer(inner, d.n)
        # IIDProduct stacks the iid axis INTO the leaf arrays (sample =
        # base.sample with an extra (n,) axis), so an n-children
        # TreeUnconstrainer would iterate the wrong structure entirely.
        # A pure nested-IID chain (iid matrix/tensor of one family) IS a
        # single leaf with a bigger event — the generic leaf path below is
        # exact for it. Anything tuple/named-structured has no flat-array
        # sample and is rejected loudly (use Product of explicit copies).
        base = d.base
        while isinstance(base, IIDProduct):
            base = base.base
        if isinstance(unconstrain(base), LeafUnconstrainer):
            return _leaf_unconstrain(d)
        raise NotImplementedError(
            "IIDProduct of a tuple/named-structured base has a stacked-"
            "array sample per component, not n separate samples; build a "
            "Product of explicit copies instead"
        )
    if isinstance(d, ElementwiseProduct):
        # arraydist: per-element parameters broadcast along the block axis —
        # the inner leaf's dist/link carry (n,)-batched params that align
        # with the (..., n, ...) reshape every IIDUnconstrainer method
        # applies (scalar OR vector/matrix events: per-group Dirichlet/LKJ)
        if len(d.base.batch_shape) != 1:
            raise ValueError(
                "ElementwiseProduct needs a base with 1-D batch_shape; "
                f"got batch {d.base.batch_shape}"
            )
        inner = unconstrain(d.base)
        if not isinstance(inner, LeafUnconstrainer):
            raise NotImplementedError(
                "ElementwiseProduct of a non-leaf base is not supported"
            )
        return IIDUnconstrainer(inner, d.n)
    if isinstance(d, Product):
        return TreeUnconstrainer.build(tuple(unconstrain(c) for c in d.components))
    if isinstance(d, NamedProduct):
        return TreeUnconstrainer.build(
            tuple(unconstrain(c) for c in d.components), names=d.names
        )
    return _leaf_unconstrain(d)


def _leaf_unconstrain(d: Distribution) -> "LeafUnconstrainer":
    """The generic leaf construction (registry bijector + shape algebra)."""
    b = bijector(d)
    ev = tuple(int(s) for s in d.event_shape)
    ne_in = int(b.event_ndims_in)
    if ne_in == 0:
        linked = ev
    else:
        # bijector acts on the trailing ne_in dims of the event
        linked = ev[: len(ev) - ne_in] + tuple(
            b.forward_event_shape(ev[len(ev) - ne_in :])
        )
    kind = d.support.kind
    return LeafUnconstrainer(
        d,
        b,
        ev,
        linked,
        chol_pack=(kind == "chol_corr"),
        entangled=(kind in _ENTANGLED_KINDS),
    )


# -- module-level convenience API matching the reference's 8 generic functions


def vec_length(d: Distribution) -> int:
    return unconstrain(d).vec_length


def linked_vec_length(d: Distribution) -> int:
    return unconstrain(d).linked_vec_length


def to_vec(d: Distribution):
    u = unconstrain(d)
    return u.to_vec


def from_vec(d: Distribution):
    u = unconstrain(d)
    return u.from_vec


def to_linked_vec(d: Distribution):
    u = unconstrain(d)
    return u.to_linked_vec


def from_linked_vec(d: Distribution):
    u = unconstrain(d)
    return u.from_linked_vec


def optic_vec(d: Distribution):
    return unconstrain(d).optic_vec()


def linked_optic_vec(d: Distribution):
    return unconstrain(d).linked_optic_vec()
