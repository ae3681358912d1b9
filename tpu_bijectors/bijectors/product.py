"""Product / named-tuple bijectors.

Counterparts of /root/reference/src/bijectors/product_bijector.jl and
named_bijector.jl (NamedTransform, NamedCoupling). The reference's
@generated field-wise unrolling becomes trace-time Python loops over static
pytree structure (zero runtime cost under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass
from ..utils import sum_last
from .base import Bijector, Identity


@pytree_dataclass(meta_fields=("ndims",))
class ProductBijector(Bijector):
    """Apply ``bijectors[i...]`` over the leading `ndims` *event* axes of x:
    x event shape = stack_shape + inner_event_shape, bijectors is a nested
    tuple (pytree) with that stack shape (reference product_bijector.jl:18-55,
    which slices over trailing dims via eachslice — we use leading stack dims
    to match C-order batching).

    Homogeneous stacks should prefer a single Block'ed bijector instead;
    this type exists for *heterogeneous* per-slice bijectors.
    """

    bijectors: tuple  # flat tuple of bijectors, length = prod(stack_shape)
    stack_shape: tuple = ()
    ndims: int = 1

    def __post_init__(self):
        if not self.stack_shape:
            object.__setattr__(self, "stack_shape", (len(self.bijectors),))
        object.__setattr__(self, "ndims", len(self.stack_shape))

    @property
    def _inner_ndims(self):
        return self.bijectors[0].event_ndims_in

    @property
    def event_ndims_in(self):  # type: ignore[override]
        return self.ndims + self._inner_ndims

    @property
    def event_ndims_out(self):  # type: ignore[override]
        return self.ndims + self.bijectors[0].event_ndims_out

    def _apply(self, x, method):
        import numpy as np

        n = int(np.prod(self.stack_shape))
        stack_start = x.ndim - self.event_ndims_in
        batch = x.shape[:stack_start]
        inner = x.shape[stack_start + self.ndims :]
        xf = jnp.reshape(x, batch + (n,) + inner)
        ys, lds = [], []
        for i, b in enumerate(self.bijectors):
            xi = xf[(Ellipsis, i) + (slice(None),) * len(inner)]
            yi, ldi = getattr(b, method)(xi)
            if b.event_ndims_in == 0 and len(inner):
                ldi = sum_last(ldi, len(inner))
            ys.append(yi)
            lds.append(ldi)
        y = jnp.stack(ys, axis=len(batch))
        ld = sum(lds[1:], lds[0])
        out_inner = ys[0].shape[len(batch):]
        y = jnp.reshape(y, batch + tuple(self.stack_shape) + out_inner)
        return y, ld

    def forward_and_log_det(self, x):
        return self._apply(x, "forward_and_log_det")

    def inverse_and_log_det(self, y):
        return self._apply(y, "inverse_and_log_det")

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]

    def forward_event_shape(self, shape):
        inner = shape[self.ndims :]
        return tuple(shape[: self.ndims]) + tuple(
            self.bijectors[0].forward_event_shape(inner)
        )

    def inverse_event_shape(self, shape):
        inner = shape[self.ndims :]
        return tuple(shape[: self.ndims]) + tuple(
            self.bijectors[0].inverse_event_shape(inner)
        )


@pytree_dataclass(meta_fields=("keys",))
class NamedTransform(Bijector):
    """Dict-of-bijectors applied field-wise to dict inputs; untouched fields
    pass through (reference NamedTransform, named_bijector.jl:27-91).

    Input/output are dict pytrees; log-det is the scalar sum over fields
    (each field bijector must be Block'ed to produce batch-shaped log-dets;
    scalar bijectors are auto-summed over their field's full shape).
    """

    bijectors: tuple  # bijectors for self.keys, in order
    keys: tuple

    @classmethod
    def of(cls, **bij):
        keys = tuple(sorted(bij.keys()))
        return cls(tuple(bij[k] for k in keys), keys)

    def _map(self, x: dict, method):
        out = dict(x)
        ld = None
        for k, b in zip(self.keys, self.bijectors):
            yi, ldi = getattr(b, method)(x[k])
            if b.event_ndims_in == 0:
                ldi = jnp.sum(ldi)
            out[k] = yi
            ld = ldi if ld is None else ld + ldi
        if ld is None:
            ld = jnp.zeros(())
        return out, ld

    def forward_and_log_det(self, x):
        return self._map(x, "forward_and_log_det")

    def inverse_and_log_det(self, y):
        return self._map(y, "inverse_and_log_det")

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]


@pytree_dataclass(meta_fields=("target", "deps", "bij_fn"))
class NamedCoupling(Bijector):
    """x[target] transformed by a bijector constructed from x[deps...]
    (reference NamedCoupling, named_bijector.jl:96-154).

    `bij_fn(*dep_values) -> Bijector` is a static callable (trace-time).
    """

    target: str
    deps: tuple
    bij_fn: object  # callable

    def forward_and_log_det(self, x):
        b = self.bij_fn(*(x[d] for d in self.deps))
        y, ld = b.forward_and_log_det(x[self.target])
        if b.event_ndims_in == 0:
            ld = jnp.sum(ld)
        out = dict(x)
        out[self.target] = y
        return out, ld

    def inverse_and_log_det(self, y):
        b = self.bij_fn(*(y[d] for d in self.deps))
        xt, ld = b.inverse_and_log_det(y[self.target])
        if b.event_ndims_in == 0:
            ld = jnp.sum(ld)
        out = dict(y)
        out[self.target] = xt
        return out, ld

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]
