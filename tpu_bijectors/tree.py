"""Pytree-dataclass machinery.

Every bijector / distribution in this framework is a frozen dataclass registered
as a JAX pytree, so that:

  * trainable parameters (flow layers, Shift/Scale/Logit, ...) are reachable by
    ``jax.grad`` / ``optax`` (the reference relies on ``Functors.@functor`` for
    this, e.g. /root/reference/src/bijectors/planar_layer.jl:31);
  * bijectors can be passed through ``jit`` boundaries as arguments;
  * static structure (shapes, modes, python ints) lives in ``meta_fields`` and
    participates in trace-time dispatch with zero runtime cost.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls: type | None = None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are static (hashed into the jit cache key); everything else
    is a traced leaf/subtree.
    """

    def wrap(c: type[_T]) -> type[_T]:
        c = dataclasses.dataclass(frozen=True, repr=False)(c)
        names = [f.name for f in dataclasses.fields(c)]
        bad = set(meta_fields) - set(names)
        if bad:
            raise ValueError(f"meta_fields {bad} not fields of {c.__name__}")
        data = tuple(n for n in names if n not in meta_fields)
        jax.tree_util.register_dataclass(
            c, data_fields=data, meta_fields=tuple(meta_fields)
        )

        def _eq(self, other) -> bool:
            # Value equality with array-aware leaf comparison (the reference
            # defines `==` per bijector, e.g. permute.jl:88 and
            # test/bijectors/equality.jl; dataclass-default == raises on
            # array-valued fields because `a == b` is elementwise).
            if type(self) is not type(other):
                return NotImplemented
            import numpy as _np

            def is_arr(v):
                return hasattr(v, "shape") and hasattr(v, "dtype")

            for f in dataclasses.fields(self):
                v1, v2 = getattr(self, f.name), getattr(other, f.name)
                if is_arr(v1) or is_arr(v2):
                    a1, a2 = _np.asarray(v1), _np.asarray(v2)
                    if a1.shape != a2.shape or not _np.array_equal(a1, a2):
                        return False
                elif v1 != v2:
                    return False
            return True

        def _repr(self) -> str:  # compact repr that doesn't print huge arrays
            parts = []
            for f in dataclasses.fields(self):
                v = getattr(self, f.name)
                if hasattr(v, "shape") and hasattr(v, "dtype") and v.shape != ():
                    parts.append(f"{f.name}=<{v.dtype}{list(v.shape)}>")
                else:
                    parts.append(f"{f.name}={v!r}")
            return f"{type(self).__name__}({', '.join(parts)})"

        c.__repr__ = _repr
        c.__eq__ = _eq
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def field(**kwargs):
    return dataclasses.field(**kwargs)


def replace(obj: _T, **changes) -> _T:
    return dataclasses.replace(obj, **changes)
