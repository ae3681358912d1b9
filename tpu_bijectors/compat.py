"""Classic-interface functional aliases.

The reference exposes a function-style interface (`transform(b, x)`,
`with_logabsdet_jacobian`, `logabsdetjac`, `logabsdetjacinv`, `isinvertible`,
`isclosedform`, `output_size`, `columnwise` — export list at
/root/reference/src/Bijectors.jl:49-87). Our native surface is method-style
(`b.forward(x)`, ...); these thin wrappers give users of the reference the
names they know, one-to-one.
"""

from __future__ import annotations

from .bijectors.base import Bijector, Block, Invert


def transform(b, x):
    """reference `transform(b, x)` == b.forward(x)."""
    return b.forward(x)


def with_logabsdet_jacobian(b, x):
    """reference `with_logabsdet_jacobian(b, x)` (ChangesOfVariables)."""
    return b.forward_and_log_det(x)


def logabsdetjac(b, x):
    """reference `logabsdetjac(b, x)`."""
    return b.forward_and_log_det(x)[1]


def logabsdetjacinv(b, y):
    """reference `logabsdetjacinv(b, y)` == logabsdetjac(inverse(b), y)."""
    return b.inverse_and_log_det(y)[1]


def isinvertible(b) -> bool:
    """reference `isinvertible` — all Bijector subclasses are invertible
    (src/interface.jl:271-273); non-bijective Transforms would not subclass."""
    return isinstance(b, (Bijector, Invert))


def isclosedform(b) -> bool:
    """reference `isclosedform` (src/interface.jl:231): False only when an
    iterative inverse (Invert(PlanarLayer)) appears anywhere in the
    transform — recursing through compositions/wrappers like the reference's
    conjunctive ComposedFunction rule (src/bijectors/composed.jl:1-2)."""
    from .bijectors.base import Block, Chain

    if isinstance(b, Invert):
        return bool(getattr(b.bijector, "closed_form_inverse", True))
    if isinstance(b, Chain):
        return all(isclosedform(t) for t in b.transforms)
    if isinstance(b, Block):
        return isclosedform(b.bijector)
    return True


def output_size(b, input_shape):
    """reference `output_size(f, sz)` (src/interface.jl:85-105)."""
    return tuple(b.forward_event_shape(tuple(input_shape)))


def columnwise(b) -> Block:
    """reference `columnwise(f)`: apply a vector bijector to each column.

    In our convention batch dims lead, so a column-batched matrix is
    (..., n_cols, n_rows) and `Block(b, 1)` applies `b` per trailing vector —
    the same semantics with the batch axis in the JAX-native position.
    """
    return Block(b, 1)
