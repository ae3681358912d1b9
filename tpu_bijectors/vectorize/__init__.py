"""PPL-facing vectorization API (reference: src/vector/, SURVEY.md §2.5)."""

from .core import (
    IIDUnconstrainer,
    Optic,
    LeafUnconstrainer,
    TransformedUnconstrainer,
    TreeUnconstrainer,
    Unconstrainer,
    from_linked_vec,
    from_vec,
    linked_optic_vec,
    linked_vec_length,
    optic_vec,
    to_linked_vec,
    to_vec,
    unconstrain,
    vec_length,
)

__all__ = [
    "Optic",
    "Unconstrainer",
    "LeafUnconstrainer",
    "IIDUnconstrainer",
    "TreeUnconstrainer",
    "TransformedUnconstrainer",
    "unconstrain",
    "vec_length",
    "linked_vec_length",
    "to_vec",
    "from_vec",
    "to_linked_vec",
    "from_linked_vec",
    "optic_vec",
    "linked_optic_vec",
]
