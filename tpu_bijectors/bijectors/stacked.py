"""Stacked bijector: apply different bijectors to static slices of a vector.

TPU-native counterpart of /root/reference/src/bijectors/stacked.jl. The
reference uses @generated type-stable unrolling (stacked.jl:129-145,204-231);
here the block structure is plain Python unrolled at trace time — XLA sees
static slices + concatenation and fuses the whole thing (SURVEY.md §3.3).

Ranges are the natural sharding boundary if the parameter vector is sharded
(SURVEY.md §2.2); blocks are static (start, length) pairs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..tree import pytree_dataclass
from ..utils import sum_last
from .base import Bijector


def _output_ranges(bijectors, ranges_in):
    """Derive output ranges from per-block output lengths
    (reference `output_length` logic, stacked.jl:51-87)."""
    out = []
    ofs = 0
    for b, (s, l) in zip(bijectors, ranges_in):
        if b.event_ndims_in == 0:
            lo = l
        else:
            lo = b.forward_event_shape((l,))[0]
        out.append((ofs, lo))
        ofs += lo
    return tuple(out), ofs


@pytree_dataclass(meta_fields=("ranges_in", "ranges_out", "length_in", "length_out"))
class Stacked(Bijector):
    """Apply ``bijectors[i]`` to ``x[ranges_in[i]]`` and concatenate
    (reference Stacked). Ranges are static (start, length) tuples covering
    the input; scalar bijectors are applied elementwise over their slice.
    """

    bijectors: tuple
    ranges_in: tuple  # ((start, len), ...)
    ranges_out: tuple = None  # type: ignore[assignment]
    length_in: int = None  # type: ignore[assignment]
    length_out: int = None  # type: ignore[assignment]

    event_ndims_in = 1
    event_ndims_out = 1

    def __post_init__(self):
        ranges_in = tuple((int(s), int(l)) for s, l in self.ranges_in)
        object.__setattr__(self, "ranges_in", ranges_in)
        if self.ranges_out is None:
            ro, total_out = _output_ranges(self.bijectors, ranges_in)
            object.__setattr__(self, "ranges_out", ro)
            object.__setattr__(self, "length_out", total_out)
        if self.length_in is None:
            object.__setattr__(
                self, "length_in", max(s + l for s, l in ranges_in) if ranges_in else 0
            )
        if self.length_out is None:
            object.__setattr__(
                self,
                "length_out",
                max(s + l for s, l in self.ranges_out) if self.ranges_out else 0,
            )

    @classmethod
    def from_lengths(cls, bijectors, lengths):
        """Construct from contiguous block lengths."""
        ranges = []
        ofs = 0
        for l in lengths:
            ranges.append((ofs, int(l)))
            ofs += int(l)
        return cls(tuple(bijectors), tuple(ranges))

    def forward_event_shape(self, shape):
        assert shape[-1] == self.length_in, (shape, self.length_in)
        return shape[:-1] + (self.length_out,)

    def inverse_event_shape(self, shape):
        assert shape[-1] == self.length_out, (shape, self.length_out)
        return shape[:-1] + (self.length_in,)

    def _check_in(self, x):
        if x.shape[-1] != self.length_in:
            raise ValueError(
                f"Stacked input length {x.shape[-1]} != expected {self.length_in}"
            )

    def forward_and_log_det(self, x):
        self._check_in(x)
        ys, ld = [], None
        for b, (s, l) in zip(self.bijectors, self.ranges_in):
            xi = x[..., s : s + l]
            yi, ldi = b.forward_and_log_det(xi)
            if b.event_ndims_in == 0:
                ldi = sum_last(ldi, 1)
            ys.append(yi)
            ld = ldi if ld is None else ld + ldi
        return jnp.concatenate(ys, axis=-1), ld

    def forward(self, x):
        self._check_in(x)
        ys = [
            b.forward(x[..., s : s + l])
            for b, (s, l) in zip(self.bijectors, self.ranges_in)
        ]
        return jnp.concatenate(ys, axis=-1)

    def inverse_and_log_det(self, y):
        xs, ld = [], None
        for b, (s, l) in zip(self.bijectors, self.ranges_out):
            yi = y[..., s : s + l]
            xi, ldi = b.inverse_and_log_det(yi)
            if b.event_ndims_in == 0:
                ldi = sum_last(ldi, 1)
            xs.append(xi)
            ld = ldi if ld is None else ld + ldi
        return jnp.concatenate(xs, axis=-1), ld

    def inverse(self, y):
        xs = [
            b.inverse(y[..., s : s + l])
            for b, (s, l) in zip(self.bijectors, self.ranges_out)
        ]
        return jnp.concatenate(xs, axis=-1)
