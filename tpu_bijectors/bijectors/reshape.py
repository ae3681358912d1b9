"""Reshape and Permute bijectors.

Counterparts of /root/reference/src/bijectors/reshape.jl and permute.jl.
Permute uses a static gather instead of the reference's sparse matrix
multiply (permute.jl:84-153) — strictly cheaper on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..tree import pytree_dataclass
from .base import Bijector


@pytree_dataclass(meta_fields=("shape_in", "shape_out"))
class Reshape(Bijector):
    """Pure reshape of the event, logJ = 0 (reference reshape.jl:20-29)."""

    shape_in: tuple
    shape_out: tuple

    def __post_init__(self):
        if int(np.prod(self.shape_in)) != int(np.prod(self.shape_out)):
            raise ValueError(f"element count mismatch: {self.shape_in} vs {self.shape_out}")

    @property
    def event_ndims_in(self):  # type: ignore[override]
        return len(self.shape_in)

    @property
    def event_ndims_out(self):  # type: ignore[override]
        return len(self.shape_out)

    def forward_event_shape(self, shape):
        assert tuple(shape[len(shape) - len(self.shape_in) :]) == tuple(self.shape_in)
        return shape[: len(shape) - len(self.shape_in)] + tuple(self.shape_out)

    def inverse_event_shape(self, shape):
        return shape[: len(shape) - len(self.shape_out)] + tuple(self.shape_in)

    def forward_and_log_det(self, x):
        batch = x.shape[: x.ndim - len(self.shape_in)]
        y = jnp.reshape(x, batch + tuple(self.shape_out))
        return y, jnp.zeros(batch, jnp.result_type(x, float))

    def inverse_and_log_det(self, y):
        batch = y.shape[: y.ndim - len(self.shape_out)]
        x = jnp.reshape(y, batch + tuple(self.shape_in))
        return x, jnp.zeros(batch, jnp.result_type(y, float))

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]

    def _self_inverse(self):
        return Reshape(self.shape_out, self.shape_in)


@pytree_dataclass(meta_fields=("perm",))
class Permute(Bijector):
    """y = x[perm] along the event axis; logJ = 0 (reference permute.jl)."""

    perm: tuple

    event_ndims_in = 1
    event_ndims_out = 1

    def __post_init__(self):
        perm = tuple(int(p) for p in self.perm)
        if sorted(perm) != list(range(len(perm))):
            raise ValueError(f"not a permutation: {perm}")
        object.__setattr__(self, "perm", perm)

    # the reference's other constructor forms (permute.jl:84-153)

    @classmethod
    def from_matrix(cls, A) -> "Permute":
        """From a 0/1 permutation matrix: y = A @ x."""
        A = np.asarray(A)
        n = A.shape[0]
        if (
            A.shape != (n, n)
            or not np.all((A == 0) | (A == 1))
            or not np.array_equal(A @ A.T, np.eye(n))
        ):
            raise ValueError("not a permutation matrix")
        # y[i] = x[j] where A[i, j] == 1
        return cls(tuple(int(np.argmax(A[i])) for i in range(n)))

    @classmethod
    def from_pairs(cls, n: int, mapping) -> "Permute":
        """From src->dst pairs, unmentioned indices fixed: Permute(2, {0: 1, 1: 0})
        (the reference's `Permute(2, 1 => 2, 2 => 1)` form, permute.jl:102-123,
        0-based here)."""
        mapping = dict(mapping)
        srcs, dsts = list(mapping.keys()), list(mapping.values())
        if len(set(srcs)) != len(srcs) or len(set(dsts)) != len(dsts) or set(
            srcs
        ) != set(dsts):
            raise ValueError(f"non-bijective index mapping: {mapping}")
        # y[dst] = x[src]  =>  perm[dst] = src
        perm = list(range(n))
        for s, t in mapping.items():
            perm[int(t)] = int(s)
        return cls(tuple(perm))

    @classmethod
    def from_destinations(cls, dests) -> "Permute":
        """From a destinations vector: y[dests[i]] = x[i] — the reference's
        `Permute(indices::AbstractVector)` scatter convention
        (permute.jl:90-100). The main constructor here is the gather form
        y = x[perm]; this converts."""
        dests = [int(d) for d in dests]
        if sorted(dests) != list(range(len(dests))):
            raise ValueError(f"not a permutation: {dests}")
        perm = [0] * len(dests)
        for src, dst in enumerate(dests):
            perm[dst] = src
        return cls(tuple(perm))

    @classmethod
    def from_vector_pairs(cls, n: int, *pairs) -> "Permute":
        """From (srcs, dsts) vector pairs, unmentioned indices fixed — the
        reference's `Permute(n, [1,2] => [2,1], ...)` form
        (permute.jl:125-153, 0-based here)."""
        mapping = {}
        for srcs, dsts in pairs:
            if len(srcs) != len(dsts):
                raise ValueError(f"{srcs} => {dsts} is not bijective")
            for s, t in zip(srcs, dsts):
                if int(s) in mapping:
                    raise ValueError(f"source {s} used more than once")
                mapping[int(s)] = int(t)
        return cls.from_pairs(n, mapping)

    @property
    def _inv_perm(self):
        inv = np.argsort(np.asarray(self.perm))
        return tuple(int(i) for i in inv)

    def forward_and_log_det(self, x):
        y = x[..., jnp.asarray(self.perm)]
        return y, jnp.zeros(x.shape[:-1], jnp.result_type(x, float))

    def inverse_and_log_det(self, y):
        x = y[..., jnp.asarray(self._inv_perm)]
        return x, jnp.zeros(y.shape[:-1], jnp.result_type(y, float))

    def forward(self, x):
        return x[..., jnp.asarray(self.perm)]

    def inverse(self, y):
        return y[..., jnp.asarray(self._inv_perm)]

    def _self_inverse(self):
        return Permute(self._inv_perm)
