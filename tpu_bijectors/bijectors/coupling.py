"""RealNVP-style coupling bijector + PartitionMask.

TPU-native counterpart of /root/reference/src/bijectors/coupling.jl. The
reference partitions with sparse 0/1 matrix multiplies (coupling.jl:51-134);
here partition/combine are static gathers/scatters — free on TPU (fused).

Coupling(theta, mask): y_1 = theta(x_2)(x_1), x_2 and x_3 pass through
(coupling.jl:206-259); log-det comes from the inner bijector on x_1 only.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..tree import pytree_dataclass
from .base import Bijector


@pytree_dataclass(meta_fields=("n", "idx1", "idx2", "idx3"))
class PartitionMask:
    """Static 3-way partition of a length-n vector (reference PartitionMask).

    idx1: indices transformed; idx2: conditioner inputs; idx3: passthrough.
    Unspecified index sets are inferred as the complement, matching the
    reference's constructors (coupling.jl:63-117).
    """

    n: int
    idx1: tuple
    idx2: tuple = None  # type: ignore[assignment]
    idx3: tuple = None  # type: ignore[assignment]

    def __post_init__(self):
        idx1 = tuple(int(i) for i in self.idx1)
        object.__setattr__(self, "idx1", idx1)
        all_idx = set(range(self.n))
        if self.idx2 is None and self.idx3 is None:
            idx2 = tuple(sorted(all_idx - set(idx1)))
            idx3 = ()
        elif self.idx2 is None:
            idx3 = tuple(int(i) for i in self.idx3)
            idx2 = tuple(sorted(all_idx - set(idx1) - set(idx3)))
        elif self.idx3 is None:
            idx2 = tuple(int(i) for i in self.idx2)
            idx3 = tuple(sorted(all_idx - set(idx1) - set(idx2)))
        else:
            idx2 = tuple(int(i) for i in self.idx2)
            idx3 = tuple(int(i) for i in self.idx3)
        object.__setattr__(self, "idx2", idx2)
        object.__setattr__(self, "idx3", idx3)

    def partition(self, x):
        return (
            x[..., np.asarray(self.idx1, np.int32)] if self.idx1 else x[..., :0],
            x[..., np.asarray(self.idx2, np.int32)] if self.idx2 else x[..., :0],
            x[..., np.asarray(self.idx3, np.int32)] if self.idx3 else x[..., :0],
        )

    def combine(self, x1, x2, x3):
        out = jnp.zeros(
            jnp.broadcast_shapes(x1.shape[:-1], x2.shape[:-1], x3.shape[:-1])
            + (self.n,),
            dtype=jnp.result_type(x1, x2, x3),
        )
        if self.idx1:
            out = out.at[..., np.asarray(self.idx1, np.int32)].set(x1)
        if self.idx2:
            out = out.at[..., np.asarray(self.idx2, np.int32)].set(x2)
        if self.idx3:
            out = out.at[..., np.asarray(self.idx3, np.int32)].set(x3)
        return out


@pytree_dataclass(meta_fields=("theta", "mask"))
class Coupling(Bijector):
    """Coupling layer: b = theta(x_2); y_1 = b(x_1) (reference Coupling).

    `theta` is a static callable (conditioner network) mapping the x_2 block
    to a Bijector acting on the x_1 block; its trainable parameters, if any,
    should live in a closure pytree passed via `params` (data field) and
    consumed as `theta(params, x2)`. For the parameterless reference-style
    usage, `theta(x2)` with params=None.
    """

    theta: object
    mask: PartitionMask
    params: object = None

    event_ndims_in = 1
    event_ndims_out = 1

    def _inner(self, x2):
        if self.params is None:
            return self.theta(x2)
        return self.theta(self.params, x2)

    def forward_and_log_det(self, x):
        x1, x2, x3 = self.mask.partition(x)
        b = self._inner(x2)
        y1, ld = b.forward_and_log_det(x1)
        if b.event_ndims_in == 0:
            ld = jnp.sum(ld, axis=-1)
        return self.mask.combine(y1, x2, x3), ld

    def inverse_and_log_det(self, y):
        y1, y2, y3 = self.mask.partition(y)
        b = self._inner(y2)
        x1, ld = b.inverse_and_log_det(y1)
        if b.event_ndims_in == 0:
            ld = jnp.sum(ld, axis=-1)
        return self.mask.combine(x1, y2, y3), ld

    def forward(self, x):
        return self.forward_and_log_det(x)[0]

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]
