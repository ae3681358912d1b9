"""General linear-map bijector (the reference's matrix-`a` Scale,
src/bijectors/scale.jl:13-36: `a*x` with logabsdet(a), inverse via `a\\y`).

All products/solves run at HIGHEST precision: TPU f32 matmuls default to
bf16-precision MXU inputs (~1e-3 relative error), which breaks round-trip
invertibility (measured 0.08 absolute error at d=8 before pinning)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass
from .base import Bijector


@pytree_dataclass
class LinearMap(Bijector):
    """y = A @ x for an invertible (d, d) matrix A; log|J| = logabsdet(A).

    The (fixed) factorization work is done per call; for repeated use inside
    samplers prefer `TriangularLinearMap` below (solve instead of inverse).
    """

    A: jax.Array

    event_ndims_in = 1
    event_ndims_out = 1

    def forward_and_log_det(self, x):
        y = jnp.einsum(
            "ij,...j->...i", self.A, x, precision=jax.lax.Precision.HIGHEST
        )
        sign, logdet = jnp.linalg.slogdet(self.A)
        return y, jnp.broadcast_to(logdet, x.shape[:-1])

    def forward(self, x):
        return jnp.einsum(
            "ij,...j->...i", self.A, x, precision=jax.lax.Precision.HIGHEST
        )

    def inverse_and_log_det(self, y):
        x = self.inverse(y)
        sign, logdet = jnp.linalg.slogdet(self.A)
        return x, jnp.broadcast_to(-logdet, y.shape[:-1])

    def inverse(self, y):
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.solve(self.A, y[..., None])[..., 0]


@pytree_dataclass(meta_fields=("lower",))
class TriangularLinearMap(Bijector):
    """y = T @ x with T triangular: O(d^2) solve, logdet from the diagonal."""

    T: jax.Array
    lower: bool = True

    event_ndims_in = 1
    event_ndims_out = 1

    def _t(self):
        return jnp.tril(self.T) if self.lower else jnp.triu(self.T)

    def forward_and_log_det(self, x):
        T = self._t()
        y = jnp.einsum("ij,...j->...i", T, x, precision=jax.lax.Precision.HIGHEST)
        ld = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(T))))
        return y, jnp.broadcast_to(ld, x.shape[:-1])

    def forward(self, x):
        return jnp.einsum(
            "ij,...j->...i", self._t(), x, precision=jax.lax.Precision.HIGHEST
        )

    def inverse_and_log_det(self, y):
        T = self._t()
        rhs = y[..., None]
        Tb = jnp.broadcast_to(T, rhs.shape[:-2] + T.shape[-2:])
        with jax.default_matmul_precision("highest"):
            x = jax.scipy.linalg.solve_triangular(Tb, rhs, lower=self.lower)[..., 0]
        ld = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(T))))
        return x, jnp.broadcast_to(-ld, y.shape[:-1])

    def inverse(self, y):
        return self.inverse_and_log_det(y)[0]
