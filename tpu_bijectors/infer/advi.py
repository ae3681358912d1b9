"""ADVI: automatic differentiation variational inference in unconstrained
space, with mean-field / full-rank Gaussian or normalizing-flow posteriors
(net-new vs the reference; mirrors the docs/src/advi.md + flows.md usage).

The variational family lives on the flat unconstrained vector given by the
vectorize layer; the ELBO is

    E_q[ logp(from_linked(v)) + logdetJ(v) ] + H[q]

estimated with reparameterized Monte-Carlo samples. MC samples are the
data-parallel axis: one fused (n_mc, dim) batch per step, shardable across
chips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..bijectors.base import Bijector, Chain
from ..tree import pytree_dataclass


@pytree_dataclass
class MeanFieldGaussian:
    """q(v) = N(loc, diag(exp(log_scale)^2)); entropy closed-form."""

    loc: jax.Array
    log_scale: jax.Array

    @classmethod
    def init(cls, dim: int, dtype=jnp.float32):
        return cls(jnp.zeros(dim, dtype), jnp.full(dim, -1.0, dtype))

    def sample(self, key, n: int):
        eps = jax.random.normal(key, (n,) + self.loc.shape, self.loc.dtype)
        return self.loc + jnp.exp(self.log_scale) * eps

    def sample_t(self, key, n: int):
        """(dim, n) draws — MC samples on the 128-wide lane axis, the
        orientation the whole-model fused kernels want."""
        eps = jax.random.normal(key, self.loc.shape + (n,), self.loc.dtype)
        return self.loc[:, None] + jnp.exp(self.log_scale)[:, None] * eps

    def entropy(self):
        d = self.loc.shape[-1]
        return jnp.sum(self.log_scale) + 0.5 * d * (1.0 + jnp.log(2.0 * jnp.pi))

    def logdensity(self, v):
        """Normalized log q(v) (leading batch axes ok) — makes the fitted
        posterior usable as a bridge-sampling / importance proposal."""
        d = self.loc.shape[-1]
        z = (jnp.asarray(v) - self.loc) * jnp.exp(-self.log_scale)
        return (
            -0.5 * jnp.sum(z * z, -1)
            - jnp.sum(self.log_scale)
            - 0.5 * d * jnp.log(2.0 * jnp.pi)
        )


@pytree_dataclass
class FullRankGaussian:
    """q(v) = N(loc, L L^T) with L lower-triangular (log-diag parameterized)."""

    loc: jax.Array
    tril_raw: jax.Array  # (dim, dim); diag passed through softplus-ish exp

    @classmethod
    def init(cls, dim: int, dtype=jnp.float32):
        return cls(jnp.zeros(dim, dtype), -1.0 * jnp.eye(dim, dtype=dtype))

    def _L(self):
        dim = self.loc.shape[-1]
        eye = jnp.eye(dim, dtype=self.loc.dtype)
        L = jnp.tril(self.tril_raw, -1) + eye * jnp.exp(
            jnp.diagonal(self.tril_raw)
        )
        return L

    def sample(self, key, n: int):
        eps = jax.random.normal(key, (n,) + self.loc.shape, self.loc.dtype)
        return self.loc + eps @ self._L().T

    def sample_t(self, key, n: int):
        """(dim, n) draws (see MeanFieldGaussian.sample_t)."""
        eps = jax.random.normal(key, self.loc.shape + (n,), self.loc.dtype)
        return self.loc[:, None] + self._L() @ eps

    def entropy(self):
        d = self.loc.shape[-1]
        return jnp.sum(jnp.diagonal(self.tril_raw)) + 0.5 * d * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )

    def logdensity(self, v):
        """Normalized log q(v) (leading batch axes ok; one triangular
        solve) — bridge-sampling / importance proposal support."""
        from jax.scipy.linalg import solve_triangular

        d = self.loc.shape[-1]
        l_mat = self._L()
        diff = jnp.asarray(v) - self.loc
        u = solve_triangular(
            l_mat, diff.reshape(-1, d).T, lower=True
        ).T.reshape(diff.shape)
        return (
            -0.5 * jnp.sum(u * u, -1)
            - jnp.sum(jnp.diagonal(self.tril_raw))
            - 0.5 * d * jnp.log(2.0 * jnp.pi)
        )


@pytree_dataclass
class FlowPosterior:
    """q = flow(N(0, I)): reparameterized samples are base draws pushed through
    the (trainable) flow; entropy term uses the flow's forward log-det
    (training never needs the iterative inverse — SURVEY.md §3.5)."""

    flow: Bijector  # trainable pytree, event_ndims 1

    def sample_with_logq(self, key, n: int, dim: int):
        dtype = jax.tree_util.tree_leaves(self.flow)[0].dtype
        z = jax.random.normal(key, (n, dim), dtype)
        logq0 = -0.5 * jnp.sum(z * z, -1) - 0.5 * dim * jnp.log(2.0 * jnp.pi)
        v, ld = self.flow.forward_and_log_det(z)
        return v, logq0 - ld


class ADVIResult(NamedTuple):
    q: object
    losses: jax.Array


def fit_advi(
    logdensity_fn,
    key,
    dim: int,
    q=None,
    n_steps: int = 1000,
    n_mc: int = 32,
    learning_rate: float = 1e-2,
    optimizer=None,
    dtype=jnp.float32,
    transposed: bool = False,
    estimator: str = "elbo",
    n_iw: int = 8,
    axis_name: str = None,
    n_dev: int = 1,
) -> ADVIResult:
    """Maximize the ELBO with Adam; whole loop is one lax.scan under jit.

    transposed=True draws the MC samples directly in the (dim, n_mc)
    orientation (sample_t) and requires a batch-capable logdensity_fn
    mapping (dim, n) -> (n,) (e.g. Model.batched_logdensity_t_fn): for
    eligible priors the ELBO's density term and its backward pass each run
    as ONE whole-model Pallas kernel per step. Gaussian families only
    (flows operate on trailing event axes).

    estimator='stl' uses the sticking-the-landing path-derivative gradient
    (Roeder, Wu & Duvenaud 2017): the entropy term is evaluated as
    -log q_{stop(φ)}(v) at the reparameterized draw v, dropping the score
    term whose expectation is zero but whose variance is not. The
    per-sample gradient vanishes IDENTICALLY when q matches the target, so
    late-stage optimization stops jittering around the optimum. Gaussian
    families only (a flow's stopped-parameter logq needs its iterative
    inverse in the hot loop).

    estimator='iwelbo' maximizes the importance-weighted bound (Burda,
    Grosse & Salakhutdinov 2016): each of the n_mc terms averages n_iw
    weights inside the log, giving a bound that is tighter than the ELBO
    and monotone in n_iw — the fitted q approximates a POSTERIOR-coverage
    proposal rather than a mode-seeking one. Works for Gaussian AND flow
    families (n_mc*n_iw draws per step, one batched density call).

    axis_name/n_dev (internal; set by shard.chain_parallel_advi): run the
    step INSIDE a shard_map over a mesh axis of n_dev devices — each device
    draws the identical full MC batch from the replicated per-step key,
    evaluates the target density only on its n_mc/n_dev slice, and the
    ELBO value and gradient are pmean'd over the axis inside the jitted
    step (the same in-step-collective design as chain_parallel_nuts)."""
    if q is None:
        q = MeanFieldGaussian.init(dim, dtype)
    opt = optimizer or optax.adam(learning_rate)

    from .model import as_batched

    if estimator not in ("elbo", "stl", "iwelbo"):
        raise ValueError(f"unknown estimator {estimator!r}")
    if estimator == "stl" and isinstance(q, FlowPosterior):
        raise ValueError("estimator='stl' supports Gaussian families only")
    if estimator == "iwelbo" and transposed:
        raise ValueError("estimator='iwelbo' does not support transposed=True")
    if transposed:
        if isinstance(q, FlowPosterior):
            raise ValueError("transposed=True supports Gaussian families only")
        if not getattr(logdensity_fn, "batch_capable", False):
            raise ValueError(
                "transposed=True requires a batch-capable log density "
                "mapping (dim, n) -> (n,) (e.g. Model.batched_logdensity_t_fn)"
            )
    blogp = as_batched(logdensity_fn)

    if axis_name is not None and n_mc % n_dev:
        raise ValueError(f"n_mc={n_mc} not divisible by mesh size {n_dev}")

    def _local(a, axis=0):
        # every device draws the identical full MC batch (the per-step key
        # is replicated); the density only ever sees this device's slice
        if axis_name is None:
            return a
        n_loc = a.shape[axis] // n_dev
        idx = jax.lax.axis_index(axis_name)
        return jax.lax.dynamic_slice_in_dim(a, idx * n_loc, n_loc, axis)

    def neg_elbo(q, key):
        if estimator == "iwelbo":
            if isinstance(q, FlowPosterior):
                v, logq = q.sample_with_logq(key, n_mc * n_iw, dim)
            else:
                v = q.sample(key, n_mc * n_iw)
                logq = q.logdensity(v)
            # contiguous row slices keep whole n_iw groups on one device
            logw = (blogp(_local(v)) - _local(logq)).reshape(-1, n_iw)
            from jax.scipy.special import logsumexp

            return -jnp.mean(logsumexp(logw, axis=1) - jnp.log(float(n_iw)))
        if isinstance(q, FlowPosterior):
            v, logq = q.sample_with_logq(key, n_mc, dim)
            return -jnp.mean(blogp(_local(v)) - _local(logq))
        if transposed:
            v = _local(q.sample_t(key, n_mc), axis=1)
        else:
            v = _local(q.sample(key, n_mc))
        if estimator == "stl":
            q_stop = jax.lax.stop_gradient(q)
            vb = jnp.swapaxes(v, 0, 1) if transposed else v
            return -jnp.mean(blogp(v) - q_stop.logdensity(vb))
        return -(jnp.mean(blogp(v)) + q.entropy())

    opt_state = opt.init(q)

    def step(carry, key):
        q, opt_state = carry
        loss, g = jax.value_and_grad(neg_elbo)(q, key)
        if axis_name is not None:
            # mean-of-device-means == global mean (equal slice sizes); one
            # tiny pmean of (loss, grad pytree) per step, inside the jit
            loss, g = jax.lax.pmean((loss, g), axis_name)
        updates, opt_state = opt.update(g, opt_state, q)
        q = optax.apply_updates(q, updates)
        return (q, opt_state), loss

    keys = jax.random.split(key, n_steps)
    (q, _), losses = jax.lax.scan(step, (q, opt_state), keys)
    return ADVIResult(q, losses)
