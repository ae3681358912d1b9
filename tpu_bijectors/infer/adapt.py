"""Warmup adaptation: dual-averaging step size + windowed Welford diagonal
mass matrix (Stan-style schedule), with cross-chain/cross-device sharing.

All adaptation statistics are averaged over the chain axis INSIDE the jitted
step — across vmapped chains by a plain mean, and across devices by `pmean`
over `axis_name` when running under shard_map/pmap. No host synchronization
(SURVEY.md §7: ">=85% scaling requires avoiding host-synchronous adaptation").
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Dual averaging step size (Hoffman & Gelman 2014, Nesterov 2009);
# mu (the shrinkage point log(10*eps0)) is carried explicitly in the state
# so the update is closure-free and jit-stable.
# ---------------------------------------------------------------------------


class StepSizeAdaptState(NamedTuple):
    log_eps: jax.Array
    log_eps_bar: jax.Array
    h_bar: jax.Array
    mu: jax.Array
    step: jax.Array


def stepsize_init(eps0: float, dtype=jnp.float64) -> StepSizeAdaptState:
    return StepSizeAdaptState(
        jnp.asarray(math.log(eps0), dtype),
        jnp.asarray(math.log(eps0), dtype),
        jnp.asarray(0.0, dtype),
        jnp.asarray(math.log(10.0 * eps0), dtype),
        jnp.asarray(0, jnp.int32),
    )


def stepsize_update(
    s: StepSizeAdaptState,
    accept_prob,
    target: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> StepSizeAdaptState:
    dtype = s.log_eps.dtype
    t = s.step + 1
    tf = t.astype(dtype)
    eta_h = 1.0 / (tf + t0)
    h_bar = (1.0 - eta_h) * s.h_bar + eta_h * (target - accept_prob)
    log_eps = s.mu - jnp.sqrt(tf) / gamma * h_bar
    eta = tf ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * s.log_eps_bar
    return StepSizeAdaptState(log_eps, log_eps_bar, h_bar, s.mu, t)


# ---------------------------------------------------------------------------
# Welford accumulator for the diagonal mass matrix
# ---------------------------------------------------------------------------


class WelfordState(NamedTuple):
    count: jax.Array
    mean: jax.Array
    m2: jax.Array


def welford_init(dim: int, dtype=jnp.float64) -> WelfordState:
    return WelfordState(
        jnp.asarray(0.0, dtype), jnp.zeros(dim, dtype), jnp.zeros(dim, dtype)
    )


def welford_update(s: WelfordState, x) -> WelfordState:
    count = s.count + 1.0
    delta = x - s.mean
    mean = s.mean + delta / count
    m2 = s.m2 + delta * (x - s.mean)  # uses old mean: delta * (x - new_mean)
    return WelfordState(count, mean, m2)


def welford_update_batch(s: WelfordState, xs, axis_name: str | None = None):
    """Fold a whole (chains, dim) batch in, sharing across chains (and across
    devices via pmean when `axis_name` is set)."""
    n_local = xs.shape[0]
    mean_b = jnp.mean(xs, axis=0)
    m2_b = jnp.sum((xs - mean_b) ** 2, axis=0)
    n = jnp.asarray(float(n_local), s.mean.dtype)
    if axis_name is not None:
        n_dev = jax.lax.psum(1, axis_name)
        mean_b = jax.lax.pmean(mean_b, axis_name)
        m2_b = jax.lax.psum(m2_b, axis_name)  # within-device spread summed
        # between-device mean spread is ignored at this granularity; chains
        # are iid so pmean of means is the global mean estimator
        n = n * n_dev
    # Chan et al. parallel combine
    count = s.count + n
    delta = mean_b - s.mean
    mean = s.mean + delta * (n / count)
    m2 = s.m2 + m2_b + delta * delta * (s.count * n / count)
    return WelfordState(count, mean, m2)


def welford_variance(s: WelfordState, regularize: bool = True):
    var = s.m2 / jnp.maximum(s.count - 1.0, 1.0)
    if regularize:
        # Stan's shrinkage toward unit metric
        w = s.count / (s.count + 5.0)
        var = w * var + (1.0 - w) * 1e-3 * jnp.ones_like(var)
    return var


# ---------------------------------------------------------------------------
# Welford accumulator for the DENSE mass matrix (Stan's dense_e metric)
# ---------------------------------------------------------------------------


def welford_cov_init(dim: int, dtype=jnp.float64) -> WelfordState:
    """Same WelfordState shape with an (dim, dim) m2 (outer-product sums)."""
    return WelfordState(
        jnp.asarray(0.0, dtype), jnp.zeros(dim, dtype), jnp.zeros((dim, dim), dtype)
    )


def welford_cov_update_batch(s: WelfordState, xs, axis_name: str | None = None):
    """Fold a (chains, dim) batch into the covariance accumulator (Chan et al.
    pairwise combine), cross-device via pmean/psum like the diagonal version."""
    n_local = xs.shape[0]
    mean_b = jnp.mean(xs, axis=0)
    c = xs - mean_b
    m2_b = c.T @ c
    n = jnp.asarray(float(n_local), s.mean.dtype)
    if axis_name is not None:
        n_dev = jax.lax.psum(1, axis_name)
        mean_b = jax.lax.pmean(mean_b, axis_name)
        m2_b = jax.lax.psum(m2_b, axis_name)
        n = n * n_dev
    count = s.count + n
    delta = mean_b - s.mean
    mean = s.mean + delta * (n / count)
    m2 = s.m2 + m2_b + jnp.outer(delta, delta) * (s.count * n / count)
    return WelfordState(count, mean, m2)


def welford_covariance(s: WelfordState, regularize: bool = True):
    cov = s.m2 / jnp.maximum(s.count - 1.0, 1.0)
    if regularize:
        w = s.count / (s.count + 5.0)
        dim = s.mean.shape[-1]
        cov = w * cov + (1.0 - w) * 1e-3 * jnp.eye(dim, dtype=cov.dtype)
    return cov


# ---------------------------------------------------------------------------
# Stan-style adaptation schedule (init buffer / doubling windows / term buffer)
# ---------------------------------------------------------------------------


def build_schedule(n_warmup: int, init_buffer: int = 75, term_buffer: int = 50,
                   base_window: int = 25):
    """Returns an int32 array `window_id` of length n_warmup: -1 during the
    init/term buffers (step-size-only), otherwise the index of the mass
    window; and a bool array `window_end` marking the last step of each mass
    window (where the mass matrix is refreshed and Welford reset)."""
    import numpy as np

    window_id = np.full(n_warmup, -1, np.int32)
    window_end = np.zeros(n_warmup, bool)
    if n_warmup <= 0:
        # zero-length warmup (fully warm-started runs): empty schedule
        return jnp.asarray(window_id), jnp.asarray(window_end)
    if n_warmup < init_buffer + term_buffer + base_window:
        # too short: single window covering the middle
        lo = min(init_buffer, n_warmup // 3)
        hi = max(n_warmup - term_buffer, lo + 1)
        window_id[lo:hi] = 0
        window_end[hi - 1] = True
        return jnp.asarray(window_id), jnp.asarray(window_end)
    pos = init_buffer
    w = base_window
    wid = 0
    while pos < n_warmup - term_buffer:
        end = pos + w
        if end + 2 * w > n_warmup - term_buffer:
            end = n_warmup - term_buffer  # absorb the remainder
        window_id[pos:end] = wid
        window_end[end - 1] = True
        pos = end
        w *= 2
        wid += 1
    return jnp.asarray(window_id), jnp.asarray(window_end)
