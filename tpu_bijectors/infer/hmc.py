"""HMC / NUTS in unconstrained space (net-new vs the reference; SURVEY.md §2.7,
BASELINE.json north star: "leapfrog in transformed space").

TPU-first design notes:

* The NUTS transition is a single-chain pure function over a flat (dim,)
  vector; chains batch via `jax.vmap` (one fused program; lanes that finish
  their trajectory early are masked — the standard vectorized-MCMC scheme)
  and shard across devices via `shard_map` (see ../shard/).
* There is exactly ONE tree-building implementation — the iterative
  checkpoint-buffer doubling in hmc_batched.py — and `nuts_kernel` here is
  its C=1 specialization (see its docstring for the algorithm).
* Diagonal mass adaptation: Stan-style windowed Welford; step size: Nesterov
  dual averaging. Both accept an optional `axis_name` so that, under
  `shard_map`/`pmap`, the adaptation statistics are `pmean`-ed across all
  chains on all devices INSIDE the jitted step (no host sync — the >=85%
  multi-host scaling requirement, SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

MAX_ENERGY_DELTA = 1000.0  # divergence threshold (Stan's default)


# ---------------------------------------------------------------------------
# Leapfrog
# ---------------------------------------------------------------------------


class IntegratorState(NamedTuple):
    q: jax.Array  # position
    p: jax.Array  # momentum
    logp: jax.Array  # target log-density at q
    grad: jax.Array  # d logp / d q


def apply_inv_mass(inv_mass, p):
    """M^{-1} p for a diagonal (dim,) or dense symmetric (dim, dim) metric;
    `p` may carry leading batch axes (rows)."""
    if inv_mass.ndim == 1:
        return p * inv_mass
    # HIGHEST precision: bf16-default matmul error breaks leapfrog
    # reversibility under a dense metric
    return jnp.matmul(p, inv_mass, precision=jax.lax.Precision.HIGHEST)


def sample_momentum(key, q, inv_mass):
    """p ~ N(0, M) with M = inv(inv_mass): diagonal or dense metric."""
    z = jax.random.normal(key, q.shape, q.dtype)
    if inv_mass.ndim == 1:
        return z / jnp.sqrt(inv_mass)
    # inv_mass = Sigma = L L'  =>  p = L^{-T} z has cov (L L')^{-1} = M
    L = jnp.linalg.cholesky(inv_mass.astype(q.dtype))
    Lt = jnp.broadcast_to(L.T, z.shape[:-1] + L.shape)
    return jax.scipy.linalg.solve_triangular(Lt, z[..., None], lower=False)[..., 0]


def leapfrog(logp_and_grad, state: IntegratorState, eps, inv_mass):
    q, p, _, grad = state
    p_half = p + 0.5 * eps * grad
    q_new = q + eps * apply_inv_mass(inv_mass, p_half)
    logp_new, grad_new = logp_and_grad(q_new)
    p_new = p_half + 0.5 * eps * grad_new
    return IntegratorState(q_new, p_new, logp_new, grad_new)


def kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * apply_inv_mass(inv_mass, p), axis=-1)


# ---------------------------------------------------------------------------
# NUTS transition (single chain; vmap for many)
# ---------------------------------------------------------------------------


class NutsInfo(NamedTuple):
    accept_prob: jax.Array  # mean Metropolis accept stat over the trajectory
    diverging: jax.Array
    n_steps: jax.Array  # number of leapfrog steps taken
    energy: jax.Array
    tree_depth: jax.Array


def _trailing_zeros(n):
    """Count trailing zero bits of int32 n (n>0): exact integer bit trick
    (popcount of the lowest-set-bit mask), no float round-off at any depth."""
    return jax.lax.population_count((n & -n) - 1)


def nuts_kernel(logdensity_fn, max_depth: int = 10):
    """Build a NUTS transition kernel: (key, q, logp, grad, eps, inv_mass) ->
    (q', logp', grad', NutsInfo). Single chain; vmap over chains.

    One tree implementation serves both this kernel and the natively batched
    one: this is the C=1 specialization of hmc_batched.nuts_kernel_batched
    (iterative doubling, checkpoint-buffer U-turn checks, multinomial
    progressive sampling, biased merge — see hmc_batched.py for the
    algorithm; VERDICT r1 asked for exactly one copy of that logic)."""
    from .hmc_batched import nuts_kernel_batched

    batched = nuts_kernel_batched(jax.vmap(logdensity_fn), max_depth=max_depth)

    def kernel(key, q, logp, grad, eps, inv_mass):
        q1, logp1, grad1, info = batched(
            key, q[None, :], logp[None], grad[None, :], eps, inv_mass
        )
        squeeze = lambda a: a[0]
        return (
            squeeze(q1),
            squeeze(logp1),
            squeeze(grad1),
            jax.tree_util.tree_map(squeeze, info),
        )

    return kernel


# ---------------------------------------------------------------------------
# Plain HMC transition (fixed trajectory length) — simpler, fully static
# ---------------------------------------------------------------------------


def hmc_kernel(logdensity_fn, n_leapfrog: int = 32, jitter: float = 0.2):
    """Fixed-trajectory HMC with step-size jitter (uniform in
    [1-jitter, 1+jitter]) to break resonances on near-Gaussian targets."""

    def logp_and_grad(q):
        return jax.value_and_grad(logdensity_fn)(q)

    def kernel(key, q, logp, grad, eps, inv_mass):
        dtype = q.dtype
        k_mom, k_acc, k_jit = jax.random.split(key, 3)
        eps = eps * (1.0 + jitter * (2.0 * jax.random.uniform(k_jit, dtype=dtype) - 1.0))
        p0 = sample_momentum(k_mom, q, inv_mass)
        energy0 = -logp + kinetic(p0, inv_mass)
        state = IntegratorState(q, p0, logp, grad)

        def step(state, _):
            return leapfrog(logp_and_grad, state, eps, inv_mass), None

        state, _ = jax.lax.scan(step, state, None, length=n_leapfrog)
        energy1 = -state.logp + kinetic(state.p, inv_mass)
        delta = energy1 - energy0
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(-delta, 0.0)))
        accept_prob = jnp.where(jnp.isfinite(delta), accept_prob, 0.0)
        accept = jax.random.uniform(k_acc, dtype=dtype) < accept_prob
        q1 = jnp.where(accept, state.q, q)
        logp1 = jnp.where(accept, state.logp, logp)
        grad1 = jnp.where(accept, state.grad, grad)
        info = NutsInfo(
            accept_prob=accept_prob,
            diverging=delta > MAX_ENERGY_DELTA,
            n_steps=jnp.asarray(n_leapfrog, jnp.int32),
            energy=energy0,
            tree_depth=jnp.asarray(0, jnp.int32),
        )
        return q1, logp1, grad1, info

    return kernel
