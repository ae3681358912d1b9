"""HMC / NUTS in unconstrained space (net-new vs the reference; SURVEY.md §2.7,
BASELINE.json north star: "leapfrog in transformed space").

TPU-first design notes:

* The NUTS transition is a single-chain pure function over a flat (dim,)
  vector; chains batch via `jax.vmap` (one fused program; lanes that finish
  their trajectory early are masked — the standard vectorized-MCMC scheme)
  and shard across devices via `shard_map` (see ../shard/).
* The tree doubling is ITERATIVE: a `lax.while_loop` over leapfrog leaves
  with a static (max_depth+1, dim) checkpoint buffer implementing the exact
  generalized-no-U-turn checks of recursive NUTS. At leaf n of a subtree we
  write the state into checkpoint slots [0 .. trailing_zeros(n)] and, after
  stepping to leaf n, check U-turns for every subtree that completes at n
  (all levels k >= 1 with (n+1) % 2^k == 0) against its stored leftmost
  leaf — exactly the (leftmost, rightmost) pairs recursive NUTS checks.
  No recursion, no dynamic shapes, O(max_depth * dim) state.
* Multinomial progressive sampling within subtrees, biased progressive
  sampling across the doubling merge (Betancourt 2017).
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


def _uturn(q_left, p_left, q_right, p_right, inv_mass):
    """Generalized U-turn criterion (diagonal or dense metric)."""
    dq = q_right - q_left
    return (jnp.dot(dq, apply_inv_mass(inv_mass, p_left)) < 0) | (
        jnp.dot(dq, apply_inv_mass(inv_mass, p_right)) < 0
    )


class _TreeState(NamedTuple):
    # trajectory edge (the new outermost state; the inner edge of a subtree
    # equals the old tree edge, so only `right` is needed)
    right: IntegratorState
    # progressive multinomial proposal
    prop_q: jax.Array
    prop_logp: jax.Array
    prop_grad: jax.Array
    log_weight: jax.Array  # logsumexp of -energy over the tree
    # termination
    turning: jax.Array
    diverging: jax.Array
    # stats
    sum_accept: jax.Array
    n_steps: jax.Array


def _trailing_zeros(n, max_bits):
    """Count trailing zero bits of int32 n (n>0), vectorized-friendly."""
    # k-th bit trick: tz = index of lowest set bit
    lowest = n & -n
    # log2 of a power of two
    return jnp.round(jnp.log2(lowest.astype(jnp.float32))).astype(jnp.int32)


def _build_subtree(
    logp_and_grad, edge: IntegratorState, direction, depth_j, max_depth,
    eps, inv_mass, energy0, key, dim, dtype,
):
    """Take 2^depth_j leapfrog steps from `edge` in `direction`, with exact
    subtree U-turn checks via the checkpoint buffer. Returns a _TreeState for
    the new subtree (left = state closest to the old tree edge)."""
    n_leaves = jnp.asarray(1, jnp.int32) << depth_j

    ckpt_q = jnp.zeros((max_depth + 1, dim), dtype)
    ckpt_p = jnp.zeros((max_depth + 1, dim), dtype)

    init_prop = (
        jnp.zeros(dim, dtype),
        jnp.asarray(-jnp.inf, dtype),
        jnp.zeros(dim, dtype),
        jnp.asarray(-jnp.inf, dtype),  # log_weight
    )

    def body(carry):
        (n, state, prop_q, prop_logp, prop_grad, log_w, turning,
         diverging, sum_acc, ck_q, ck_p, k) = carry

        new_state = leapfrog(logp_and_grad, state, direction * eps, inv_mass)
        energy = -new_state.logp + kinetic(new_state.p, inv_mass)
        delta = energy - energy0
        div = (delta > MAX_ENERGY_DELTA) | ~jnp.isfinite(energy)
        log_w_leaf = jnp.where(div, -jnp.inf, -delta).astype(dtype)
        # accept statistic: min(1, exp(-delta))
        acc = jnp.minimum(1.0, jnp.exp(jnp.minimum(-delta, 0.0)))
        acc = jnp.where(jnp.isfinite(delta), acc, 0.0)

        # progressive multinomial within the subtree
        log_w_new = jnp.logaddexp(log_w, log_w_leaf)
        k, sub = jax.random.split(k)
        take = jnp.log(jax.random.uniform(sub, dtype=dtype)) < (log_w_leaf - log_w_new)
        prop_q = jnp.where(take, new_state.q, prop_q)
        prop_logp = jnp.where(take, new_state.logp, prop_logp)
        prop_grad = jnp.where(take, new_state.grad, prop_grad)

        # checkpoint writes: slots [0 .. tz(n)] <- new_state (n=0 -> all)
        tz = jnp.where(n == 0, max_depth, _trailing_zeros(jnp.maximum(n, 1), max_depth))
        slots = jnp.arange(max_depth + 1)
        wmask = (slots <= tz)[:, None]
        ck_q = jnp.where(wmask, new_state.q[None, :], ck_q)
        ck_p = jnp.where(wmask, new_state.p[None, :], ck_p)

        # U-turn checks for all subtrees completing at leaf n:
        # levels 1..tz(n+1): compare slot-k leftmost leaf against new_state
        tz1 = _trailing_zeros(n + 1, max_depth)
        kmask = (slots >= 1) & (slots <= tz1)
        dq = new_state.q[None, :] - ck_q
        t1 = jnp.sum(dq * apply_inv_mass(inv_mass, ck_p), axis=-1) < 0
        t2 = jnp.sum(dq * apply_inv_mass(inv_mass, new_state.p)[None, :], axis=-1) < 0
        turning_now = jnp.any(kmask & (t1 | t2))

        return (
            n + 1, new_state, prop_q, prop_logp, prop_grad, log_w_new,
            turning | turning_now, diverging | div,
            sum_acc + acc, ck_q, ck_p, k,
        )

    def cond(carry):
        n, _, _, _, _, _, turning, diverging, _, _, _, _ = carry
        return (n < n_leaves) & ~turning & ~diverging

    init = (
        jnp.asarray(0, jnp.int32), edge,
        init_prop[0], init_prop[1], init_prop[2], init_prop[3],
        jnp.asarray(False), jnp.asarray(False),
        jnp.asarray(0.0, dtype),
        ckpt_q, ckpt_p, key,
    )
    (n, last, prop_q, prop_logp, prop_grad, log_w, turning,
     diverging, sum_acc, _, _, _) = jax.lax.while_loop(cond, body, init)

    return _TreeState(
        right=last,
        prop_q=prop_q,
        prop_logp=prop_logp,
        prop_grad=prop_grad,
        log_weight=log_w,
        turning=turning,
        diverging=diverging,
        sum_accept=sum_acc,
        n_steps=n,
    )


def nuts_kernel(logdensity_fn, max_depth: int = 10):
    """Build a NUTS transition kernel: (key, q, logp, grad, eps, inv_mass) ->
    (q', logp', grad', NutsInfo). Single chain; vmap over chains."""

    def logp_and_grad(q):
        return jax.value_and_grad(logdensity_fn)(q)

    def kernel(key, q, logp, grad, eps, inv_mass):
        dtype = q.dtype
        dim = q.shape[-1]
        k_mom, k_loop = jax.random.split(key)
        p0 = sample_momentum(k_mom, q, inv_mass)
        energy0 = -logp + kinetic(p0, inv_mass)
        state0 = IntegratorState(q, p0, logp, grad)

        def outer_body(carry):
            (j, left, right, prop_q, prop_logp, prop_grad, log_w,
             turning, diverging, sum_acc, n_steps, k) = carry
            k, k_dir, k_sub, k_merge = jax.random.split(k, 4)
            go_right = jax.random.bernoulli(k_dir)
            edge = jax.tree_util.tree_map(
                lambda a, b: jnp.where(go_right, a, b), right, left
            )
            direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)
            sub = _build_subtree(
                logp_and_grad, edge, direction, j, max_depth, eps, inv_mass,
                energy0, k_sub, dim, dtype,
            )
            # update edges (sub.right is the new outermost state)
            new_left = jax.tree_util.tree_map(
                lambda a, b: jnp.where(go_right, a, b), left, sub.right
            )
            new_right = jax.tree_util.tree_map(
                lambda a, b: jnp.where(go_right, a, b), sub.right, right
            )
            ok = ~sub.turning & ~sub.diverging
            # biased progressive sampling across the merge
            accept_new = (
                jnp.log(jax.random.uniform(k_merge, dtype=dtype))
                < sub.log_weight - log_w
            ) & ok
            prop_q = jnp.where(accept_new, sub.prop_q, prop_q)
            prop_logp = jnp.where(accept_new, sub.prop_logp, prop_logp)
            prop_grad = jnp.where(accept_new, sub.prop_grad, prop_grad)
            log_w = jnp.logaddexp(log_w, jnp.where(ok, sub.log_weight, -jnp.inf))
            # U-turn across the full merged tree
            full_turn = _uturn(
                new_left.q, new_left.p, new_right.q, new_right.p, inv_mass
            )
            return (
                j + 1, new_left, new_right, prop_q, prop_logp, prop_grad, log_w,
                sub.turning | (ok & full_turn), diverging | sub.diverging,
                sum_acc + sub.sum_accept, n_steps + sub.n_steps, k,
            )

        def outer_cond(carry):
            j = carry[0]
            turning = carry[7]
            diverging = carry[8]
            return (j < max_depth) & ~turning & ~diverging

        init = (
            jnp.asarray(0, jnp.int32), state0, state0,
            q, logp, grad, jnp.zeros((), dtype),
            jnp.asarray(False), jnp.asarray(False),
            jnp.zeros((), dtype), jnp.asarray(0, jnp.int32), k_loop,
        )
        (depth, _, _, prop_q, prop_logp, prop_grad, _, _, diverging,
         sum_acc, n_steps, _) = jax.lax.while_loop(outer_cond, outer_body, init)

        # a diverging final subtree proposes nothing; q stays if weights said so
        new_logp, new_grad = prop_logp, prop_grad
        accept_prob = sum_acc / jnp.maximum(n_steps, 1)
        info = NutsInfo(
            accept_prob=accept_prob,
            diverging=diverging,
            n_steps=n_steps,
            energy=energy0,
            tree_depth=depth,
        )
        return prop_q, new_logp, new_grad, info

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
