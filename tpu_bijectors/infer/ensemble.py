"""Affine-invariant ensemble sampler (Goodman & Weare 2010 stretch move).

Net-new inference layer (SURVEY.md §2.7): the gradient-free complement to
the HMC family — for targets whose log-density is non-differentiable,
plateaued, or externally supplied. Affine invariance makes it immune to
linear correlation/scaling (no mass matrix, no step size; `a` is the only
knob and rarely needs tuning).

TPU-first shape: the classic formulation moves one walker at a time; here
the ensemble is split into two half-ensembles updated alternately — every
walker in a half moves SIMULTANEOUSLY against a partner drawn from the
other (frozen) half, which preserves detailed balance (emcee's "red-black"
parallelization) and makes each sweep two batched density calls over
(N/2, dim) blocks (`as_batched`, so fused whole-model densities engage).
The whole run is one `lax.scan` under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EnsembleResult(NamedTuple):
    samples: jax.Array  # (n_kept, n_walkers, dim)
    logp: jax.Array  # (n_kept, n_walkers)
    accept_rate: jax.Array  # scalar mean acceptance


def run_ensemble(
    logdensity_fn,
    key,
    q0,
    n_warmup: int = 500,
    n_samples: int = 1000,
    a: float = 2.0,
    thin: int = 1,
) -> EnsembleResult:
    """q0: (n_walkers, dim) — use ≥ 2·dim walkers (the ensemble spans the
    parameter space; fewer walkers degenerate). Walker count must be even.
    Fully jittable; density lifted with `as_batched` (vmap fallback)."""
    from .model import as_batched

    blogp = as_batched(logdensity_fn)
    q0 = jnp.asarray(q0)
    n_walkers, dim = q0.shape
    if n_walkers % 2:
        raise ValueError("n_walkers must be even (half-ensemble scheme)")
    if n_walkers < 4:
        raise ValueError("need at least 4 walkers")
    half = n_walkers // 2
    dtype = q0.dtype
    sqrt_a = jnp.sqrt(jnp.asarray(a, dtype))

    def half_move(key, active, frozen, lp_active):
        """Stretch-move every active walker against a random frozen partner:
        y = x_j + z (x_i - x_j), z ~ g(z) ∝ 1/√z on [1/a, a] (sampled as
        ((u(√a - 1/√a) + 1/√a)²), accept with z^{d-1} π(y)/π(x)."""
        k_part, k_z, k_acc = jax.random.split(key, 3)
        j = jax.random.randint(k_part, (half,), 0, half)
        partner = frozen[j]
        u = jax.random.uniform(k_z, (half,), dtype)
        z = (u * (sqrt_a - 1.0 / sqrt_a) + 1.0 / sqrt_a) ** 2
        y = partner + z[:, None] * (active - partner)
        lp_y = blogp(y)
        lp_y = jnp.where(jnp.isfinite(lp_y), lp_y, -jnp.inf)
        log_r = (dim - 1) * jnp.log(z) + lp_y - lp_active
        acc = jnp.log(jax.random.uniform(k_acc, (half,), dtype)) < log_r
        return (
            jnp.where(acc[:, None], y, active),
            jnp.where(acc, lp_y, lp_active),
            acc,
        )

    def sweep(carry, _):
        key, q, lp = carry
        k1, k2, key = jax.random.split(key, 3)
        q_a, q_b = q[:half], q[half:]
        lp_a, lp_b = lp[:half], lp[half:]
        q_a, lp_a, acc_a = half_move(k1, q_a, q_b, lp_a)
        q_b, lp_b, acc_b = half_move(k2, q_b, q_a, lp_b)
        q = jnp.concatenate([q_a, q_b])
        lp = jnp.concatenate([lp_a, lp_b])
        acc = jnp.mean(
            jnp.concatenate([acc_a, acc_b]).astype(dtype)
        )
        return (key, q, lp), (q, lp, acc)

    lp0 = blogp(q0)
    lp0 = jnp.where(jnp.isfinite(lp0), lp0, -jnp.inf)
    carry = (key, q0, lp0)
    carry, _ = jax.lax.scan(sweep, carry, None, length=n_warmup)
    carry, (qs, lps, accs) = jax.lax.scan(sweep, carry, None, length=n_samples)
    step = max(thin, 1)
    return EnsembleResult(qs[::step], lps[::step], jnp.mean(accs))
