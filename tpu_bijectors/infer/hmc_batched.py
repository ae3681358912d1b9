"""Natively multi-chain NUTS: chains are a REAL batch axis, not vmap lanes.

Why this exists alongside hmc.py's per-chain kernel (which is vmapped):
under `jax.vmap` the trace sees per-example (dim,) shapes, so

  * the batch-on-lanes Pallas kernels never dispatch in the leapfrog, and
  * the log-density gradient is a per-example VJP instead of ONE backward
    pass over the whole (chains, dim) block.

Here the tree state carries an explicit chain axis: per-chain termination
becomes (chains,) masks with `lax.while_loop` conditions `any(active)`,
updates `where`-gated per chain — the same lockstep execution the vmap
batching rule produces, but with the log-density evaluated on the full
block (`Model.batched_logdensity_fn`). Algorithm identical to hmc.py:
iterative tree doubling with checkpoint-buffer U-turn checks, multinomial
progressive sampling, biased merge (Betancourt 2017).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hmc import (
    MAX_ENERGY_DELTA,
    IntegratorState,
    NutsInfo,
    _trailing_zeros,
    apply_inv_mass,
    sample_momentum,
)


def _batched_logp_and_grad(logp_batched):
    def f(q):  # q: (C, dim) -> ((C,), (C, dim))
        lp, vjp = jax.vjp(logp_batched, q)
        (g,) = vjp(jnp.ones_like(lp))
        return lp, g

    return f


def _kin(p, inv_mass):
    return 0.5 * jnp.sum(p * apply_inv_mass(inv_mass, p), axis=-1)


def _leap(lg, q, p, grad, eps_dir, inv_mass):
    # eps_dir: (C, 1) signed step
    p_half = p + 0.5 * eps_dir * grad
    q_new = q + eps_dir * apply_inv_mass(inv_mass, p_half)
    lp_new, g_new = lg(q_new)
    p_new = p_half + 0.5 * eps_dir * g_new
    return q_new, p_new, lp_new, g_new


def nuts_kernel_batched(logp_batched, max_depth: int = 10):
    """(key, q (C,dim), logp (C,), grad (C,dim), eps, inv_mass) ->
    (q', logp', grad', NutsInfo with (C,) fields). Semantically the batched
    counterpart of vmap(nuts_kernel(...)); `logp_batched` maps (C, dim) ->
    (C,)."""
    lg = _batched_logp_and_grad(logp_batched)

    def kernel(key, q, logp, grad, eps, inv_mass):
        C, dim = q.shape
        dtype = q.dtype
        k_mom, k_loop = jax.random.split(key)
        p0 = sample_momentum(k_mom, q, inv_mass)
        energy0 = -logp + _kin(p0, inv_mass)

        def uturn_cp(dq, p_a, p_b):
            # dq, p_*: (C, S, dim) or broadcastable
            t1 = jnp.sum(dq * apply_inv_mass(inv_mass, p_a), -1) < 0
            t2 = jnp.sum(dq * apply_inv_mass(inv_mass, p_b), -1) < 0
            return t1 | t2

        def build_subtree(edge_q, edge_p, edge_lp, edge_g, direction, depth_j, key):
            """2^depth_j masked leapfrog steps for every chain at once."""
            n_leaves = jnp.asarray(1, jnp.int32) << depth_j  # scalar
            eps_dir = (direction * eps)[:, None]  # (C, 1)

            ck_q = jnp.zeros((C, max_depth + 1, dim), dtype)
            ck_p = jnp.zeros((C, max_depth + 1, dim), dtype)
            slots = jnp.arange(max_depth + 1)

            init = (
                jnp.asarray(0, jnp.int32),
                (edge_q, edge_p, edge_lp, edge_g),  # running state
                jnp.zeros((C, dim), dtype),  # prop_q
                jnp.full((C,), -jnp.inf, dtype),  # prop_logp
                jnp.zeros((C, dim), dtype),  # prop_grad
                jnp.full((C,), -jnp.inf, dtype),  # log_w
                jnp.zeros((C,), bool),  # turning
                jnp.zeros((C,), bool),  # diverging
                jnp.zeros((C,), dtype),  # sum_accept
                jnp.zeros((C,), jnp.int32),  # per-chain steps taken
                ck_q,
                ck_p,
                key,
            )

            def cond(carry):
                n = carry[0]
                turning, diverging = carry[6], carry[7]
                return (n < n_leaves) & jnp.any(~(turning | diverging))

            def body(carry):
                (n, state, prop_q, prop_logp, prop_grad, log_w,
                 turning, diverging, sum_acc, n_steps, ck_q, ck_p, k) = carry
                sq, sp, slp, sg = state
                active = ~(turning | diverging)  # (C,)
                am = active[:, None]

                nq, np_, nlp, ng = _leap(lg, sq, sp, sg, eps_dir, inv_mass)
                # inactive chains keep their old state
                nq = jnp.where(am, nq, sq)
                np_ = jnp.where(am, np_, sp)
                nlp = jnp.where(active, nlp, slp)
                ng = jnp.where(am, ng, sg)

                energy = -nlp + _kin(np_, inv_mass)
                delta = energy - energy0
                div = active & ((delta > MAX_ENERGY_DELTA) | ~jnp.isfinite(energy))
                log_w_leaf = jnp.where(
                    active & ~div, -delta, jnp.full((C,), -jnp.inf, dtype)
                )
                acc = jnp.minimum(1.0, jnp.exp(jnp.minimum(-delta, 0.0)))
                acc = jnp.where(active & jnp.isfinite(delta), acc, 0.0)

                log_w_new = jnp.logaddexp(log_w, log_w_leaf)
                k, sub = jax.random.split(k)
                u = jax.random.uniform(sub, (C,), dtype)
                take = active & (jnp.log(u) < (log_w_leaf - log_w_new))
                prop_q = jnp.where(take[:, None], nq, prop_q)
                prop_logp = jnp.where(take, nlp, prop_logp)
                prop_grad = jnp.where(take[:, None], ng, prop_grad)

                tz = jnp.where(
                    n == 0, max_depth, _trailing_zeros(jnp.maximum(n, 1), max_depth)
                )
                # (C, S, 1): slot-selected AND chain-active
                wmask = (slots <= tz)[None, :, None] & active[:, None, None]
                ck_q = jnp.where(wmask, nq[:, None, :], ck_q)
                ck_p = jnp.where(wmask, np_[:, None, :], ck_p)

                tz1 = _trailing_zeros(n + 1, max_depth)
                kmask = (slots >= 1) & (slots <= tz1)  # (S,)
                dq = nq[:, None, :] - ck_q  # (C, S, dim)
                turn_lvls = uturn_cp(dq, ck_p, np_[:, None, :])  # (C, S)
                turning_now = active & jnp.any(kmask[None, :] & turn_lvls, axis=-1)

                return (
                    n + 1,
                    (nq, np_, nlp, ng),
                    prop_q, prop_logp, prop_grad, log_w_new,
                    turning | turning_now, diverging | div,
                    sum_acc + acc,
                    n_steps + active.astype(jnp.int32),
                    ck_q, ck_p, k,
                )

            (n, state, prop_q, prop_logp, prop_grad, log_w,
             turning, diverging, sum_acc, n_steps, _, _, _) = jax.lax.while_loop(
                cond, body, init
            )
            return (
                state, prop_q, prop_logp, prop_grad, log_w,
                turning, diverging, sum_acc, n_steps,
            )

        def outer_cond(carry):
            j = carry[0]
            turning, diverging = carry[7], carry[8]
            return (j < max_depth) & jnp.any(~(turning | diverging))

        def outer_body(carry):
            (j, left, right, prop_q, prop_logp, prop_grad, log_w,
             turning, diverging, sum_acc, n_steps, depth_pc, k) = carry
            active = ~(turning | diverging)
            am = active[:, None]
            k, k_dir, k_sub, k_merge = jax.random.split(k, 4)
            go_right = jax.random.bernoulli(k_dir, shape=(C,))
            gr = go_right[:, None]
            edge = tuple(
                jnp.where(gr if a.ndim == 2 else go_right, r, l)
                for a, r, l in zip(right, right, left)
            )
            direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)
            (sub_right, s_prop_q, s_prop_logp, s_prop_grad, s_log_w,
             s_turning, s_diverging, s_sum_acc, s_n_steps) = build_subtree(
                edge[0], edge[1], edge[2], edge[3], direction, j, k_sub
            )
            # new outer edges: the subtree's outermost state extends the tree
            new_left = tuple(
                jnp.where(
                    (gr if a.ndim == 2 else go_right), l, sr
                )
                for a, l, sr in zip(left, left, sub_right)
            )
            new_right = tuple(
                jnp.where((gr if a.ndim == 2 else go_right), sr, r)
                for a, sr, r in zip(right, sub_right, right)
            )
            # inactive chains keep everything
            new_left = tuple(
                jnp.where((am if a.ndim == 2 else active), nl, l)
                for a, nl, l in zip(left, new_left, left)
            )
            new_right = tuple(
                jnp.where((am if a.ndim == 2 else active), nr, r)
                for a, nr, r in zip(right, new_right, right)
            )
            ok = active & ~s_turning & ~s_diverging
            u = jax.random.uniform(k_merge, (C,), dtype)
            accept_new = ok & (jnp.log(u) < s_log_w - log_w)
            prop_q = jnp.where(accept_new[:, None], s_prop_q, prop_q)
            prop_logp = jnp.where(accept_new, s_prop_logp, prop_logp)
            prop_grad = jnp.where(accept_new[:, None], s_prop_grad, prop_grad)
            log_w = jnp.logaddexp(
                log_w, jnp.where(ok, s_log_w, jnp.full((C,), -jnp.inf, dtype))
            )
            dq = new_right[0] - new_left[0]
            full_turn = (
                (jnp.sum(dq * apply_inv_mass(inv_mass, new_left[1]), -1) < 0)
                | (jnp.sum(dq * apply_inv_mass(inv_mass, new_right[1]), -1) < 0)
            )
            turning = turning | (active & s_turning) | (ok & full_turn)
            diverging = diverging | (active & s_diverging)
            return (
                j + 1, new_left, new_right, prop_q, prop_logp, prop_grad, log_w,
                turning, diverging,
                sum_acc + jnp.where(active, s_sum_acc, 0.0),
                n_steps + jnp.where(active, s_n_steps, 0),
                depth_pc + active.astype(jnp.int32),
                k,
            )

        state0 = (q, p0, logp, grad)
        init = (
            jnp.asarray(0, jnp.int32), state0, state0,
            q, logp, grad, jnp.zeros((C,), dtype),
            jnp.zeros((C,), bool), jnp.zeros((C,), bool),
            jnp.zeros((C,), dtype), jnp.zeros((C,), jnp.int32),
            jnp.zeros((C,), jnp.int32), k_loop,
        )
        (_, _, _, prop_q, prop_logp, prop_grad, _, _, diverging,
         sum_acc, n_steps, depth_pc, _) = jax.lax.while_loop(
            outer_cond, outer_body, init
        )

        accept_prob = sum_acc / jnp.maximum(n_steps, 1)
        info = NutsInfo(
            accept_prob=accept_prob,
            diverging=diverging,
            n_steps=n_steps,
            energy=energy0,
            tree_depth=depth_pc,
        )
        return prop_q, prop_logp, prop_grad, info

    return kernel
