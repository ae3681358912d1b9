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

Layouts: `transposed=False` holds state (chains, dim) — the classic
orientation. `transposed=True` holds state (dim, chains) — the TPU-native
orientation where chains ride the 128-wide lane axis, so the whole-model
fused Pallas kernels (vectorize/fused_kernel.py) run the log-density AND
its reverse pass as ONE kernel each inside every leapfrog. Same algorithm;
equal in distribution across layouts (the momentum array is filled in
layout order, so trajectories are not bit-identical between the two)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hmc import (
    MAX_ENERGY_DELTA,
    NutsInfo,
    _trailing_zeros,
    apply_inv_mass,
    sample_momentum,
)


class _Layout:
    """Axis conventions for the tree state.

    batch-major: state (C, dim); checkpoints (C, S, dim); dim is axis -1.
    transposed:  state (dim, C); checkpoints (S, dim, C); dim is axis -2
    (so a diagonal metric broadcasts as inv_mass[:, None] against both the
    2-D state and the 3-D checkpoint stack)."""

    def __init__(self, transposed: bool):
        self.transposed = transposed

    def dims(self, q):
        if self.transposed:
            dim, C = q.shape
        else:
            C, dim = q.shape
        return C, dim

    def bexp(self, m):
        """(C,) chain mask/scalar -> broadcastable against the 2-D state."""
        return m[None, :] if self.transposed else m[:, None]

    def vdot(self, a, b):
        """Inner product over the dim axis (works on 2-D and 3-D stacks)."""
        return jnp.sum(a * b, axis=-2 if self.transposed else -1)

    def aim(self, inv_mass, p):
        """M^{-1} p in this layout (p may be a 3-D checkpoint stack)."""
        if not self.transposed:
            return apply_inv_mass(inv_mass, p)
        if inv_mass.ndim == 1:
            return inv_mass[:, None] * p
        return jnp.matmul(inv_mass, p, precision=jax.lax.Precision.HIGHEST)

    def momentum(self, key, q, inv_mass):
        if not self.transposed:
            return sample_momentum(key, q, inv_mass)
        z = jax.random.normal(key, q.shape, q.dtype)
        if inv_mass.ndim == 1:
            return z / jnp.sqrt(inv_mass)[:, None]
        # p = L^{-T} z columnwise, inv_mass = L L' (see hmc.sample_momentum)
        L = jnp.linalg.cholesky(inv_mass.astype(q.dtype))
        return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)

    def ck_zeros(self, C, dim, S, dtype):
        shape = (S, dim, C) if self.transposed else (C, S, dim)
        return jnp.zeros(shape, dtype)

    def ck_write_mask(self, slot_mask, active):
        """slot_mask (S,), active (C,) -> checkpoint-stack broadcast."""
        if self.transposed:
            return slot_mask[:, None, None] & active[None, None, :]
        return slot_mask[None, :, None] & active[:, None, None]

    def ck_bcast(self, x):
        """2-D state -> broadcastable against the checkpoint stack."""
        return x[None, :, :] if self.transposed else x[:, None, :]

    def slot_reduce_any(self, slot_mask, per_slot):
        """per_slot (S, C) or (C, S) -> any over slots -> (C,)."""
        if self.transposed:
            return jnp.any(slot_mask[:, None] & per_slot, axis=0)
        return jnp.any(slot_mask[None, :] & per_slot, axis=-1)


def _batched_logp_and_grad(logp_batched):
    # leapfrog fast path: a density fn may carry `value_and_grad_fn` (e.g.
    # Model.batched_logdensity_t_fn) — value + FULL gradient in one fused
    # Pallas pass instead of jax.vjp's primal + transpose kernels
    vg = getattr(logp_batched, "value_and_grad_fn", None)
    if vg is not None:
        return vg

    def f(q):  # q: state -> ((C,), state-shaped grad)
        lp, vjp = jax.vjp(logp_batched, q)
        (g,) = vjp(jnp.ones_like(lp))
        return lp, g

    return f


def nuts_kernel_batched(logp_batched, max_depth: int = 10, transposed: bool = False):
    """(key, q, logp (C,), grad, eps, inv_mass) -> (q', logp', grad',
    NutsInfo with (C,) fields). Semantically the batched counterpart of
    vmap(nuts_kernel(...)).

    transposed=False: q/grad are (C, dim), `logp_batched` maps (C, dim) ->
    (C,). transposed=True: q/grad are (dim, C), `logp_batched` maps
    (dim, C) -> (C,) (e.g. Model.batched_logdensity_t_fn) — the layout the
    whole-model fused kernels want."""
    lg = _batched_logp_and_grad(logp_batched)
    L = _Layout(transposed)

    def _kin(p, inv_mass):
        return 0.5 * L.vdot(p, L.aim(inv_mass, p))

    def _leap(q, p, grad, eps_dir, inv_mass):
        # eps_dir: bexp'd (C,) signed step
        p_half = p + 0.5 * eps_dir * grad
        q_new = q + eps_dir * L.aim(inv_mass, p_half)
        lp_new, g_new = lg(q_new)
        p_new = p_half + 0.5 * eps_dir * g_new
        return q_new, p_new, lp_new, g_new

    def kernel(key, q, logp, grad, eps, inv_mass):
        C, dim = L.dims(q)
        dtype = q.dtype
        k_mom, k_loop = jax.random.split(key)
        p0 = L.momentum(k_mom, q, inv_mass)
        energy0 = -logp + _kin(p0, inv_mass)

        def uturn_cp(dq, v_a, v_b):
            # dq, v_*: VELOCITY (M^{-1} p) checkpoint stacks (or
            # broadcastable) — storing v instead of p means a dense metric
            # costs ONE (dim,dim) matmul per leapfrog instead of S+1
            # stack matmuls per U-turn check.
            t1 = L.vdot(dq, v_a) < 0
            t2 = L.vdot(dq, v_b) < 0
            return t1 | t2

        def build_subtree(edge_q, edge_p, edge_lp, edge_g, direction, depth_j,
                          key, outer_active):
            """2^depth_j masked leapfrog steps for every chain at once.

            outer_active: chains still alive in the OUTER doubling loop.
            Seeding the subtree's diverging mask with ~outer_active makes
            the inner while_loop terminate as soon as the genuinely active
            chains finish (otherwise 63 outer-dead chains would look fresh
            and keep the loop — and its whole-block density/reverse passes
            — running for up to 2^j discarded iterations); the caller
            already gates every returned mask/stat with `active &`."""
            n_leaves = jnp.asarray(1, jnp.int32) << depth_j  # scalar
            eps_dir = L.bexp(direction * eps)

            ck_q = L.ck_zeros(C, dim, max_depth + 1, dtype)
            ck_v = L.ck_zeros(C, dim, max_depth + 1, dtype)  # M^{-1} p slots
            slots = jnp.arange(max_depth + 1)

            init = (
                jnp.asarray(0, jnp.int32),
                (edge_q, edge_p, edge_lp, edge_g),  # running state
                jnp.zeros_like(q),  # prop_q
                jnp.full((C,), -jnp.inf, dtype),  # prop_logp
                jnp.zeros_like(q),  # prop_grad
                jnp.full((C,), -jnp.inf, dtype),  # log_w
                jnp.zeros((C,), bool),  # turning
                ~outer_active,  # diverging (outer-dead chains born inert)
                jnp.zeros((C,), dtype),  # sum_accept
                jnp.zeros((C,), jnp.int32),  # per-chain steps taken
                ck_q,
                ck_v,
                key,
            )

            def cond(carry):
                n = carry[0]
                turning, diverging = carry[6], carry[7]
                return (n < n_leaves) & jnp.any(~(turning | diverging))

            def body(carry):
                (n, state, prop_q, prop_logp, prop_grad, log_w,
                 turning, diverging, sum_acc, n_steps, ck_q, ck_v, k) = carry
                sq, sp, slp, sg = state
                active = ~(turning | diverging)  # (C,)
                am = L.bexp(active)

                nq, np_, nlp, ng = _leap(sq, sp, sg, eps_dir, inv_mass)
                # inactive chains keep their old state
                nq = jnp.where(am, nq, sq)
                np_ = jnp.where(am, np_, sp)
                nlp = jnp.where(active, nlp, slp)
                ng = jnp.where(am, ng, sg)

                nv = L.aim(inv_mass, np_)  # velocity, shared by kin + U-turn
                energy = -nlp + 0.5 * L.vdot(np_, nv)
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
                tm = L.bexp(take)
                prop_q = jnp.where(tm, nq, prop_q)
                prop_logp = jnp.where(take, nlp, prop_logp)
                prop_grad = jnp.where(tm, ng, prop_grad)

                tz = jnp.where(
                    n == 0, max_depth, _trailing_zeros(jnp.maximum(n, 1))
                )
                wmask = L.ck_write_mask(slots <= tz, active)
                ck_q = jnp.where(wmask, L.ck_bcast(nq), ck_q)
                ck_v = jnp.where(wmask, L.ck_bcast(nv), ck_v)

                tz1 = _trailing_zeros(n + 1)
                kmask = (slots >= 1) & (slots <= tz1)  # (S,)
                dq = L.ck_bcast(nq) - ck_q  # checkpoint stack
                turn_lvls = uturn_cp(dq, ck_v, L.ck_bcast(nv))
                turning_now = active & L.slot_reduce_any(kmask, turn_lvls)

                return (
                    n + 1,
                    (nq, np_, nlp, ng),
                    prop_q, prop_logp, prop_grad, log_w_new,
                    turning | turning_now, diverging | div,
                    sum_acc + acc,
                    n_steps + active.astype(jnp.int32),
                    ck_q, ck_v, k,
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
            am = L.bexp(active)
            k, k_dir, k_sub, k_merge = jax.random.split(k, 4)
            go_right = jax.random.bernoulli(k_dir, shape=(C,))
            gr = L.bexp(go_right)
            edge = tuple(
                jnp.where(gr if a.ndim == 2 else go_right, r, l)
                for a, r, l in zip(right, right, left)
            )
            direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)
            (sub_right, s_prop_q, s_prop_logp, s_prop_grad, s_log_w,
             s_turning, s_diverging, s_sum_acc, s_n_steps) = build_subtree(
                edge[0], edge[1], edge[2], edge[3], direction, j, k_sub, active
            )
            # new outer edges: the subtree's outermost state extends the tree
            new_left = tuple(
                jnp.where((gr if a.ndim == 2 else go_right), l, sr)
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
            an = L.bexp(accept_new)
            prop_q = jnp.where(an, s_prop_q, prop_q)
            prop_logp = jnp.where(accept_new, s_prop_logp, prop_logp)
            prop_grad = jnp.where(an, s_prop_grad, prop_grad)
            log_w = jnp.logaddexp(
                log_w, jnp.where(ok, s_log_w, jnp.full((C,), -jnp.inf, dtype))
            )
            dq = new_right[0] - new_left[0]
            full_turn = (
                (L.vdot(dq, L.aim(inv_mass, new_left[1])) < 0)
                | (L.vdot(dq, L.aim(inv_mass, new_right[1])) < 0)
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


def hmc_kernel_batched(
    logp_batched,
    n_leapfrog: int = 32,
    jitter: float = 0.2,
    transposed: bool = False,
):
    """Natively multi-chain fixed-trajectory HMC (the batched counterpart of
    vmap(hmc_kernel(...)): per-chain step-size jitter, momentum refresh, and
    Metropolis accept, with the log-density and its ONE backward pass
    evaluated on the whole block per leapfrog). Layouts as in
    nuts_kernel_batched: (chains, dim) or, with transposed=True, (dim,
    chains) — the orientation the whole-model fused kernels want (used by
    SMC's HMC mutation over large particle blocks)."""
    lg = _batched_logp_and_grad(logp_batched)
    L = _Layout(transposed)

    def kernel(key, q, logp, grad, eps, inv_mass):
        C, dim = L.dims(q)
        dtype = q.dtype
        k_mom, k_acc, k_jit = jax.random.split(key, 3)
        eps_c = eps * (
            1.0 + jitter * (2.0 * jax.random.uniform(k_jit, (C,), dtype) - 1.0)
        )
        eb = L.bexp(eps_c)
        p0 = L.momentum(k_mom, q, inv_mass)
        kin = lambda p: 0.5 * L.vdot(p, L.aim(inv_mass, p))
        energy0 = -logp + kin(p0)

        def step(carry, _):
            sq, sp, slp, sg = carry
            p_half = sp + 0.5 * eb * sg
            q_new = sq + eb * L.aim(inv_mass, p_half)
            lp_new, g_new = lg(q_new)
            p_new = p_half + 0.5 * eb * g_new
            return (q_new, p_new, lp_new, g_new), None

        (q1, p1, lp1, g1), _ = jax.lax.scan(
            step, (q, p0, logp, grad), None, length=n_leapfrog
        )
        delta = (-lp1 + kin(p1)) - energy0
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(-delta, 0.0)))
        accept_prob = jnp.where(jnp.isfinite(delta), accept_prob, 0.0)
        accept = jax.random.uniform(k_acc, (C,), dtype) < accept_prob
        am = L.bexp(accept)
        info = NutsInfo(
            accept_prob=accept_prob,
            diverging=delta > MAX_ENERGY_DELTA,
            n_steps=jnp.full((C,), n_leapfrog, jnp.int32),
            energy=energy0,
            tree_depth=jnp.zeros((C,), jnp.int32),
        )
        return (
            jnp.where(am, q1, q),
            jnp.where(accept, lp1, logp),
            jnp.where(am, g1, grad),
            info,
        )

    return kernel
