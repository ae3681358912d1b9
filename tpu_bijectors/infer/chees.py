"""ChEES-HMC: gradient-based trajectory-length adaptation (Hoffman &
Sountsov, AISTATS 2021).

Net-new vs the reference (no inference there — SURVEY.md §2.7). On TPU this
is the natively-batched alternative to NUTS: every chain runs the SAME
number of leapfrog steps each iteration (one jittered trajectory length is
shared), so the whole chain batch marches in lockstep through one fused
leapfrog loop — no per-chain tree divergence, no masked lanes idling while
the deepest tree finishes, and the batched/transposed whole-model fused
density kernels see the full chain batch every step.

The trajectory length T maximizes the ChEES criterion

    ChEES(T) = 1/4 E[(||q' - E q'||^2 - ||q - E q||^2)^2]

by Adam on log T, using the closed-form endpoint derivative dq'/dh = v'
(the velocity after the last leapfrog) — per-iteration gradient

    g = E_w[(||q'_c||^2 - ||q_c||^2) * (q'_c . v')] * u * T,

chains weighted by their acceptance probability w, u the per-iteration
jitter fraction (a Halton / van-der-Corput sequence, as in the paper).
Cross-chain expectations are plain means over the local chain axis and
`pmean` over `axis_name` under shard_map — same no-host-sync contract as
the NUTS warmup (SURVEY.md §7).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .adapt import (
    build_schedule,
    stepsize_init,
    stepsize_update,
    welford_cov_init,
    welford_cov_update_batch,
    welford_covariance,
    welford_init,
    welford_update_batch,
    welford_variance,
)
from .hmc import (
    MAX_ENERGY_DELTA,
    IntegratorState,
    apply_inv_mass,
    kinetic,
    leapfrog,
    sample_momentum,
)


def _halton2(i):
    """Van der Corput base-2 sequence in (0,1): bit-reversal of i+1 —
    the low-discrepancy trajectory jitter the paper recommends."""
    bits = ((i + 1) >> jnp.arange(24)) & 1
    return jnp.sum(bits * 0.5 ** (jnp.arange(24) + 1.0))


class CheesState(NamedTuple):
    """Checkpointable ChEES sampler state (mirrors SamplerState)."""

    key: jax.Array
    q: jax.Array  # (chains, dim)
    logp: jax.Array
    grad: jax.Array
    eps: jax.Array
    log_t: jax.Array  # log trajectory length
    inv_mass: jax.Array  # (dim,) diagonal or (dim, dim) dense
    ss: object  # StepSizeAdaptState
    welford: object
    adam_m: jax.Array  # Adam first/second moments for log_t
    adam_v: jax.Array
    iteration: jax.Array


class CheesStats(NamedTuple):
    accept_prob: jax.Array  # (iters, chains)
    diverging: jax.Array  # (iters, chains) energy error > MAX_ENERGY_DELTA
    n_steps: jax.Array  # (iters,)
    trajectory: jax.Array  # (iters,) adapted T trace (warmup) / fixed (sampling)


def _value_and_grad_batch(logdensity_fn):
    if getattr(logdensity_fn, "batch_capable", False):

        def vg(q):
            logp, vjp = jax.vjp(logdensity_fn, q)
            (grad,) = vjp(jnp.ones_like(logp))
            return logp, grad

        return vg
    return jax.vmap(jax.value_and_grad(logdensity_fn))


def run_chees(
    logdensity_fn,
    key,
    q0,
    n_warmup: int = 500,
    n_samples: int = 500,
    eps0: float = 0.1,
    target_accept: float = 0.651,
    lr_t: float = 0.05,
    max_steps: int = 1024,
    axis_name: str | None = None,
    metric: str = "diag",
):
    """Warmup (step size + trajectory + mass adaptation) then sampling with
    the tuned jittered-trajectory HMC. Accepts per-example or batch-capable
    (`fn.batch_capable`) log densities; the whole run is two lax.scans.
    metric: 'diag' (Welford variance) or 'dense' (full covariance, Stan's
    dense_e — same accumulators as the NUTS warmup). Returns (samples,
    CheesState, CheesStats) with samples of shape (n_samples, chains, dim)."""
    if metric not in ("diag", "dense"):
        raise ValueError(f"unknown metric {metric!r}")
    dense = metric == "dense"
    dtype = q0.dtype
    dim = q0.shape[-1]
    vg = _value_and_grad_batch(logdensity_fn)
    logp, grad = vg(q0)

    window_id, window_end = build_schedule(n_warmup)

    def pmean(x):
        return jax.lax.pmean(x, axis_name) if axis_name is not None else x

    def transition(key, q, logp, grad, eps, t, inv_mass, u):
        """One lockstep jittered trajectory for the whole chain batch."""
        k_mom, k_acc = jax.random.split(key)
        h = u * t
        n_steps = jnp.clip(
            jnp.ceil(h / eps).astype(jnp.int32), 1, max_steps
        )
        p0 = sample_momentum(k_mom, q, inv_mass)
        energy0 = -logp + kinetic(p0, inv_mass)

        def body(_, s):
            return leapfrog(vg, s, eps, inv_mass)

        s1 = jax.lax.fori_loop(
            0, n_steps, body, IntegratorState(q, p0, logp, grad)
        )
        energy1 = -s1.logp + kinetic(s1.p, inv_mass)
        delta = energy1 - energy0
        finite = jnp.isfinite(delta)
        diverging = ~finite | (delta > MAX_ENERGY_DELTA)
        accept_prob = jnp.where(
            finite, jnp.minimum(1.0, jnp.exp(jnp.minimum(-delta, 0.0))), 0.0
        )
        accept = jax.random.uniform(k_acc, accept_prob.shape, dtype) < accept_prob

        # ChEES gradient wrt log T from the PROPOSED endpoints. A divergent
        # chain has non-finite s1.q/s1.p: its accept weight is already 0,
        # but 0 * inf = NaN would poison the Adam moments PERMANENTLY (the
        # EMA never recovers from a NaN), so mask per_chain itself.
        v_end = apply_inv_mass(inv_mass, s1.p)
        qc_old = q - pmean(jnp.mean(q, 0))
        qc_new = s1.q - pmean(jnp.mean(s1.q, 0))
        term = jnp.sum(qc_new * qc_new, -1) - jnp.sum(qc_old * qc_old, -1)
        per_chain = term * jnp.sum(qc_new * v_end, -1)
        per_chain = jnp.where(jnp.isfinite(per_chain), per_chain, 0.0)
        w = accept_prob
        g = pmean(jnp.mean(w * per_chain)) / jnp.maximum(
            pmean(jnp.mean(w)), 1e-10
        )
        g_logt = g * u * t  # chain rule: dh/dlogT = u T

        q1 = jnp.where(accept[:, None], s1.q, q)
        logp1 = jnp.where(accept, s1.logp, logp)
        grad1 = jnp.where(accept[:, None], s1.grad, grad)
        harm_acc = 1.0 / pmean(jnp.mean(1.0 / jnp.maximum(accept_prob, 1e-10)))
        return (
            q1, logp1, grad1, accept_prob, diverging, harm_acc, g_logt, n_steps
        )

    def warmup_step(carry, xs):
        st = carry
        i, wid, wend = xs
        k_step, k_next = jax.random.split(st.key)
        u = _halton2(st.iteration).astype(dtype)
        t = jnp.exp(st.log_t)
        q1, logp1, grad1, acc, div, harm_acc, g_logt, n_steps = transition(
            k_step, st.q, st.logp, st.grad, st.eps, t, st.inv_mass, u
        )
        ss = stepsize_update(st.ss, harm_acc, target=target_accept)
        eps = jnp.exp(ss.log_eps).astype(dtype)
        # Adam ascent on log T (clipped into [log eps, log(max_steps*eps)])
        m = 0.9 * st.adam_m + 0.1 * g_logt
        v = 0.999 * st.adam_v + 0.001 * g_logt**2
        tf = (st.iteration + 1).astype(dtype)
        mhat = m / (1.0 - 0.9**tf)
        vhat = v / (1.0 - 0.999**tf)
        log_t = st.log_t + lr_t * mhat / (jnp.sqrt(vhat) + 1e-8)
        log_t = jnp.clip(
            log_t, jnp.log(eps), jnp.log(0.9 * max_steps * eps)
        )
        # windowed Welford mass (diag variance or dense covariance)
        in_window = wid >= 0
        upd = welford_cov_update_batch if dense else welford_update_batch
        est = welford_covariance if dense else welford_variance
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(in_window, a, b),
            upd(st.welford, q1, axis_name),
            st.welford,
        )
        refresh = wend
        inv_mass = jnp.where(refresh, est(wf).astype(dtype), st.inv_mass)
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(refresh, a, b),
            (welford_cov_init if dense else welford_init)(dim, dtype),
            wf,
        )
        st = CheesState(
            k_next, q1, logp1, grad1, eps, log_t, inv_mass, ss, wf,
            m, v, st.iteration + 1,
        )
        return st, (acc, div, n_steps, jnp.exp(log_t))

    st = CheesState(
        key, q0, logp, grad,
        jnp.asarray(eps0, dtype),
        jnp.asarray(math.log(10.0 * eps0), dtype),
        jnp.eye(dim, dtype=dtype) if dense else jnp.ones(dim, dtype),
        stepsize_init(eps0, dtype),
        (welford_cov_init if dense else welford_init)(dim, dtype),
        jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(0, jnp.int32),
    )
    xs = (jnp.arange(n_warmup), window_id, window_end)
    st, _ = jax.lax.scan(warmup_step, st, xs)

    # freeze tuned eps (dual-averaged) and T for sampling
    eps_final = jnp.exp(st.ss.log_eps_bar).astype(dtype)
    st = st._replace(eps=eps_final)

    def sample_step(carry, _):
        st = carry
        k_step, k_next = jax.random.split(st.key)
        u = _halton2(st.iteration).astype(dtype)
        t = jnp.exp(st.log_t)
        q1, logp1, grad1, acc, div, _, _, n_steps = transition(
            k_step, st.q, st.logp, st.grad, st.eps, t, st.inv_mass, u
        )
        st = st._replace(
            key=k_next, q=q1, logp=logp1, grad=grad1, iteration=st.iteration + 1
        )
        return st, (q1, acc, div, n_steps, t)

    st, (samples, acc, div, n_steps, t_trace) = jax.lax.scan(
        sample_step, st, None, length=n_samples
    )
    return samples, st, CheesStats(acc, div, n_steps, t_trace)
