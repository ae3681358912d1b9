"""Pathfinder variational inference (Zhang, Carpenter, Gelman & Vehtari,
JMLR 23(306), 2022) on the flat unconstrained vector.

Net-new inference layer (SURVEY.md §2.7 — the reference outsources all
inference); Pathfinder is the modern default for cheap posterior draws and
NUTS initialization: run L-BFGS toward the mode, turn EVERY iterate's
compact inverse-Hessian estimate into a local Gaussian
N(θ_k − Σ_k ∇loss(θ_k), Σ_k), Monte-Carlo-estimate each candidate's ELBO,
and keep the best. Multi-path pools several runs by truncated importance
resampling.

TPU-first shape of this implementation:
- the whole L-BFGS trajectory is ONE `lax.scan` (fixed `max_iters`, optax
  zoom linesearch — no host control flow);
- the (s, z) curvature-pair history is a second scan carrying fixed-size
  (J, dim) rolling buffers + a validity mask (rejected pairs mask out —
  nothing is data-dependently shaped);
- all `max_iters` candidates evaluate in ONE vmapped batch: thin-QR of the
  (dim, 2J) low-rank factor, Cholesky of a 2J×2J core, and ONE batched
  log-density call over every ELBO draw of every candidate (`as_batched`,
  so the whole-model fused kernels can dispatch on eligible priors).

The inverse Hessian never materializes: Σ = diag(α) + β γ βᵀ (compact BFGS
representation, Byrd-Nocedal-Schnabel 1994) with β (dim × 2J) and γ
(2J × 2J); sampling, log-density, and the Newton-step matvec all act
through the factors (O(dim·J) per draw).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.scipy.linalg import solve_triangular

_LOG2PI = jnp.log(2.0 * jnp.pi)
_CURV_EPS = 1e-12  # accept pair iff sᵀz > eps·‖z‖² (Stan's condition)


class PathfinderResult(NamedTuple):
    position: jax.Array  # (dim,) mean of the ELBO-best candidate Gaussian
    draws: jax.Array  # (n_draws, dim) from the best candidate
    logq: jax.Array  # (n_draws,) candidate log-density of each draw
    logp: jax.Array  # (n_draws,) target log-density of each draw
    elbo: jax.Array  # (max_iters,) per-candidate ELBO estimates
    best: jax.Array  # argmax index into elbo
    alpha: jax.Array  # (dim,) diagonal of the best candidate's Σ factor
    beta: jax.Array  # (dim, 2J) low-rank factor
    gamma: jax.Array  # (2J, 2J) core; Σ = diag(α) + β γ βᵀ


def _alpha_update(alpha, s, z):
    """Diagonal inverse-Hessian estimate update (paper Alg. 2; the
    Gilbert-Lemaréchal scaling Stan uses)."""
    a = jnp.sum(z * z * alpha)
    b = jnp.sum(z * s)
    c = jnp.sum(s * s / alpha)
    inv = a / (b * alpha) + z * z / b - (a * s * s) / (b * c * alpha * alpha)
    return jnp.clip(1.0 / inv, 1e-12, 1e12)


def _factors(S, Z, mask, alpha):
    """Compact-representation factors of Σ = diag(α) + β γ βᵀ.

    S, Z: (J, dim) rolling buffers (rows = pairs, oldest→newest), mask (J,)
    marks valid pairs. Masked slots carry zero rows, so their β columns are
    zero and every γ entry touching them is annihilated in βγβᵀ; R gets a
    unit diagonal on masked slots to stay invertible (Byrd-Nocedal-Schnabel
    1994 eq. 4.7 inverse form; paper Lemma 1)."""
    m = mask.astype(alpha.dtype)
    S = S * m[:, None]
    Z = Z * m[:, None]
    sz = S @ Z.T  # (J, J): sz[i, j] = s_iᵀ z_j
    j = sz.shape[0]
    diag_sz = jnp.diagonal(sz)
    r = jnp.triu(sz) + jnp.diag(jnp.where(mask, 0.0, 1.0))  # unit masked diag
    e = jnp.diag(diag_sz)
    zaz = Z @ (alpha[None, :] * Z).T  # Zᵀdiag(α)Z in pair space
    rinv = solve_triangular(r, jnp.eye(j, dtype=alpha.dtype), lower=False)
    top_left = rinv.T @ (e + zaz) @ rinv
    gamma = jnp.block([[top_left, -rinv.T], [-rinv, jnp.zeros((j, j), alpha.dtype)]])
    beta = jnp.concatenate([S.T, alpha[:, None] * Z.T], axis=1)  # (dim, 2J)
    return beta, gamma


def _sigma_mv(alpha, beta, gamma, g):
    return alpha * g + beta @ (gamma @ (beta.T @ g))


def _sqrt_pieces(alpha, beta, gamma):
    """Thin QR + small Cholesky giving the Σ^{1/2} action and ½log|Σ|
    (paper Alg. 4): with Q R̃ = qr(diag(α)^{-½}β) and L = chol(I + R̃γR̃ᵀ),
    Σ^{1/2} = diag(α^{½})(Q L Qᵀ + I − QQᵀ)."""
    qbar = beta / jnp.sqrt(alpha)[:, None]
    q, rt = jnp.linalg.qr(qbar, mode="reduced")  # q: (dim, mm), mm = min(dim, 2J)
    mm = rt.shape[0]
    core = jnp.eye(mm, dtype=alpha.dtype) + rt @ gamma @ rt.T
    core = 0.5 * (core + core.T)
    ell = jnp.linalg.cholesky(core)
    half_logdet = 0.5 * jnp.sum(jnp.log(alpha)) + jnp.sum(
        jnp.log(jnp.diagonal(ell))
    )
    return q, ell, half_logdet


def _sample_and_logq(key, mu, alpha, beta, gamma, n):
    """n draws x = μ + Σ^{1/2}u and their log q(x); NaN-safe via the
    factored form (no dense matrix is ever built)."""
    dim = mu.shape[-1]
    q, ell, half_logdet = _sqrt_pieces(alpha, beta, gamma)
    u = jax.random.normal(key, (n, dim), mu.dtype)
    uq = u @ q  # (n, mm) = rows of Qᵀu
    x = mu + jnp.sqrt(alpha) * (uq @ ell.T @ q.T + u - uq @ q.T)
    return x, _logq(x, mu, alpha, q, ell, half_logdet)


def _logq(x, mu, alpha, q, ell, half_logdet):
    dim = mu.shape[-1]
    xi = (x - mu) / jnp.sqrt(alpha)  # (..., dim)
    xq = xi @ q  # (..., mm)
    w = solve_triangular(ell, xq.T, lower=True).T  # L^{-1} Qᵀ ξ
    quad = jnp.sum(w * w, -1) + jnp.sum(xi * xi, -1) - jnp.sum(xq * xq, -1)
    return -0.5 * quad - half_logdet - 0.5 * dim * _LOG2PI


def fit_pathfinder(
    logdensity_fn,
    key,
    v0,
    max_iters: int = 60,
    history: int = 6,
    n_elbo_mc: int = 30,
    n_draws: int = 100,
    optimizer=None,
) -> PathfinderResult:
    """Single-path Pathfinder. `logdensity_fn` maps (dim,) — or, if it
    declares `batch_capable` (Model.batched_logdensity_fn), (B, dim) — to
    log p; `v0` is the (dim,) start. Returns draws from the ELBO-best
    candidate plus its Σ factors (use α/β/γ as a NUTS metric seed)."""
    from .model import as_batched

    blogp = as_batched(logdensity_fn)
    opt = optimizer or optax.lbfgs()

    # plain per-example loss for the optimizer; batching matters only for
    # the candidate ELBO evaluation below
    def loss1(v):
        return -(
            blogp(v[None, :])[0]
            if getattr(logdensity_fn, "batch_capable", False)
            else logdensity_fn(v)
        )

    v0 = jnp.asarray(v0)
    dim = v0.shape[-1]
    opt_state = opt.init(v0)

    from optax import tree_utils as otu

    reuse_state = (
        otu.tree_get(opt_state, "value") is not None
        and otu.tree_get(opt_state, "grad") is not None
    )
    vag_state = optax.value_and_grad_from_state(loss1)

    def vag(v, state):
        if reuse_state:
            return vag_state(v, state=state)
        return jax.value_and_grad(loss1)(v)

    def opt_step(carry, _):
        v, state = carry
        value, grad = vag(v, state)
        if reuse_state:
            updates, state = opt.update(
                grad, state, v, value=value, grad=grad, value_fn=loss1
            )
        else:
            updates, state = opt.update(grad, state, v)
        return (optax.apply_updates(v, updates), state), (v, grad)

    (v_last, state_last), (thetas, grads) = jax.lax.scan(
        opt_step, (v0, opt_state), None, length=max_iters
    )
    g_last = jax.grad(loss1)(v_last)
    thetas = jnp.concatenate([thetas, v_last[None]], 0)  # (L+1, dim)
    grads = jnp.concatenate([grads, g_last[None]], 0)

    # rolling curvature-pair history: at step k the buffers hold the last
    # ≤J ACCEPTED pairs among (s_i, z_i)_{i≤k}, and α carries the diagonal
    # estimate — exactly the state candidate k's Σ is built from
    def hist_step(carry, sz):
        S, Z, mask, alpha = carry
        s, z = sz
        ok = jnp.sum(s * z) > _CURV_EPS * jnp.sum(z * z)
        alpha2 = jnp.where(ok, _alpha_update(alpha, s, z), alpha)
        S2 = jnp.where(ok, jnp.roll(S, -1, 0).at[-1].set(s), S)
        Z2 = jnp.where(ok, jnp.roll(Z, -1, 0).at[-1].set(z), Z)
        mask2 = jnp.where(ok, jnp.roll(mask, -1).at[-1].set(True), mask)
        return (S2, Z2, mask2, alpha2), (S2, Z2, mask2, alpha2)

    s_seq = thetas[1:] - thetas[:-1]
    z_seq = grads[1:] - grads[:-1]
    init = (
        jnp.zeros((history, dim), v0.dtype),
        jnp.zeros((history, dim), v0.dtype),
        jnp.zeros((history,), bool),
        jnp.ones((dim,), v0.dtype),
    )
    _, (S_all, Z_all, mask_all, alpha_all) = jax.lax.scan(
        hist_step, init, (s_seq, z_seq)
    )  # each (L, ...) — snapshot AFTER absorbing pair k ⇒ state at iterate k+1

    ke, kd = jax.random.split(key)

    def candidate(theta, grad, S, Z, mask, alpha, ck):
        beta, gamma = _factors(S, Z, mask, alpha)
        mu = theta - _sigma_mv(alpha, beta, gamma, grad)
        x, logq = _sample_and_logq(ck, mu, alpha, beta, gamma, n_elbo_mc)
        return mu, x, logq

    cand_keys = jax.random.split(ke, max_iters)
    mus, xs, logqs = jax.vmap(candidate)(
        thetas[1:], grads[1:], S_all, Z_all, mask_all, alpha_all, cand_keys
    )  # xs: (L, M, dim)

    logps = blogp(xs.reshape(-1, dim)).reshape(max_iters, n_elbo_mc)
    elbo_terms = jnp.where(jnp.isfinite(logps), logps, -jnp.inf) - logqs
    elbo = jnp.mean(elbo_terms, -1)
    elbo = jnp.where(jnp.isfinite(elbo), elbo, -jnp.inf)
    best = jnp.argmax(elbo)

    S_b, Z_b, mask_b, alpha_b = (
        S_all[best], Z_all[best], mask_all[best], alpha_all[best],
    )
    beta_b, gamma_b = _factors(S_b, Z_b, mask_b, alpha_b)
    mu_b = mus[best]
    draws, logq_d = _sample_and_logq(kd, mu_b, alpha_b, beta_b, gamma_b, n_draws)
    logp_d = blogp(draws)
    return PathfinderResult(
        mu_b, draws, logq_d, logp_d, elbo, best, alpha_b, beta_b, gamma_b
    )


def multipath_pathfinder(
    logdensity_fn,
    key,
    v0s,
    n_draws: int = 1000,
    per_path_draws: int = 200,
    **kwargs,
):
    """Multi-path Pathfinder (paper §5): P single paths from `v0s` (P, dim)
    run under vmap, their draws pooled with truncated importance weights
    w̄ = min(w, w̄_mean·√N) (Ionides 2008 — the robust-resampling step PSIS
    refines) and categorically resampled down to `n_draws`.

    Returns (draws (n_draws, dim), results) — `results` is the vmapped
    PathfinderResult stack (per-path diagnostics: elbo curves, best
    indices, Σ factors)."""
    p = v0s.shape[0]
    kp, kr = jax.random.split(key)
    keys = jax.random.split(kp, p)
    res = jax.vmap(
        lambda k, v: fit_pathfinder(
            logdensity_fn, k, v, n_draws=per_path_draws, **kwargs
        )
    )(keys, v0s)
    pool = res.draws.reshape(p * per_path_draws, -1)
    logw = (res.logp - res.logq).reshape(-1)
    logw = jnp.where(jnp.isfinite(logw), logw, -jnp.inf)
    # truncate: log w̄_i ≤ log mean(w) + ½ log N  (stabilized via logsumexp)
    n = logw.shape[0]
    log_mean_w = jax.scipy.special.logsumexp(logw) - jnp.log(n)
    logw_t = jnp.minimum(logw, log_mean_w + 0.5 * jnp.log(n))
    take = jax.random.categorical(kr, logw_t, shape=(n_draws,))
    return pool[take], res
