"""MAP estimation and the Laplace approximation in unconstrained space.

Net-new inference layer (SURVEY.md §2.7: the reference outsources all
inference; these engines are what the link/invlink machinery exists to
serve — same role as Turing's `maximum_a_posteriori` / LaplaceApproximation
workflows, rebuilt on the vectorize layer).

Both operate on the flat unconstrained vector of the vectorize layer, so
every support constraint is already removed: the optimizer runs UNboxed
L-BFGS over R^dim, and the Laplace Gaussian is well-defined (full support).
Note the estimated mode maximizes the *linked* density logp(x) + logdetJ —
the pushforward density the samplers target — not the constrained-space
mode; this is the standard (and reparameterization-consistent) choice.

The whole optimization loop is ONE `lax.scan` under jit (fixed step count,
no data-dependent host control flow), so it compiles once and runs on-device
end to end; the Hessian for the Laplace step is a single `jax.hessian` call
fused by XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.scipy.linalg import solve_triangular

from ..tree import pytree_dataclass

_LOG2PI = jnp.log(2.0 * jnp.pi)


class MAPResult(NamedTuple):
    position: jax.Array  # linked-space argmax (best iterate seen)
    logdensity: jax.Array  # logp at `position`
    grad_norm: jax.Array  # ||∇logp|| at the final iterate
    losses: jax.Array  # per-step negative logdensity trace


def fit_map(
    logdensity_fn,
    v0,
    n_steps: int = 200,
    optimizer=None,
    learning_rate: float | None = None,
) -> MAPResult:
    """Maximize logp(v) over the flat unconstrained vector.

    Default optimizer is `optax.lbfgs()` (zoom linesearch; curvature memory
    makes it the right tool for smooth unconstrained posteriors). Pass any
    optax `GradientTransformation` (e.g. `optax.adam(1e-2)`) to override;
    `learning_rate` is a shorthand for `optax.adam(learning_rate)`.

    The best iterate (not the last) is returned: linesearch failures or a
    too-large Adam step can end on a worse point, and tracking the running
    argmax inside the scan carry costs one `where` per step."""
    if optimizer is not None and learning_rate is not None:
        raise ValueError("pass either optimizer or learning_rate, not both")
    if learning_rate is not None:
        optimizer = optax.adam(learning_rate)
    opt = optimizer or optax.lbfgs()

    def loss(v):
        return -logdensity_fn(v)

    v0 = jnp.asarray(v0)
    opt_state = opt.init(v0)

    # linesearch-driven optimizers (lbfgs) cache (value, grad) in their
    # state — reuse it and feed the linesearch its extra args; plain
    # optimizers (adam, ...) neither store them nor accept the kwargs
    from optax import tree_utils as otu

    reuse_state = (
        otu.tree_get(opt_state, "value") is not None
        and otu.tree_get(opt_state, "grad") is not None
    )
    value_and_grad = (
        optax.value_and_grad_from_state(loss)
        if reuse_state
        else (lambda v, state: jax.value_and_grad(loss)(v))
    )

    def step(carry, _):
        v, opt_state, best_v, best_loss = carry
        value, grad = value_and_grad(v, state=opt_state)
        if reuse_state:
            updates, opt_state = opt.update(
                grad, opt_state, v, value=value, grad=grad, value_fn=loss
            )
        else:
            updates, opt_state = opt.update(grad, opt_state, v)
        v2 = optax.apply_updates(v, updates)
        better = value < best_loss
        best_v = jnp.where(better, v, best_v)
        best_loss = jnp.where(better, value, best_loss)
        return (v2, opt_state, best_v, best_loss), value

    init = (v0, opt_state, v0, jnp.asarray(jnp.inf, v0.dtype))
    (v, _, best_v, best_loss), losses = jax.lax.scan(
        step, init, None, length=n_steps
    )
    # the final iterate may beat the running best (scan records pre-update)
    final_loss, final_grad = jax.value_and_grad(loss)(v)
    better = final_loss < best_loss
    best_v = jnp.where(better, v, best_v)
    best_loss = jnp.where(better, final_loss, best_loss)
    return MAPResult(best_v, -best_loss, jnp.linalg.norm(final_grad), losses)


@pytree_dataclass
class LaplaceApprox:
    """Gaussian N(mean, H^{-1}) in linked space, H = -∇²logp(mean).

    Stored via the Cholesky factor of the PRECISION (H = L Lᵀ): sampling is
    one triangular solve, the density one triangular matvec, and the
    evidence's ½log|H| is a diagonal sum — H is never inverted densely."""

    mean: jax.Array
    chol_precision: jax.Array  # lower-triangular L, H = L Lᵀ
    logdensity_at_mode: jax.Array

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]

    def sample(self, key, n: int) -> jax.Array:
        """(n, dim) linked-space draws: v = mean + L^{-T} z, z ~ N(0, I)
        (so cov(v) = L^{-T} L^{-1} = H^{-1}). Constrain with
        `model.constrain(draws)`."""
        z = jax.random.normal(key, (n, self.dim), self.mean.dtype)
        u = solve_triangular(self.chol_precision.T, z.T, lower=False)
        return self.mean + u.T

    def logdensity(self, v) -> jax.Array:
        """Gaussian log-density of linked point(s) v (leading batch ok)."""
        d = jnp.asarray(v) - self.mean
        u = jnp.einsum(
            "ij,...i->...j", self.chol_precision, d,
            precision=jax.lax.Precision.HIGHEST,
        )  # Lᵀ d  (einsum over the first index of L = transpose contraction)
        half_logdet_h = jnp.sum(jnp.log(jnp.diagonal(self.chol_precision)))
        return (
            -0.5 * jnp.sum(u * u, -1)
            - 0.5 * self.dim * _LOG2PI
            + half_logdet_h
        )

    def log_evidence(self) -> jax.Array:
        """Laplace evidence: log ∫ p ≈ logp(mode) + d/2·log2π − ½log|H|."""
        half_logdet_h = jnp.sum(jnp.log(jnp.diagonal(self.chol_precision)))
        return (
            self.logdensity_at_mode + 0.5 * self.dim * _LOG2PI - half_logdet_h
        )

    def covariance(self) -> jax.Array:
        """Dense Σ = H^{-1} = L^{-T}L^{-1} (dim×dim — for dense-metric
        seeding or reporting; the sampling/density paths never need it)."""
        inv_l = solve_triangular(
            self.chol_precision, jnp.eye(self.dim, dtype=self.mean.dtype),
            lower=True,
        )
        return inv_l.T @ inv_l

    def marginal_sd(self) -> jax.Array:
        """Per-coordinate posterior sd: sqrt(diag(Σ)) from the same solve
        covariance() does (shared code path — the two cannot diverge)."""
        return jnp.sqrt(jnp.diagonal(self.covariance()))


def laplace_approximation(
    logdensity_fn, v_star, jitter: float = 0.0
) -> LaplaceApprox:
    """Laplace approximation at a (MAP) point: one `jax.hessian` call, one
    Cholesky. `jitter` adds jitter·I to H before factoring — use when the
    mode sits on a nearly-flat direction (the factor is NaN otherwise, which
    propagates loudly rather than silently)."""
    v_star = jnp.asarray(v_star)
    h = -jax.hessian(logdensity_fn)(v_star)
    h = 0.5 * (h + h.T)  # hessian is symmetric; enforce against fp asymmetry
    if jitter:
        h = h + jitter * jnp.eye(h.shape[-1], dtype=h.dtype)
    chol = jnp.linalg.cholesky(h)
    return LaplaceApprox(v_star, chol, jnp.asarray(logdensity_fn(v_star)))


def map_laplace(
    model,
    v0=None,
    key=None,
    n_steps: int = 200,
    optimizer=None,
    jitter: float = 0.0,
) -> tuple[MAPResult, LaplaceApprox]:
    """One-call MAP + Laplace on a `Model` (fused linked density; jitted).

    v0 defaults to zeros (the linked-space origin — every link maps it to an
    interior point); pass `key` instead for a random restart draw."""
    fn = model.logdensity_fn()
    if v0 is None:
        if key is not None:
            v0 = model.init_positions(key, 1)[0]
        else:
            v0 = jnp.zeros(model.dim(), jnp.result_type(float))
    res = jax.jit(
        lambda v: fit_map(fn, v, n_steps=n_steps, optimizer=optimizer)
    )(v0)
    lap = jax.jit(
        lambda v: laplace_approximation(fn, v, jitter=jitter)
    )(res.position)
    return res, lap
