"""Prior/posterior predictive sampling + posterior predictive checks.

Net-new workflow layer (the reference ships no inference — SURVEY.md
§2.7). Uses the same `simulate(key, x) -> data` contract as SBC
(infer/sbc.py): one callable defines the generative direction, and all
replication is one vmapped batch — no per-draw Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prior_predictive(prior, simulate, key, n: int):
    """n draws from the prior predictive: theta ~ prior, y ~ p(y|theta).

    Returns (theta, y) pytrees with leading (n,) axes."""
    k_prior, k_data = jax.random.split(key)
    theta = prior.sample(k_prior, (n,))
    y = jax.vmap(simulate)(jax.random.split(k_data, n), theta)
    return theta, y


def posterior_predictive(simulate, samples, key, has_chains: bool | None = None):
    """Replicated datasets from posterior draws.

    samples: the constrained pytree Model.sample returns (leaves with
    leading (draws, chains) axes) or any pytree with a single leading
    draw axis. Returns the data pytree with one leading (n_total,) axis.

    has_chains: True = leaves carry (draws, chains) leading axes; False =
    one flat (draws,) axis. The default (None) infers it from whether all
    leaves share their first TWO axes — which cannot distinguish flat
    draws of a k-vector parameter {"w": (draws, k)} from chained scalar
    draws; pass has_chains=False explicitly for flat vector-event samples
    (e.g. run_ensemble output pushed through Model.constrain)."""
    leaves = jax.tree_util.tree_leaves(samples)
    if has_chains is None:
        lead = (
            leaves[0].shape[:2] if leaves[0].ndim >= 2 else leaves[0].shape[:1]
        )
        has_chains = all(
            leaf.ndim >= 2 and leaf.shape[:2] == lead for leaf in leaves
        )
    n_lead = 2 if has_chains else 1
    flat = jax.tree_util.tree_map(
        lambda leaf: leaf.reshape((-1,) + leaf.shape[n_lead:]), samples
    )
    n = jax.tree_util.tree_leaves(flat)[0].shape[0]
    return jax.vmap(simulate)(jax.random.split(key, n), flat)


def ppc_pvalue(stat_fn, observed, replicated):
    """Posterior predictive p-value: P(T(y_rep) >= T(y_obs)).

    stat_fn: one dataset -> scalar test statistic (vmapped over the
    replicated leading axis). Values near 0 or 1 flag misfit in the
    direction T measures (Gelman, Meng & Stern 1996)."""
    t_obs = stat_fn(observed)
    t_rep = jax.vmap(stat_fn)(replicated)
    return jnp.mean((t_rep >= t_obs).astype(jnp.result_type(float)))
