"""NeuTra: neural-transport MCMC (Hoffman et al. 2019).

Net-new vs the reference (which ships no inference; SURVEY.md §2.7) — the
flow layers it *does* ship exist precisely to enable this workflow
(docs/src/flows.md usage pattern). NeuTra composes them with the engines:

1. fit a normalizing-flow posterior q = flow(N(0, I)) to the target by ADVI
   (`fit_advi` + `FlowPosterior` — reparameterized ELBO, forward pass only);
2. run NUTS on the *pulled-back* density

       logp_z(z) = logp(flow(z)) + log|det J_flow(z)|

   whose geometry the trained flow has approximately whitened (funnels and
   bananas become near-spherical Gaussians);
3. push the z-draws through the flow's forward pass to get target-space
   samples. Unlike plain ADVI the result is asymptotically exact — the flow
   only preconditions, it doesn't bias.

TPU shape: the hot loop adds one masked-matmul stack (MAF forward) per
leapfrog — MXU work, batched over chains; the flow's iterative inverse is
never called. Everything (fit + warmup + sampling) is lax.scan under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bijectors.base import Bijector
from .advi import FlowPosterior, fit_advi
from .model import Model, as_batched


def neutra_logdensity(logdensity_fn, flow: Bijector):
    """Pull a flat-space log density back through `flow` (z-space -> target
    space): returns logp_z(z) = logp(flow(z)) + logdetJ(z), batch-capable
    (bijectors broadcast over leading axes; the wrapped density is batched
    via `as_batched`)."""
    blogp = as_batched(logdensity_fn)

    def logp_z(z):
        v, ld = flow.forward_and_log_det(z)
        return blogp(v) + ld

    logp_z.batch_capable = True
    return logp_z


class NeutraResult(NamedTuple):
    flow: Bijector  # trained transport map (z -> unconstrained target)
    losses: jax.Array  # ADVI negative-ELBO trace


def fit_neutra_flow(
    logdensity_fn,
    key,
    dim: int,
    n_layers: int = 4,
    hidden: int | None = None,
    n_steps: int = 1000,
    n_mc: int = 32,
    learning_rate: float = 5e-3,
    dtype=None,
    kind: str = "maf",
) -> NeutraResult:
    """Train the transport map: a MAF stack (kind='maf'; affine, cheapest)
    or NSF-AR stack (kind='nsf'; spline — for multimodal/heavier
    geometry) fitted to `logdensity_fn` by reparameterized ELBO
    maximization (sampling direction only)."""
    from ..flows.maf import flow_stack

    dtype = dtype or jnp.result_type(float)
    k_flow, k_fit = jax.random.split(key)
    flow = flow_stack(k_flow, dim, kind, n_layers=n_layers, hidden=hidden,
                      dtype=dtype)
    res = fit_advi(
        logdensity_fn,
        k_fit,
        dim,
        q=FlowPosterior(flow),
        n_steps=n_steps,
        n_mc=n_mc,
        learning_rate=learning_rate,
        dtype=dtype,
    )
    return NeutraResult(res.q.flow, res.losses)


def neutra_sample(
    model: Model,
    key,
    n_chains: int = 8,
    n_warmup: int = 500,
    n_samples: int = 500,
    flow: Bijector | None = None,
    constrained: bool = True,
    fit_kwargs: dict | None = None,
    kernel: str = "nuts_batched",
    **sample_kwargs,
):
    """One-call NeuTra on a Model: fit the transport (unless a trained
    `flow` is passed), NUTS in z-space, transport + constrain the draws.

    kernel='chees' runs ChEES-HMC instead — a natural pairing: the
    pulled-back geometry is near-spherical, exactly where one shared
    jittered trajectory length shines (and the chain batch stays lockstep
    through the flow's matmul stack).

    Returns (samples, result, stats): samples as Model.sample would give
    them ((n_kept, n_chains) leading axes), `result` a NeutraResult
    carrying the trained flow (reusable across runs)."""
    from .sampler import sample_with_kernel

    dim = model.dim()
    k_fit, k_init, k_run = jax.random.split(key, 3)
    logp = model.batched_logdensity_fn()
    losses = jnp.zeros((0,), jnp.result_type(float))
    if flow is None:
        flow, losses = fit_neutra_flow(logp, k_fit, dim, **(fit_kwargs or {}))
    logp_z = neutra_logdensity(logp, flow)
    z0 = jax.random.normal(k_init, (n_chains, dim), jnp.result_type(float))
    z, state, stats = sample_with_kernel(
        logp_z, k_run, z0, n_warmup=n_warmup, n_samples=n_samples,
        kernel=kernel, **sample_kwargs,
    )
    v = flow.forward(z)
    samples = model.constrain(v) if constrained else v
    return samples, NeutraResult(flow, losses), stats
