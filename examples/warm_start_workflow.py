"""The modern warm-started workflow on one model:

    MAP + Laplace  ->  Pathfinder  ->  warm-started NUTS  ->  summary table
    (+ parallel tempering when the posterior might be multimodal)

Run: python examples/warm_start_workflow.py   (CPU or one TPU chip)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_bijectors import dists
from tpu_bijectors.diagnostics import summary_table
from tpu_bijectors.infer import (
    Model,
    fit_pathfinder,
    map_laplace,
    run_parallel_tempering,
)

# a small mixed-support model: regression (location + positive scale)
# plus category proportions (simplex) observed as counts
x_data = jnp.linspace(-2.0, 2.0, 40)
y_data = 1.5 * x_data - 0.7 + 0.3 * jax.random.normal(jax.random.PRNGKey(0), (40,))
counts = jnp.asarray([23.0, 17.0])


def loglik(p):
    pred = p["slope"] * x_data + p["intercept"]
    return jnp.sum(
        -0.5 * ((y_data - pred) / p["noise"]) ** 2 - jnp.log(p["noise"])
    ) + jnp.sum(counts * jnp.log(p["w"]))


model = Model(
    priors=dists.NamedProduct.of(
        slope=dists.Normal(0.0, 5.0),
        intercept=dists.Normal(0.0, 5.0),
        noise=dists.LogNormal(0.0, 1.0),
        w=dists.Dirichlet(jnp.ones(2) * 2.0),
    ),
    loglik=loglik,
)
key = jax.random.PRNGKey(1)

# 1. MAP + Laplace: mode, per-parameter scales, cheap evidence
res, lap = map_laplace(model, n_steps=200)
print("MAP logp:", float(res.logdensity), " grad-norm:", float(res.grad_norm))
print("Laplace log-evidence:", float(lap.log_evidence()))

# 2. Pathfinder: approximate draws + Sigma factors in one L-BFGS pass
pf = fit_pathfinder(model.logdensity_fn(), key, jnp.zeros(model.dim()))
print("Pathfinder best ELBO:", float(pf.elbo[pf.best]))

# 3. NUTS warm-started from Pathfinder (positions AND mass matrix seeded):
#    short warmup suffices because adaptation starts near the answer
samples, state, stats = model.sample(
    key, n_chains=8, n_warmup=200, n_samples=500, init="pathfinder",
    kernel="nuts",
)
print(summary_table(samples))

# 4. if multimodality is suspected: parallel tempering on the same split
prior_only = Model(priors=model.priors)
v0 = pf.draws[:16]
# TI integrates E_beta[log lik] over the ladder: a sharp integrand near
# beta=0 (wide priors) needs a dense ladder for a tight evidence estimate
pt = run_parallel_tempering(
    prior_only.batched_logdensity_fn(),
    lambda v: loglik(model.constrain(v)),
    key, v0, n_temps=16, n_warmup=300, n_samples=400,
)
print("PT swap acceptance per rung:", [round(float(a), 2) for a in pt.swap_accept])
print("PT log-evidence (TI):", float(pt.log_evidence),
      " vs Laplace:", float(lap.log_evidence()))
