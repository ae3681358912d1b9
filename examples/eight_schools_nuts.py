"""Eight-schools (non-centered) with chain-parallel NUTS.

Run: python examples/eight_schools_nuts.py
Works on one TPU chip or any CPU; shard chains over every visible device.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_bijectors import dists
from tpu_bijectors.diagnostics import ess_bulk, split_rhat
from tpu_bijectors.infer import Model, warmup_and_sample

# data (Rubin 1981)
y_obs = jnp.asarray([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
sigma = jnp.asarray([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def loglik(x):
    theta = x["mu"] + x["tau"] * x["theta_raw"]  # non-centered
    return jnp.sum(-0.5 * ((y_obs - theta) / sigma) ** 2)


model = Model(
    priors=dists.NamedProduct.of(
        mu=dists.Normal(0.0, 5.0),
        tau=dists.HalfCauchy(5.0),
        theta_raw=dists.IIDProduct(dists.Normal(0.0, 1.0), 8),
    ),
    loglik=loglik,
)


def main():
    logp = model.logdensity_fn()
    n_chains = 16
    q0 = model.init_positions(jax.random.PRNGKey(0), n_chains, scale=0.5)
    samples, state, stats = jax.jit(
        lambda k, q: warmup_and_sample(logp, k, q, n_warmup=700, n_samples=700)
    )(jax.random.PRNGKey(1), q0)

    x = model.constrain(samples.reshape(-1, model.dim()))
    mu, tau = x["mu"], x["tau"]
    print(f"mu  : {float(jnp.mean(mu)):6.2f} +- {float(jnp.std(mu)):.2f}")
    print(f"tau : {float(jnp.mean(tau)):6.2f} +- {float(jnp.std(tau)):.2f}")
    print(f"divergences: {int(jnp.sum(stats.diverging))}")
    # samples: (draws, chains, dim) — the diagnostics' native layout
    mu_dc = samples[:, :, 0]
    print(f"R-hat(mu): {float(split_rhat(mu_dc)):.3f}  ESS(mu): {float(ess_bulk(mu_dc)):.0f}")


if __name__ == "__main__":
    main()
