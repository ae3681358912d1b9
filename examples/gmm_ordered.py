"""Bayesian Gaussian mixture with ordered means: the classic
label-switching problem solved by composing three of the library's
distinctive pieces in one prior —

    w  ~ Dirichlet(1, 1, 1)                (simplex link)
    mu ~ ordered(iid Normal(0, 5))         (ordered transform breaks the
                                            K! label symmetry exactly)
    s  ~ iid LogNormal(0, 0.5)             (log link)

and one NUTS run through the vectorize layer (the whole prior is a single
flat unconstrained vector; the mixture likelihood is one logsumexp).

Run: python examples/gmm_ordered.py   (CPU or one TPU chip)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.diagnostics import summary_table
from tpu_bijectors.infer import Model

K = 3
TRUE_MU = np.array([-3.0, 0.5, 4.0])
TRUE_W = np.array([0.3, 0.45, 0.25])
TRUE_S = np.array([0.6, 0.8, 0.7])

rng = np.random.default_rng(7)
comp = rng.choice(K, size=600, p=TRUE_W)
y_obs = jnp.asarray(TRUE_MU[comp] + TRUE_S[comp] * rng.standard_normal(600))


def loglik(x):
    # (N, K) component log-densities -> logsumexp over K, summed over N
    lp = (
        jnp.log(x["w"])[None, :]
        - 0.5 * ((y_obs[:, None] - x["mu"][None, :]) / x["s"][None, :]) ** 2
        - jnp.log(x["s"])[None, :]
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    return jnp.sum(jax.scipy.special.logsumexp(lp, axis=1))


model = Model(
    priors=dists.NamedProduct.of(
        w=dists.Dirichlet(jnp.ones(K)),
        mu=tb.ordered(dists.IIDProduct(dists.Normal(0.0, 5.0), K)),
        s=dists.IIDProduct(dists.LogNormal(0.0, 0.5), K),
    ),
    loglik=loglik,
)

# mixtures are multimodal in the merged-component directions: start all
# chains from the MAP mode (init='laplace') so NUTS explores the dominant
# well-separated mode the ordered prior selects
samples, state, stats = model.sample(
    jax.random.PRNGKey(1), n_chains=8, n_warmup=800, n_samples=800,
    kernel="nuts_batched", init="laplace",
)
print(summary_table(samples), flush=True)

mu = np.asarray(samples["mu"]).reshape(-1, K)
w = np.asarray(samples["w"]).reshape(-1, K)
assert np.all(np.diff(mu, axis=-1) >= 0), "ordering constraint violated"
print("\nposterior mean mu:", mu.mean(0).round(2), " (truth", TRUE_MU, ")")
print("posterior mean w :", w.mean(0).round(2), " (truth", TRUE_W, ")")
