"""ADVI on a mixed-support hierarchical model (simplex + correlation +
positive + location parameters in one flat unconstrained vector).

Run: python examples/advi_mixed_supports.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_bijectors import dists
from tpu_bijectors.infer import FullRankGaussian, Model, fit_advi


def main():
    model = Model(
        priors=dists.NamedProduct.of(
            mu=dists.Normal(0.0, 5.0),
            sigma=dists.LogNormal(0.0, 1.0),
            w=dists.Dirichlet(jnp.ones(4)),
            corr=dists.LKJ(3, 2.0),
        ),
        loglik=lambda x: -0.5 * (x["mu"] - 1.0) ** 2 / x["sigma"] ** 2,
    )
    res = fit_advi(
        model.logdensity_fn(),
        jax.random.PRNGKey(0),
        dim=model.dim(),
        q=FullRankGaussian.init(model.dim()),
        n_steps=3000,
        n_mc=32,
        learning_rate=1e-2,
    )
    print(f"ELBO: {-float(res.losses[0]):.2f} -> {-float(res.losses[-1]):.2f}")
    draws = res.q.sample(jax.random.PRNGKey(1), 4096)
    x = model.constrain(draws)
    print("E[w] =", jnp.mean(x["w"], 0))
    print("E[sigma] =", float(jnp.mean(x["sigma"])))
    print("corr draws stay SPD:", bool(jnp.all(jnp.linalg.eigvalsh(x["corr"]) > -1e-6)))


if __name__ == "__main__":
    main()
