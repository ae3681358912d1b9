"""Chain-parallel NUTS over a device mesh (multi-chip / multi-host pattern).

Run on a pod slice as-is, or simulate a mesh on CPU:
    python examples/multichip_chain_parallel.py        # real devices
    SIM=8 python ...                                   # (set SIM first thing)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax

if os.environ.get("SIM"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(os.environ["SIM"]))

import jax.numpy as jnp

from tpu_bijectors import dists
from tpu_bijectors.infer import Model
from tpu_bijectors.shard import chain_parallel_nuts, make_mesh, multihost_init, shard_chains


def main():
    # multihost_init()  # uncomment on a multi-host pod (DCN process group)
    model = Model(
        priors=dists.NamedProduct.of(
            mu=dists.Normal(0.0, 5.0),
            sigma=dists.LogNormal(0.0, 1.0),
            w=dists.Dirichlet(jnp.ones(8)),
        ),
        loglik=None,
    )
    mesh = make_mesh("chain")
    n_dev = mesh.devices.size
    n_chains = 32 * n_dev
    print(f"{n_dev} devices, {n_chains} chains")

    q0 = shard_chains(mesh, model.init_positions(jax.random.PRNGKey(0), n_chains, 0.5))
    samples, state, stats = chain_parallel_nuts(
        model.logdensity_fn(), mesh, jax.random.PRNGKey(1), q0,
        n_warmup=400, n_samples=400,
    )
    x = model.constrain(samples.reshape(-1, model.dim()))
    print("E[w] =", jnp.mean(x["w"], 0), "(prior: 1/8 each)")
    print("accept:", float(jnp.mean(stats.accept_prob)),
          "divergent:", int(jnp.sum(stats.diverging)))

    # the ADVI leg of the same DP axis: MC samples sharded over the mesh,
    # one in-step pmean of (loss, grad) — trajectory identical to the
    # unsharded fit_advi on the same key (up to summation order)
    from tpu_bijectors.shard import chain_parallel_advi

    res = chain_parallel_advi(
        model.batched_logdensity_fn(), mesh, jax.random.PRNGKey(2),
        model.dim(), n_steps=500, n_mc=8 * n_dev,
    )
    print("ADVI final ELBO:", -float(res.losses[-1]))


if __name__ == "__main__":
    main()
