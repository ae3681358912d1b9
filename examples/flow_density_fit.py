"""Fit a normalizing flow to 2-D data by maximum likelihood
(the reference's docs/src/flows.md workflow, TPU-native).

Run: python examples/flow_density_fit.py [planar|nsf]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
import optax

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.flows import PlanarLayer, RationalQuadraticSpline


def make_data(key, n=4096):
    z = jax.random.normal(key, (n, 2))
    return jnp.stack([z[:, 0], 0.5 * z[:, 0] ** 2 + 0.3 * z[:, 1]], -1)


def planar_flow(key, n_layers=8):
    return tb.Chain(tuple(PlanarLayer.init(k, 2) for k in jax.random.split(key, n_layers)))


def nsf_flow(key, k_bins=8, hidden=32):
    """Two RQS coupling layers with MLP conditioners (neural spline flow)."""
    n_out = 3 * k_bins - 1

    def init_mlp(k):
        k1, k2 = jax.random.split(k)
        return {
            "w1": 0.5 * jax.random.normal(k1, (1, hidden)),
            "b1": jnp.zeros(hidden),
            "w2": 0.01 * jax.random.normal(k2, (hidden, n_out)),
            "b2": jnp.zeros(n_out),
        }

    def theta(params, x2):
        h = jnp.tanh(x2 @ params["w1"] + params["b1"])
        raw = (h @ params["w2"] + params["b2"])[..., None, :]
        return RationalQuadraticSpline(
            raw[..., :k_bins], raw[..., k_bins : 2 * k_bins], raw[..., 2 * k_bins :], 5.0
        )

    k1, k2 = jax.random.split(key)
    return tb.Chain((
        tb.Coupling(theta, tb.PartitionMask(2, (0,)), init_mlp(k1)),
        tb.Coupling(theta, tb.PartitionMask(2, (1,)), init_mlp(k2)),
    ))


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "planar"
    key = jax.random.PRNGKey(0)
    data = make_data(jax.random.PRNGKey(1))
    base = dists.MvNormalDiag(jnp.zeros(2), jnp.ones(2))
    layers = planar_flow(key) if kind == "planar" else nsf_flow(key)

    def nll(layers):
        return -jnp.mean(tb.transformed(base, layers).logpdf(data))

    opt = optax.adam(3e-3)
    state = opt.init(layers)

    @jax.jit
    def step(layers, state):
        loss, g = jax.value_and_grad(nll)(layers)
        upd, state = opt.update(g, state)
        return optax.apply_updates(layers, upd), state, loss

    for i in range(1501):
        layers, state, loss = step(layers, state)
        if i % 300 == 0:
            print(f"step {i:5d}  nll {float(loss):8.4f}")

    flow = tb.transformed(base, layers)
    draws = flow.sample(jax.random.PRNGKey(2), (2048,))
    print("sample mean:", jnp.mean(draws, 0), " data mean:", jnp.mean(data, 0))


if __name__ == "__main__":
    main()
