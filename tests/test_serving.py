"""Serving export: serialized StableHLO artifacts reproduce the live
density/gradient/constrain computations (to float round-off — the
artifact's fusion order may differ from the live jit) and enforce the
frozen shape contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_bijectors import dists, serving
from tpu_bijectors.infer import Model


@pytest.fixture(scope="module")
def model():
    return Model(
        priors=dists.NamedProduct.of(
            mu=dists.Normal(0.0, 2.0),
            s=dists.LogNormal(0.0, 0.5),
            w=dists.Dirichlet(jnp.ones(3)),
        ),
        loglik=lambda x: -0.5 * (x["mu"] - 1.0) ** 2 / x["s"] ** 2,
    )


def test_export_logdensity_roundtrip(model, key, tmp_path):
    B = 32
    v = 0.5 * jax.random.normal(key, (B, model.dim()), jnp.float64)
    p = str(tmp_path / "logp.bin")
    blob = serving.export_logdensity(model, B, path=p)
    for src in (blob, p):  # bytes and file paths both load
        fn = serving.load(src)
        np.testing.assert_allclose(
            np.asarray(fn(v)),
            np.asarray(model.batched_logdensity_fn()(v)),
            rtol=1e-12,
        )


def test_export_with_grad_matches_vjp(model, key):
    B = 16
    v = 0.3 * jax.random.normal(key, (B, model.dim()), jnp.float64)
    fn = serving.load(serving.export_logdensity(model, B, with_grad=True))
    logp, grad = fn(v)
    base = model.batched_logdensity_fn()
    lp_ref, vjp = jax.vjp(base, v)
    (g_ref,) = vjp(jnp.ones_like(lp_ref))
    np.testing.assert_allclose(np.asarray(logp), np.asarray(lp_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref), rtol=1e-11,
                               atol=1e-13)


def test_export_constrain(model, key):
    B = 8
    v = jax.random.normal(key, (B, model.dim()), jnp.float64)
    fn = serving.load(serving.export_constrain(model, B))
    out = fn(v)
    ref = model.constrain(v)
    assert set(out.keys()) == set(ref.keys())
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))
    w = np.asarray(out["w"])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-12)


def test_shape_contract_enforced(model, key):
    fn = serving.load(serving.export_logdensity(model, 32))
    bad = jnp.zeros((16, model.dim()), jnp.float64)
    with pytest.raises(Exception):
        fn(bad)
