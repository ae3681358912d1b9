"""Fused from_linked_vec_with_logpdf (the sampler hot path) must agree with
the unfused logpdf(from_linked(v)) + logdet composition exactly (f64).

The fused path evaluates factor-aware densities (LKJ from the upper Cholesky
factor, Wishart family from the lower factor) from the decomposition the
inverse link already computes — an 18x evals/s win on the bench model — so
this pins its correctness against the compositional definition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.vectorize import unconstrain

CASES = [
    ("lkj", dists.LKJ(6, 2.0), 0.5),
    ("lkj_eta1", dists.LKJ(3, 1.0), 1.0),
    ("wishart", dists.Wishart(9.0, 2.0 * jnp.eye(5, dtype=jnp.float64)), 0.3),
    ("invwishart", dists.InverseWishart(9.0, 2.0 * jnp.eye(5, dtype=jnp.float64)), 0.3),
    ("dirichlet", dists.Dirichlet(jnp.ones(7)), 1.0),
    ("lkjchol", dists.LKJCholesky(4, 1.5, "L"), 0.7),
    (
        "named",
        dists.NamedProduct.of(
            w=dists.Dirichlet(jnp.ones(4)), c=dists.LKJ(4, 1.5), s=dists.LogNormal()
        ),
        0.5,
    ),
    ("transformed", tb.transformed(dists.Beta(2.0, 3.0)), 1.0),
    ("iid_wishart", dists.IIDProduct(dists.Wishart(7.0, jnp.eye(3, dtype=jnp.float64)), 3), 0.3),
    ("iid_scalar", dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8), 1.0),
]


@pytest.mark.parametrize("name,d,scale", CASES, ids=[c[0] for c in CASES])
def test_fused_equals_unfused(name, d, scale):
    u = unconstrain(d)
    v = scale * jax.random.normal(
        jax.random.PRNGKey(3), (64, u.linked_vec_length), jnp.float64
    )
    x, ld = u.from_linked_vec(v)
    ref = d.logpdf(x) + ld
    x2, got = u.from_linked_vec_with_logpdf(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-9, atol=1e-9)
    la, lb = jax.tree_util.tree_leaves(x2), jax.tree_util.tree_leaves(x)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_fused_grad_finite():
    """NUTS needs grads through the fused path."""
    d = dists.NamedProduct.of(
        w=dists.Dirichlet(jnp.ones(4)),
        c=dists.LKJ(4, 2.0),
        v=dists.Wishart(7.0, jnp.eye(3, dtype=jnp.float64)),
    )
    u = unconstrain(d)
    g = jax.grad(lambda v: u.from_linked_vec_with_logpdf(v)[1])(
        0.3 * jax.random.normal(jax.random.PRNGKey(0), (u.linked_vec_length,), jnp.float64)
    )
    assert bool(jnp.all(jnp.isfinite(g)))


def test_model_logdensity_uses_fused_path():
    """Model.logdensity_fn must equal priors.logpdf + logdet + loglik."""
    from tpu_bijectors.infer import Model

    priors = dists.NamedProduct.of(mu=dists.Normal(), c=dists.LKJ(3, 2.0))
    model = Model(priors=priors, loglik=lambda x: 0.1 * x["mu"] ** 2)
    u = unconstrain(priors)
    v = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (u.linked_vec_length,), jnp.float64)
    x, ld = u.from_linked_vec(v)
    ref = priors.logpdf(x) + ld + 0.1 * x["mu"] ** 2
    np.testing.assert_allclose(
        float(model.logdensity_fn()(v)), float(ref), rtol=1e-10
    )


def test_batched_logdensity_matches_vmapped():
    """Model.batched_logdensity_fn == vmap(logdensity_fn) exactly (f64)."""
    from tpu_bijectors.infer import Model

    model = Model(
        priors=dists.NamedProduct.of(
            mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 4),
            w=dists.Dirichlet(jnp.ones(5)),
            c=dists.LKJ(3, 2.0),
        ),
        loglik=lambda x: 0.1 * jnp.sum(x["mu"]) + 0.01 * jnp.trace(x["c"]),
    )
    v = 0.4 * jax.random.normal(jax.random.PRNGKey(7), (32, model.dim()), jnp.float64)
    a = jax.vmap(model.logdensity_fn())(v)
    b = model.batched_logdensity_fn()(v)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)
    # single-example call also works (no batch axis)
    np.testing.assert_allclose(
        float(model.batched_logdensity_fn()(v[0])), float(a[0]), rtol=1e-12
    )


def test_linked_logdensity_matches_full_path():
    """logdensity-only path (no x materialization) == full fused path (f64),
    incl. the VecCorr factor-only route and nested products."""
    cases = [
        dists.LKJ(6, 2.0),
        dists.Dirichlet(jnp.ones(5)),
        dists.NamedProduct.of(
            c=dists.LKJ(4, 1.5),
            w=dists.Dirichlet(jnp.ones(4)),
            s=dists.IIDProduct(dists.LogNormal(), 3),
        ),
        dists.IIDProduct(dists.Wishart(7.0, jnp.eye(3, dtype=jnp.float64)), 2),
    ]
    for d in cases:
        u = unconstrain(d)
        v = 0.4 * jax.random.normal(jax.random.PRNGKey(5), (16, u.linked_vec_length), jnp.float64)
        ref = u.from_linked_vec_with_logpdf(v)[1]
        got = u.linked_logdensity(v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12,
                                   err_msg=type(d).__name__)
        g1 = jax.grad(lambda v: jnp.sum(u.linked_logdensity(v)))(v)
        g2 = jax.grad(lambda v: jnp.sum(u.from_linked_vec_with_logpdf(v)[1]))(v)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-10)


def test_dirichlet_fused_hook_declines_on_cpu():
    """On CPU the Dirichlet leaf-fusion hook declines (Pallas-only) and the
    generic path is used; results are the definition regardless."""
    d = dists.Dirichlet(jnp.asarray([2.0, 3.0, 4.0], jnp.float64))
    u = unconstrain(d)
    v = 0.5 * jax.random.normal(jax.random.PRNGKey(9), (8, 2), jnp.float64)
    x, lpld = u.from_linked_vec_with_logpdf(v)
    xr, ld = u.from_linked_vec(v)
    np.testing.assert_allclose(np.asarray(lpld), np.asarray(d.logpdf(xr) + ld), rtol=1e-12)


def test_lkj_cholesky_factor_only_path():
    """VecCholeskyBijector.inverse_log_det_and_factor_only +
    LKJCholesky.logpdf_from_factor: the logdensity-only path that never
    materializes the (K, K) factor must equal the generic definition, both
    modes, values and grads."""
    for mode in ("L", "U"):
        d = dists.LKJCholesky(5, 1.7, mode)
        u = unconstrain(d)
        v = 0.5 * jax.random.normal(
            jax.random.PRNGKey(13), (16, u.linked_vec_length), jnp.float64
        )
        # definition: constrained sample + density + logdet
        x, ld = u.from_linked_vec(v)
        ref = d.logpdf(x) + ld
        got = u.linked_logdensity(v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)
        # the same path JITTED: jnp constants become tracers under jit, so
        # static-layout helpers must stay numpy (regression: /verify caught
        # _segmented_cumsum exploding under jit on the TPU)
        got_jit = jax.jit(lambda v, d: unconstrain(d).linked_logdensity(v))(v, d)
        np.testing.assert_allclose(np.asarray(got_jit), np.asarray(ref), rtol=1e-12)
        # and the with-factor variant used by from_linked_vec_with_logpdf
        x2, lpld = u.from_linked_vec_with_logpdf(v)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(lpld), np.asarray(ref), rtol=1e-12)
        g1 = jax.grad(lambda v: jnp.sum(u.linked_logdensity(v)))(v)
        g2 = jax.grad(lambda v: jnp.sum(d.logpdf(u.from_linked_vec(v)[0]) + u.from_linked_vec(v)[1]))(v)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-9)
