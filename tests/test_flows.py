"""Flow layers: Planar, Radial, RQS, BatchNorm, find_alpha
(reference test/normalising_flows.jl, test/bijectors/rational_quadratic_spline.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors.flows import (
    InvertibleBatchNorm,
    PlanarLayer,
    RadialLayer,
    RationalQuadraticSpline,
    find_alpha,
)
from tpu_bijectors.testing import check_logdet_against_jacobian


def test_find_alpha_grid():
    """Dense grid incl. the empty-bracket and catastrophic-cancellation
    regressions (reference test/normalising_flows.jl:47-71)."""
    wt_ys = jnp.asarray([-10.0, -1.0, 0.0, 0.5, 3.0, 20.0])
    wt_us = jnp.asarray([-0.99, -0.5, 0.0, 0.5, 2.0, 10.0])
    bs = jnp.asarray([-1e8, -10.0, 0.0, 1.0, 1e8])
    W, U, B = jnp.meshgrid(wt_ys, wt_us, bs, indexing="ij")
    alpha = find_alpha(W, U, B)
    resid = alpha + U * jnp.tanh(alpha + B) - W
    assert np.all(np.isfinite(np.asarray(alpha)))
    np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-7)
    # empty bracket: wt_u_hat = 0 -> alpha = wt_y exactly
    np.testing.assert_allclose(
        np.asarray(find_alpha(jnp.asarray(1.3), jnp.asarray(0.0), jnp.asarray(5.0))),
        1.3,
    )


def test_find_alpha_gradients():
    """Implicit-function JVP vs numerical differences."""
    f = lambda w, u, b: find_alpha(w, u, b)
    w0, u0, b0 = 0.7, 1.3, -0.2
    g = jax.grad(f, argnums=(0, 1, 2))(w0, u0, b0)
    eps = 1e-6
    for i, gi in enumerate(g):
        args_p = [w0, u0, b0]
        args_m = [w0, u0, b0]
        args_p[i] += eps
        args_m[i] -= eps
        fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
        np.testing.assert_allclose(float(gi), fd, rtol=1e-5)


@pytest.mark.parametrize("d", [2, 5])
def test_planar_roundtrip(d, key):
    b = PlanarLayer.init(key, d, jnp.float64)
    z = jax.random.normal(jax.random.PRNGKey(7), (11, d), jnp.float64)
    y, ld = b.forward_and_log_det(z)
    assert ld.shape == (11,)
    z_rt = b.inverse(y)
    np.testing.assert_allclose(np.asarray(z_rt), np.asarray(z), atol=1e-8)
    # logdet vs AD (reference test/normalising_flows.jl:18,28-32)
    z0 = z[0]
    _, ld0 = b.forward_and_log_det(z0)
    check_logdet_against_jacobian(b.forward, z0, ld0, atol=1e-8)


@pytest.mark.parametrize("d", [2, 5])
def test_radial_roundtrip(d, key):
    b = RadialLayer.init(key, d, jnp.float64)
    z = jax.random.normal(jax.random.PRNGKey(8), (11, d), jnp.float64)
    y, ld = b.forward_and_log_det(z)
    z_rt = b.inverse(y)
    np.testing.assert_allclose(np.asarray(z_rt), np.asarray(z), atol=1e-8)
    z0 = z[0]
    _, ld0 = b.forward_and_log_det(z0)
    check_logdet_against_jacobian(b.forward, z0, ld0, atol=1e-8)


def test_rqs_scalar(key):
    b = RationalQuadraticSpline.init(key, K=8, B=3.0, dtype=jnp.float64)
    x = jnp.linspace(-5.0, 5.0, 41)  # covers outside-identity region
    y, ld = b.forward_and_log_det(x)
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ld_inv), -np.asarray(ld), atol=1e-9)
    # identity outside [-B, B]
    np.testing.assert_allclose(np.asarray(y[0]), -5.0)
    np.testing.assert_allclose(np.asarray(ld[0]), 0.0)
    # AD oracle inside
    g = jax.vmap(jax.grad(lambda v: b.forward(v)))(x)
    np.testing.assert_allclose(np.asarray(jnp.log(jnp.abs(g))), np.asarray(ld), atol=1e-8)
    # monotone increasing
    assert np.all(np.diff(np.asarray(y)) > 0)


def test_rqs_per_dim(key):
    d, K = 3, 6
    b = RationalQuadraticSpline.init(key, K=K, B=2.0, event_dim=d, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(3), (9, d), jnp.float64)
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (9, d) and ld.shape == (9, d)
    x_rt = b.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-9)


def test_batchnorm_eval_roundtrip(key):
    bn = InvertibleBatchNorm.init(4, dtype=jnp.float64)
    bn = tb.pytree_dataclass  # noqa - just to ensure import works
    from tpu_bijectors.tree import replace

    layer = InvertibleBatchNorm.init(4, dtype=jnp.float64)
    layer = replace(
        layer,
        m=jnp.asarray([0.5, -0.5, 1.0, 0.0]),
        v=jnp.asarray([1.0, 2.0, 0.5, 3.0]),
        logs=jnp.asarray([0.1, -0.2, 0.0, 0.3]),
        b=jnp.asarray([1.0, 0.0, -1.0, 0.5]),
    )
    x = jax.random.normal(key, (6, 4), jnp.float64)
    y, ld = layer.forward_and_log_det(x)
    assert ld.shape == (6,)
    x_rt, ld_inv = layer.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ld_inv), -np.asarray(ld), atol=1e-10)
    # logdet vs AD on one row (jacobian of row -> row is diagonal)
    g = jax.jacfwd(lambda v: layer.forward(v))(x[0])
    np.testing.assert_allclose(
        float(jnp.linalg.slogdet(g)[1]), float(ld[0]), atol=1e-9
    )


def test_batchnorm_train_updates(key):
    layer = InvertibleBatchNorm.init(3, dtype=jnp.float64)
    x = jax.random.normal(key, (64, 3), jnp.float64) * 2.0 + 1.0
    y, ld, updated = layer.forward_and_log_det_train(x)
    # output is normalized
    np.testing.assert_allclose(np.asarray(jnp.mean(y, 0)), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(jnp.var(y, 0)), 1.0, atol=1e-4)
    # running stats moved toward batch stats
    assert np.all(np.asarray(updated.m) != np.asarray(layer.m))


def test_cdf_quantile_bijectors(key):
    d = tb.dists.Normal(1.0, 2.0)
    b = tb.CDFBijector(d)
    x = jnp.asarray([-1.0, 0.5, 3.0], jnp.float64)
    y, ld = b.forward_and_log_det(x)
    assert np.all((np.asarray(y) > 0) & (np.asarray(y) < 1))
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ld_inv), -np.asarray(ld), atol=1e-9)
    q = tb.inverse(b)
    assert isinstance(q, tb.QuantileBijector)
    np.testing.assert_allclose(np.asarray(q.forward(y)), np.asarray(x), atol=1e-9)


def test_planar_flow_fit_smoke(key):
    """End-to-end flow density fit (docs/src/flows.md pattern): maximize
    likelihood of data under transformed(MvNormal, PlanarLayer)."""
    import optax

    d = 2
    kd, ki = jax.random.split(key)
    data = jax.random.normal(kd, (256, d), jnp.float64) * 0.5 + jnp.asarray([1.0, -1.0])
    base = tb.dists.MvNormalDiag(jnp.zeros(d), jnp.ones(d))
    layer = PlanarLayer.init(ki, d, jnp.float64)

    def nll(layer):
        td = tb.transformed(base, layer)
        return -jnp.mean(td.logpdf(data))

    opt = optax.adam(1e-2)
    state = opt.init(layer)
    l0 = float(nll(layer))

    @jax.jit
    def step(layer, state):
        loss, g = jax.value_and_grad(nll)(layer)
        updates, state = opt.update(g, state)
        return optax.apply_updates(layer, updates), state, loss

    for _ in range(60):
        layer, state, loss = step(layer, state)
    assert float(loss) < l0, "flow training did not decrease NLL"


def test_neural_spline_flow_coupling_rqs(key):
    """RealNVP/NSF composition: Coupling layers whose MLP conditioner emits
    RationalQuadraticSpline parameters for the transformed coordinate —
    end-to-end MLE fit on a curved 2D target (the reference composes the same
    pieces; coupling.jl + rational_quadratic_spline.jl)."""
    import optax
    from tpu_bijectors import Coupling, PartitionMask, Chain, transformed
    from tpu_bijectors import dists
    from tpu_bijectors.flows import RationalQuadraticSpline

    Kbins, H = 6, 16
    f64 = jnp.float64

    def init_mlp(k, din, dout):
        k1, k2 = jax.random.split(k)
        return {
            "w1": 0.5 * jax.random.normal(k1, (din, H), f64),
            "b1": jnp.zeros(H, f64),
            "w2": 0.01 * jax.random.normal(k2, (H, dout), f64),
            "b2": jnp.zeros(dout, f64),
        }

    n_out = 3 * Kbins - 1  # widths K, heights K, derivatives K-1

    def theta(params, x2):
        h = jnp.tanh(x2 @ params["w1"] + params["b1"])
        raw = (h @ params["w2"] + params["b2"])[..., None, :]  # align with x1's dim
        return RationalQuadraticSpline(
            raw[..., :Kbins], raw[..., Kbins : 2 * Kbins], raw[..., 2 * Kbins :], 4.0
        )

    k1, k2, k3 = jax.random.split(key, 3)
    layers = Chain((
        Coupling(theta, PartitionMask(2, (0,)), init_mlp(k1, 1, n_out)),
        Coupling(theta, PartitionMask(2, (1,)), init_mlp(k2, 1, n_out)),
    ))
    base = dists.MvNormalDiag(jnp.zeros(2, f64), jnp.ones(2, f64))

    # curved target data
    z = jax.random.normal(k3, (512, 2), f64)
    data = jnp.stack([z[:, 0], 0.5 * z[:, 0] ** 2 + 0.3 * z[:, 1]], -1)

    def nll(layers):
        return -jnp.mean(transformed(base, layers).logpdf(data))

    opt = optax.adam(5e-3)
    state = opt.init(layers)

    @jax.jit
    def step(layers, state):
        loss, g = jax.value_and_grad(nll)(layers)
        upd, state = opt.update(g, state)
        return optax.apply_updates(layers, upd), state, loss

    loss0 = float(nll(layers))
    for _ in range(300):
        layers, state, loss = step(layers, state)
    assert np.isfinite(float(loss)) and float(loss) < loss0 - 0.1

    # invertibility of the trained flow + sampling stays finite
    flow = transformed(base, layers)
    s = flow.sample(jax.random.PRNGKey(99), (256,))
    assert bool(jnp.all(jnp.isfinite(s)))
    y = layers.forward(data)
    x_rt = layers.inverse(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(data), atol=1e-8)


def test_flow_logdet_vs_ad_jacobian(key):
    """Planar/Radial/BatchNorm logdetJ against the AD Jacobian determinant
    (reference test/normalising_flows.jl:18-32)."""
    from tpu_bijectors.flows import InvertibleBatchNorm, PlanarLayer, RadialLayer

    d = 3
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k2, (d,), jnp.float64)
    cases = [
        PlanarLayer.init(k1, d, jnp.float64),
        RadialLayer.init(k1, d, jnp.float64),
    ]
    for b in cases:
        _, ld = b.forward_and_log_det(x)
        J = jax.jacfwd(b.forward)(x)
        _, logdet = jnp.linalg.slogdet(J)
        np.testing.assert_allclose(float(ld), float(logdet), rtol=1e-9,
                                   err_msg=type(b).__name__)
