"""Scalar bijector properties + reference golden values."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors.testing import assert_bijector_ok


SCALARS = [
    (tb.Exp(), 0.7),
    (tb.Log(), 1.3),
    (tb.Logit(0.0, 1.0), 0.3),
    (tb.Logit(-2.0, 3.0), 0.5),
    (tb.Shift(1.5), 0.4),
    (tb.Scale(2.5), 0.4),
    (tb.Scale(-1.5), 0.4),
    (tb.SignFlip(), 0.9),
    (tb.LeakyReLU(0.1), -0.7),
    (tb.LeakyReLU(0.1), 0.7),
    (tb.Softplus(), 0.7),
    (tb.Truncated(0.0, 1.0), 0.25),
    (tb.Truncated(0.0, math.inf), 2.5),
    (tb.Truncated(-math.inf, 2.0), -1.0),
    (tb.Truncated(), 0.3),
]


@pytest.mark.parametrize("b,x0", SCALARS)
def test_scalar_properties(b, x0):
    x = jnp.asarray(x0, jnp.float64)
    # scalar bijectors: jacobian test via 1-element vector
    y, ld = b.forward_and_log_det(x)
    x_rt = b.inverse(y)
    np.testing.assert_allclose(float(x_rt), float(x), atol=1e-10)
    x2, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-10)
    # AD oracle
    g = jax.grad(lambda v: b.forward(v))(x)
    np.testing.assert_allclose(float(jnp.log(jnp.abs(g))), float(ld), atol=1e-9)


def test_block_sums_event_dims():
    b = tb.Block(tb.Log(), 1)
    x = jnp.asarray([[1.0, 2.0, 3.0], [0.5, 1.5, 2.5]])
    y, ld = b.forward_and_log_det(x)
    assert ld.shape == (2,)
    np.testing.assert_allclose(np.asarray(ld), -np.log(np.asarray(x)).sum(-1))


def test_chain_composition():
    b = tb.Chain((tb.Shift(1.0), tb.Scale(2.0)))  # x -> 2x + 1
    x = jnp.asarray(3.0)
    y, ld = b.forward_and_log_det(x)
    assert float(y) == 7.0
    np.testing.assert_allclose(float(ld), math.log(2.0))
    x_rt, ld_inv = b.inverse_and_log_det(y)
    assert float(x_rt) == 3.0
    np.testing.assert_allclose(float(ld_inv), -math.log(2.0))


def test_inverse_is_involutive():
    b = tb.Logit(0.0, 1.0)
    ib = tb.inverse(b)
    assert tb.inverse(ib) is b
    assert isinstance(tb.inverse(tb.Exp()), tb.Log)
    assert isinstance(tb.inverse(tb.Log()), tb.Exp)


def test_golden_lognormal_logabsdetjac():
    """logabsdetjac(bijector(LogNormal()), e) == -1
    (reference doctest, src/Bijectors.jl:244-246)."""
    d = tb.dists.LogNormal()
    b = tb.bijector(d)
    ld = b.forward_and_log_det(jnp.asarray(math.e, jnp.float64))[1]
    np.testing.assert_allclose(float(ld), -1.0, atol=1e-12)


def test_truncated_monotonicity():
    assert tb.Truncated(0.0, 1.0).monotonically_increasing
    assert tb.Truncated(0.0, math.inf).monotonically_increasing
    assert tb.Truncated(-math.inf, 2.0).monotonically_decreasing
    assert tb.Truncated().monotonically_increasing


def test_batched_elementwise():
    b = tb.Logit(0.0, 1.0)
    x = jnp.linspace(0.05, 0.95, 12).reshape(3, 4)
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (3, 4) and ld.shape == (3, 4)
    np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(x), atol=1e-12)
