"""Stacked / Product / Named / Reshape / Permute / Coupling bijectors
(reference test/bijectors/{stacked,product_bijector,named_stacked,permute,
coupling}.jl)."""

import jax
import jax.numpy as jnp
import numpy as np

import tpu_bijectors as tb
from tpu_bijectors.testing import check_logdet_against_jacobian


def test_stacked_basic(rng):
    b = tb.Stacked.from_lengths(
        (tb.Exp(), tb.Block(tb.Logit(0.0, 1.0), 1), tb.Identity()), (1, 2, 3)
    )
    x = jnp.asarray([0.5, 0.3, 0.7, -1.0, 2.0, 0.1])
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (6,)
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-12)
    check_logdet_against_jacobian(b.forward, x, ld, atol=1e-9)


def test_stacked_dim_changing(key):
    """Stacked with a simplex block changes total length."""
    b = tb.Stacked.from_lengths((tb.SimplexBijector(), tb.Block(tb.Log(), 1)), (4, 2))
    assert b.length_in == 6 and b.length_out == 5
    x = jnp.concatenate(
        [jax.random.dirichlet(key, jnp.ones(4, jnp.float64)), jnp.asarray([1.5, 2.5])]
    )
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (5,)
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-9)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-9)


def test_stacked_batched(rng):
    b = tb.Stacked.from_lengths((tb.Block(tb.Exp(), 1), tb.Block(tb.Identity(), 1)), (2, 2))
    x = jnp.asarray(rng.standard_normal((7, 4)))
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (7, 4) and ld.shape == (7,)


def test_product_bijector(rng):
    b = tb.ProductBijector((tb.Exp(), tb.Identity(), tb.Logit(0.0, 1.0)))
    x = jnp.asarray([0.5, -1.0, 0.25])
    y, ld = b.forward_and_log_det(x)
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-12)
    check_logdet_against_jacobian(b.forward, x, ld, atol=1e-9)


def test_named_transform():
    b = tb.NamedTransform.of(a=tb.Exp(), c=tb.Block(tb.Logit(0.0, 1.0), 1))
    x = {"a": jnp.asarray(0.3), "b": jnp.asarray([1.0, 2.0]), "c": jnp.asarray([0.2, 0.8])}
    y, ld = b.forward_and_log_det(x)
    np.testing.assert_allclose(np.asarray(y["b"]), np.asarray(x["b"]))  # untouched
    x_rt, ld_inv = b.inverse_and_log_det(y)
    for k in x:
        np.testing.assert_allclose(np.asarray(x_rt[k]), np.asarray(x[k]), atol=1e-12)
    np.testing.assert_allclose(float(ld_inv), -float(ld), atol=1e-12)


def test_named_coupling():
    b = tb.NamedCoupling("x", ("s",), lambda s: tb.Scale(s))
    v = {"x": jnp.asarray([1.0, 2.0]), "s": jnp.asarray(3.0)}
    y, ld = b.forward_and_log_det(v)
    np.testing.assert_allclose(np.asarray(y["x"]), [3.0, 6.0])
    np.testing.assert_allclose(float(ld), 2 * np.log(3.0))
    x_rt, _ = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt["x"]), np.asarray(v["x"]), atol=1e-12)


def test_reshape():
    b = tb.Reshape((6,), (2, 3))
    x = jnp.arange(6.0)
    y, ld = b.forward_and_log_det(x)
    assert y.shape == (2, 3) and float(ld) == 0.0
    np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(x))
    assert isinstance(tb.inverse(b), tb.Reshape)
    # batched
    xb = jnp.ones((5, 6))
    yb, ldb = b.forward_and_log_det(xb)
    assert yb.shape == (5, 2, 3) and ldb.shape == (5,)


def test_permute(rng):
    b = tb.Permute((2, 0, 1))
    x = jnp.asarray([10.0, 20.0, 30.0])
    y = b.forward(x)
    np.testing.assert_allclose(np.asarray(y), [30.0, 10.0, 20.0])
    np.testing.assert_allclose(np.asarray(b.inverse(y)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(tb.inverse(b).forward(y)), np.asarray(x))


def test_partition_mask():
    m = tb.PartitionMask(3, (0,), (1,))
    x = jnp.asarray([1.0, 2.0, 3.0])
    x1, x2, x3 = m.partition(x)
    np.testing.assert_allclose(np.asarray(x1), [1.0])
    np.testing.assert_allclose(np.asarray(x2), [2.0])
    np.testing.assert_allclose(np.asarray(x3), [3.0])
    np.testing.assert_allclose(np.asarray(m.combine(x1, x2, x3)), np.asarray(x))


def test_coupling_shift(rng):
    """Coupling with Shift conditioner (reference test/bijectors/coupling.jl
    pattern: theta = x2 -> Shift(x2))."""
    mask = tb.PartitionMask(3, (0,), (1,))
    b = tb.Coupling(lambda x2: tb.Block(tb.Shift(x2), 1), mask)
    x = jnp.asarray([1.0, 2.0, 3.0])
    y, ld = b.forward_and_log_det(x)
    np.testing.assert_allclose(np.asarray(y), [3.0, 2.0, 3.0])
    np.testing.assert_allclose(float(ld), 0.0)
    x_rt, _ = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-12)


def test_coupling_batched_scale(rng):
    mask = tb.PartitionMask(4, (0, 1), (2, 3))
    b = tb.Coupling(lambda x2: tb.Block(tb.Scale(jnp.exp(x2)), 1), mask)
    x = jnp.asarray(rng.standard_normal((5, 4)))
    y, ld = b.forward_and_log_det(x)
    assert ld.shape == (5,)
    x_rt, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ld_inv), -np.asarray(ld), atol=1e-10)


def test_permute_constructor_forms(rng):
    """All reference constructor forms agree (test/bijectors/permute.jl):
    index vector == permutation matrix == pairs mapping."""
    import pytest
    from tpu_bijectors import Permute, inverse

    b2 = Permute((1, 0))
    b1 = Permute.from_matrix([[0, 1], [1, 0]])
    b3 = Permute.from_pairs(2, {1: 0, 0: 1})
    assert b1.perm == b2.perm == b3.perm
    x = jnp.asarray([1.0, 2.0])
    for b in (b1, b2, b3):
        np.testing.assert_array_equal(np.asarray(inverse(b).forward(b.forward(x))), np.asarray(x))

    # one fixed entry
    c2 = Permute((1, 0, 2))
    c1 = Permute.from_matrix([[0, 1, 0], [1, 0, 0], [0, 0, 1]])
    c3 = Permute.from_pairs(3, {1: 0, 0: 1})
    assert c1.perm == c2.perm == c3.perm

    # non-injective maps must fail (permute.jl:8-10)
    with pytest.raises(ValueError):
        Permute.from_pairs(2, {1: 0, 0: 0})
    with pytest.raises(ValueError):
        Permute.from_matrix([[1, 1], [0, 0]])
