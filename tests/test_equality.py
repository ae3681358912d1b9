"""Bijector equality semantics + remaining Permute constructor forms
(reference test/bijectors/equality.jl and src/bijectors/permute.jl:84-153;
VERDICT r1 Missing #6)."""

import copy

import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors import Permute, Stacked
from tpu_bijectors.bijectors import (
    Block,
    Chain,
    Exp,
    Identity,
    Log,
    Logit,
    PDBijector,
    Scale,
    Shift,
    SimplexBijector,
    Truncated,
    inverse,
)


def _pool():
    # pairwise-distinct instances, mirroring equality.jl's matrix check
    return [
        Identity(),
        Block(Exp(), 1),
        Block(Log(), 1),
        Scale(2.0),
        Scale(3.0),
        Scale(jnp.asarray([1.0, 2.0])),
        Scale(jnp.asarray([1.0, 3.0])),
        Shift(2.0),
        Shift(jnp.asarray([2.0, 1.0])),
        Logit(1.0, 2.0),
        Logit(1.0, 3.0),
        PDBijector(),
        Permute((0, 2, 1)),
        Permute((2, 0, 1)),
        SimplexBijector(),
        Chain((Exp(), Log())),
        Chain((Log(), Exp())),
        Stacked((Exp(), Log()), ((0, 1), (1, 2))),
        Truncated(1.0, 2.0, lower_finite=True, upper_finite=True),
        Truncated(0.0, 2.0, lower_finite=True, upper_finite=True),
    ]


def test_equality_matrix():
    bs = _pool()
    for i, bi in enumerate(bs):
        for j, bj in enumerate(bs):
            if i == j:
                assert bi == copy.deepcopy(bj), (i, bi)
                assert inverse(bi) == inverse(copy.deepcopy(bj)), (i, bi)
            else:
                assert bi != bj, (i, j, bi, bj)


def test_array_field_equality_is_value_based():
    a = Shift(jnp.asarray([1.0, 2.0]))
    b = Shift(jnp.asarray([1.0, 2.0]))
    assert a == b
    assert a != Shift(jnp.asarray([1.0, 2.0, 3.0]))  # shape mismatch
    assert a != Shift(1.0)  # scalar vs array


def test_permute_from_destinations():
    # reference scatter convention (permute.jl:90-100): y[dests[i]] = x[i]
    b = Permute.from_destinations([1, 2, 0])
    x = jnp.asarray([10.0, 20.0, 30.0])
    y = b.forward(x)
    np.testing.assert_array_equal(np.asarray(y), [30.0, 10.0, 20.0])
    np.testing.assert_array_equal(np.asarray(b.inverse(y)), np.asarray(x))


def test_permute_from_vector_pairs():
    # reference Permute(n, [0,1] => [1,0]) form (permute.jl:125-153)
    b = Permute.from_vector_pairs(4, ([0, 1], [1, 0]))
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(np.asarray(b.forward(x)), [2.0, 1.0, 3.0, 4.0])
    # equivalent to the dict form
    assert b == Permute.from_pairs(4, {0: 1, 1: 0})
    with pytest.raises(ValueError):
        Permute.from_vector_pairs(4, ([0, 1], [1]))
    with pytest.raises(ValueError):
        Permute.from_vector_pairs(4, ([0], [1]), ([0], [2]))


def test_permute_matrix_and_vector_forms_consistent():
    A = np.zeros((3, 3))
    # y = A x with A[dst, src] = 1: send x0->y1, x1->y2, x2->y0
    A[1, 0] = A[2, 1] = A[0, 2] = 1.0
    assert Permute.from_matrix(A) == Permute.from_destinations([1, 2, 0])
