"""Property-test harness.

TPU-native port of the reference's shipped test machinery
(/root/reference/src/vector/test_utils.jl and test/bijectors/utils.jl):

* round-trip b⁻¹(b(x)) ≈ x and b(b⁻¹(y)) ≈ y;
* logdetJ(b⁻¹, y) == −logdetJ(b, x);
* analytic logdetJ vs `jax.jacfwd` determinant (the ForwardDiff oracle,
  test_utils.jl:573-633), including the square-Jacobian trick for
  dimension-changing bijectors (test_utils.jl:92-244): callers provide
  `to_free`/`from_free` charts that parameterize the constrained manifold.
* shape algebra consistency (`output_size`, utils.jl:36-38).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_logdet_against_jacobian(
    fn, x_flat, expected_logdet, atol=1e-8, rtol=1e-8, msg=""
):
    """|logdet(jacobian(fn)(x))| vs analytic value; fn: R^n -> R^n flat."""
    J = jax.jacfwd(fn)(x_flat)
    sign, logdet = jnp.linalg.slogdet(J)
    np.testing.assert_allclose(
        np.asarray(logdet), np.asarray(expected_logdet), atol=atol, rtol=rtol,
        err_msg=f"AD-vs-analytic logdetJ mismatch {msg}",
    )


def random_unconstrained(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale)


def assert_bijector_ok(
    b,
    x,
    *,
    to_free=None,
    from_free=None,
    y_to_free=None,
    y_from_free=None,
    atol=1e-8,
    rtol=1e-7,
    test_jacobian=True,
    event_ndims_in=None,
    event_ndims_out=None,
):
    """Run the reference's full property set on bijector `b` at point `x`.

    For dimension-preserving bijectors the free charts default to ravel.
    For dimension-changing ones (simplex, corr, pd-vec, ...) pass:
      to_free(x event) -> free vector, from_free(free) -> x event
      y_to_free / y_from_free similarly for the output space (default ravel).
    """
    n_in = b.event_ndims_in if event_ndims_in is None else event_ndims_in
    n_out = b.event_ndims_out if event_ndims_out is None else event_ndims_out

    y, ld_fwd = b.forward_and_log_det(x)
    y2 = b.forward(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=atol, rtol=rtol)

    # shape algebra
    ev_in = x.shape[len(x.shape) - n_in :] if n_in else ()
    ev_out = y.shape[len(y.shape) - n_out :] if n_out else ()
    assert tuple(b.forward_event_shape(ev_in)) == tuple(ev_out), (
        f"forward_event_shape({ev_in}) = {b.forward_event_shape(ev_in)} != {ev_out}"
    )
    assert tuple(b.inverse_event_shape(ev_out)) == tuple(ev_in)

    # round-trips
    x_rt = b.inverse(y)
    np.testing.assert_allclose(
        np.asarray(x_rt), np.asarray(x), atol=atol, rtol=rtol,
        err_msg="inverse(forward(x)) != x",
    )
    x3, ld_inv = b.inverse_and_log_det(y)
    np.testing.assert_allclose(np.asarray(x3), np.asarray(x), atol=atol, rtol=rtol)

    # logdet consistency: logdetJ(b⁻¹, y) == -logdetJ(b, x)
    np.testing.assert_allclose(
        np.asarray(ld_inv), np.asarray(-ld_fwd), atol=atol, rtol=rtol,
        err_msg="inverse log-det != -forward log-det",
    )

    if not test_jacobian:
        return

    # AD oracle (single event only — strip batch by requiring event input)
    assert x.ndim == n_in, "pass a single event (no batch dims) for jacobian test"

    if to_free is None:
        to_free = lambda e: jnp.ravel(e)
        from_free = lambda f: jnp.reshape(f, ev_in)
    if y_to_free is None:
        y_to_free = lambda e: jnp.ravel(e)
        y_from_free = lambda f: jnp.reshape(f, ev_out)

    def flat_fwd(f):
        return y_to_free(b.forward(from_free(f)))

    xf = to_free(x)
    ld = ld_fwd
    # correction: the chart may itself have a Jacobian (e.g. dropping the
    # last simplex coordinate has logdet 0 w.r.t. the free coords)
    check_logdet_against_jacobian(flat_fwd, xf, ld, atol=atol, rtol=rtol, msg="fwd")

    def flat_inv(f):
        return to_free(b.inverse(y_from_free(f)))

    yf = y_to_free(y)
    check_logdet_against_jacobian(flat_inv, yf, ld_inv, atol=atol, rtol=rtol, msg="inv")
