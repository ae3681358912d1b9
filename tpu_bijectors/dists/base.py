"""Minimal distributions layer (the reference outsources this to
Distributions.jl — see SURVEY.md §2.7; we must supply it ourselves).

Design (TPU-first):

* every distribution is a frozen pytree dataclass — parameters are leaves, so
  distributions pass through ``jit``/``grad``/``vmap`` boundaries freely;
* ``logpdf(x)`` sums over event dims and broadcasts over any leading batch
  dims of ``x`` *and* of the parameters — one fused XLA computation for an
  entire (chains, batch) block;
* ``sample(key, sample_shape)`` returns ``sample_shape + batch_shape +
  event_shape``;
* ``support`` is static metadata driving the `bijector(d)` registry (the
  reference does this with Julia type unions, src/Bijectors.jl:268-320).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..tree import pytree_dataclass

__all__ = [
    "Distribution",
    "Support",
    "interval",
    "positive",
    "unit_interval",
    "real_line",
    "lower_bounded",
    "upper_bounded",
    "SIMPLEX",
    "POSITIVE_DEFINITE",
    "CORRELATION",
    "CHOLESKY_CORRELATION",
    "REAL_VECTOR",
]


@dataclass(frozen=True)
class Support:
    """Static support descriptor.

    ``kind``: 'interval' (with lower/upper, possibly infinite), 'simplex',
    'pd', 'corr', 'chol_corr', 'real_vector', 'discrete'.
    Bounds are python floats when static; distributions with parameter-
    dependent bounds (e.g. Uniform, Pareto) override `support` as a property
    returning array bounds plus static finiteness flags.
    """

    kind: str = "interval"
    lower: object = -math.inf
    upper: object = math.inf
    lower_finite: bool = False
    upper_finite: bool = False


def interval(lo, hi) -> Support:
    def _fin(v):
        if isinstance(v, (int, float)):
            return math.isfinite(v)
        return bool(np.all(np.isfinite(np.asarray(jax.device_get(v)))))

    lf = _fin(lo) if not isinstance(lo, (int, float)) else math.isfinite(lo)
    uf = _fin(hi) if not isinstance(hi, (int, float)) else math.isfinite(hi)
    # Traced arrays can't be checked; callers should pass static bounds or
    # construct Support directly with explicit flags.
    return Support("interval", lo, hi, lf, uf)


def real_line() -> Support:
    return Support("interval", -math.inf, math.inf, False, False)


def positive() -> Support:
    return Support("interval", 0.0, math.inf, True, False)


def unit_interval() -> Support:
    return Support("interval", 0.0, 1.0, True, True)


def lower_bounded(lo) -> Support:
    return Support("interval", lo, math.inf, True, False)


def upper_bounded(hi) -> Support:
    return Support("interval", -math.inf, hi, False, True)


SIMPLEX = Support("simplex")
POSITIVE_DEFINITE = Support("pd")
CORRELATION = Support("corr")
CHOLESKY_CORRELATION = Support("chol_corr")
REAL_VECTOR = Support("real_vector")
DISCRETE = Support("discrete")


class Distribution:
    """Abstract distribution.

    Subclasses implement ``logpdf``, ``sample`` and declare ``event_ndims``
    (an int) plus ``event_shape`` (a property when shape depends on params).
    """

    event_ndims: int = 0

    # -- shapes --------------------------------------------------------------

    @property
    def event_shape(self) -> tuple:
        return ()

    @property
    def batch_shape(self) -> tuple:
        """Broadcast shape of the parameters (default: scalar params)."""
        leaves = jax.tree_util.tree_leaves(self)
        shapes = [jnp.shape(l) for l in leaves]
        n = self.event_ndims
        # strip event dims contributed by per-event parameters
        shapes = [s[: len(s) - n] if len(s) >= n else s for s in shapes]
        if not shapes:
            return ()
        return np.broadcast_shapes(*shapes)

    # -- core ------------------------------------------------------------------

    def logpdf(self, x):
        raise NotImplementedError(type(self).__name__)

    def sample(self, key, sample_shape: tuple = ()):
        raise NotImplementedError(type(self).__name__)

    def sample_and_logpdf(self, key, sample_shape: tuple = ()):
        x = self.sample(key, sample_shape)
        return x, self.logpdf(x)

    # -- registry metadata ------------------------------------------------------

    @property
    def support(self) -> Support:
        return real_line()

    # -- optional (used by CDF/Quantile bijectors and some tests) --------------

    def cdf(self, x):
        raise NotImplementedError(type(self).__name__)

    def quantile(self, q):
        """Default quantile: bracket expansion + fixed bisection on `cdf`
        (static trip counts; subclasses override when a closed form exists).

        Differentiable: routed through an implicit-function ``custom_jvp``
        (``_generic_quantile``) — AD never sees the iteration, it sees
        dx = (dq − ∂cdf/∂θ·dθ) / pdf(x). This mirrors the reference, whose
        AD backends differentiate `quantile` through Distributions.jl's
        rules (/root/reference/src/bijectors/cdf_quantile.jl:39-93)."""
        return _generic_quantile(self, q)

    def _quantile_bisect(self, q):
        """The non-differentiable primal solver behind `quantile`."""
        import jax.numpy as jnp
        from jax import lax

        q = jnp.asarray(q)
        dtype = jnp.result_type(q, float)
        q = q.astype(dtype)
        s = self.support
        lo = jnp.full(jnp.shape(q), s.lower if s.lower_finite else -1.0, dtype)
        hi = jnp.full(jnp.shape(q), s.upper if s.upper_finite else 1.0, dtype)
        # an infinite side must start its expansion beyond the finite side
        # (e.g. support [100, inf): hi=1 would never bracket the quantile)
        if s.lower_finite and not s.upper_finite:
            hi = jnp.maximum(hi, lo + 1.0)
        if s.upper_finite and not s.lower_finite:
            lo = jnp.minimum(lo, hi - 1.0)
        if not s.lower_finite or not s.upper_finite:
            # geometric bracket expansion on the unbounded side(s)
            def expand(_, lohi):
                lo, hi = lohi
                width = jnp.maximum(hi - lo, 1.0)
                if not s.lower_finite:
                    lo = jnp.where(self.cdf(lo) > q, lo - width, lo)
                if not s.upper_finite:
                    hi = jnp.where(self.cdf(hi) < q, hi + width, hi)
                return lo, hi

            lo, hi = lax.fori_loop(0, 64, expand, (lo, hi))

        def bisect(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            go_hi = self.cdf(mid) < q
            return jnp.where(go_hi, mid, lo), jnp.where(go_hi, hi, mid)

        lo, hi = lax.fori_loop(0, 80, bisect, (lo, hi))
        x = 0.5 * (lo + hi)

        # Newton polish (bracket-clipped): squeezes the last bits of accuracy
        # out of the bisection estimate where pdf is well-behaved.
        def newton(_, x):
            pdf = jnp.exp(self.logpdf(x))
            step = (self.cdf(x) - q) / jnp.maximum(pdf, jnp.finfo(dtype).tiny)
            ok = jnp.isfinite(step) & (pdf > 0)
            xn = jnp.clip(x - jnp.where(ok, step, 0.0), lo, hi)
            return jnp.where(jnp.isfinite(xn), xn, x)

        return lax.fori_loop(0, 3, newton, x)

    # -- affine algebra (`Logistic() + 2`, `Gamma(2,3) * -3`, ... — the
    # reference test matrix's AffineDistribution rows,
    # test/vector/univariate.jl:78-89) ----------------------------------------

    def __add__(self, c):
        from .affine import affine

        return affine(self, loc=c)

    __radd__ = __add__

    def __sub__(self, c):
        return self + (-c)

    def __rsub__(self, c):
        return (-self) + c

    def __mul__(self, c):
        from .affine import affine

        return affine(self, scale=c)

    __rmul__ = __mul__

    def __neg__(self):
        return self * (-1.0)

    def __truediv__(self, c):
        return self * (1.0 / c)

    def in_support(self, x, atol: float = 1e-8):
        """Boolean in-support check (used by the test harness, mirrors
        `insupport` checks in src/vector/test_utils.jl:325-374)."""
        s = self.support
        if s.kind == "interval":
            ok = jnp.ones(jnp.shape(x), bool)
            if s.lower_finite:
                ok = ok & (x >= s.lower - atol)
            if s.upper_finite:
                ok = ok & (x <= s.upper + atol)
            n = self.event_ndims
            if n:
                ok = jnp.all(ok, axis=tuple(range(-n, 0)))
            return ok
        if s.kind == "simplex":
            return (jnp.abs(jnp.sum(x, -1) - 1.0) < jnp.maximum(atol, 1e-6)) & jnp.all(
                x >= -atol, axis=-1
            )
        if s.kind == "pd":
            eig = jnp.linalg.eigvalsh(0.5 * (x + jnp.swapaxes(x, -1, -2)))
            return jnp.all(eig > -atol, axis=-1)
        if s.kind == "corr":
            eig = jnp.linalg.eigvalsh(0.5 * (x + jnp.swapaxes(x, -1, -2)))
            diag_ok = jnp.all(
                jnp.abs(jnp.diagonal(x, axis1=-2, axis2=-1) - 1.0)
                < jnp.maximum(atol, 1e-6),
                axis=-1,
            )
            return jnp.all(eig > -atol, axis=-1) & diag_ok
        if s.kind == "chol_corr":
            # rows (for L) of the factor are unit-norm; diagonal positive
            diag = jnp.diagonal(x, axis1=-2, axis2=-1)
            return jnp.all(diag > -atol, axis=-1)
        return jnp.ones(jnp.shape(x)[: jnp.ndim(x) - self.event_ndims], bool)


@jax.custom_jvp
def _generic_quantile(dist, q):
    """Bracketed-bisection quantile with an implicit-function JVP.

    The primal solves cdf(x; θ) = q by bracket expansion + bisection + Newton
    polish (`Distribution._quantile_bisect`). The tangent comes from the
    implicit function theorem — differentiate cdf(x(q, θ); θ) = q:

        dx = (dq − ∂cdf/∂θ(x)·dθ) / pdf(x)

    exactly the `find_alpha` treatment (flows/planar.py). Without this rule
    AD only sees boolean `where` selections and returns identically-zero
    gradients (reference behavior: Distributions.jl differentiates quantile;
    /root/reference/src/bijectors/cdf_quantile.jl:39-93).
    """
    return dist._quantile_bisect(q)


def _generic_quantile_jvp(primals, tangents):
    dist, q = primals
    ddist, dq = tangents
    x = _generic_quantile(dist, q)
    pdf = jnp.exp(dist.logpdf(x))

    def _is_zero(t):
        return isinstance(t, jax.custom_derivatives.SymbolicZero) or (
            getattr(t, "dtype", None) == jax.dtypes.float0
        )

    leaves, treedef = jax.tree_util.tree_flatten(dist)
    tan_leaves = jax.tree_util.tree_leaves(
        ddist, is_leaf=lambda t: isinstance(t, jax.custom_derivatives.SymbolicZero)
    )
    live = [i for i, t in enumerate(tan_leaves) if not _is_zero(t)]
    dcdf = jnp.zeros_like(x)
    if live:
        def cdf_at(vals):
            ls = list(leaves)
            for i, v in zip(live, vals):
                ls[i] = v
            return jax.tree_util.tree_unflatten(treedef, ls).cdf(x)

        prim = tuple(leaves[i] for i in live)
        tans = tuple(jnp.asarray(tan_leaves[i]) for i in live)
        try:
            _, dcdf = jax.jvp(cdf_at, (prim,), (tans,))
        except (ValueError, NotImplementedError):
            # Missing parameter JVP rule (e.g. lax.betainc has none for a/b).
            # Per-leaf central-difference PARTIALS — primal-only quantities —
            # contracted linearly against the tangents, so reverse-mode
            # transposition still works (the tangent map stays linear).
            h3 = float(jnp.finfo(x.dtype).eps) ** (1.0 / 3.0)
            for i, t in zip(live, tans):
                th = leaves[i]
                hstep = h3 * (jnp.abs(th) + 1.0)
                lp = list(leaves)
                lm = list(leaves)
                lp[i] = th + hstep
                lm[i] = th - hstep
                fp = jax.tree_util.tree_unflatten(treedef, lp).cdf(x)
                fm = jax.tree_util.tree_unflatten(treedef, lm).cdf(x)
                dcdf = dcdf + (fp - fm) / (2.0 * hstep) * t

    if _is_zero(dq):
        dq = jnp.zeros_like(x)
    # The guard must be a PRIMAL-only predicate so the tangent stays linear
    # in (dq, ddist) — reverse mode transposes this computation.
    inv_pdf = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, jnp.finfo(x.dtype).tiny), 0.0)
    dx = (jnp.asarray(dq, x.dtype) - dcdf) * inv_pdf
    return x, dx


_generic_quantile.defjvp(_generic_quantile_jvp, symbolic_zeros=True)


def _promote(*args):
    dtype = jnp.result_type(*args, float)
    return [jnp.asarray(a, dtype) for a in args], dtype


# re-export decorator for distribution modules
pytree_dataclass = pytree_dataclass
