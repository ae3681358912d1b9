"""Plan builder of the whole-model fused kernel (see fused_kernel.py):
`_plan(u, eps)` maps every leaf of an unconstrainer tree onto a SLAB entry
(per-row coefficients of the shared closed form, fused_base._COEF_KEYS) or
a LOOP entry (hand-written emitters in fused_emit.py / generic traced
entries in fused_traced.py), memoized per live unconstrainer object.
"""

from __future__ import annotations

import dataclasses
import math  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401

from .fused_base import (
    LOG2,
    LOG2PI,
    LOGPI,
    _Entry,
    _Unsupported,
)
from .fused_emit import (
    _emit_gauss_quad,
    _emit_mvt,
    _emit_pd,
    _emit_simplex,
    _lkj_weights,
    _partials_gauss_quad,
    _partials_mvt,
    _partials_pd,
    _partials_simplex,
)
from .fused_traced import _traced_scalar_entry, _traced_vector_entry

# Dirichlet as a TELESCOPED slab entry (one shared block softplus pass)
# instead of a per-row loop entry — A/B'd on chip via
# tools/simplex_slab_probe.py; see the Dirichlet branch in _leaf_entry.
_SIMPLEX_SLAB = True


def _scalar_entry(dist, link, n, row0, prow0):
    """Slab-coefficient wiring for every kernel-supported scalar family
    (the closed form is documented at _COEF_KEYS). The coefficients encode
    EXACTLY the composed path's math (the family's `fused_linked_logdensity`
    hook, or plain logpdf for identity links) up to float reassociation —
    load-bearing for the kernel == composed equivalence tests."""
    from ..bijectors.base import Identity
    from ..dists import univariate as uv

    d = dist
    t = type(d)
    if t is uv.Truncated:
        return _traced_scalar_entry(d, link, n, row0, prow0)

    def guard(pred, *param_vals):
        # scalar params, or per-element (n,) params (arraydist IID blocks:
        # the slab's per-row coefficient columns absorb them directly)
        if not pred or any(
            jnp.shape(p) not in ((), (n,)) for p in param_vals
        ):
            raise _Unsupported

    def mk(fn):
        def slab(dtype):
            return {
                k: jnp.broadcast_to(jnp.asarray(v, dtype), (n,))
                for k, v in fn(dtype).items()
            }

        return _Entry(row0, n, prow0, 0, slab=slab)

    ident = type(link) is Identity

    # --- real line (identity link: linked density = logpdf) ---
    if t is uv.Normal:
        guard(ident, d.loc, d.scale)

        def cf(dtype, loc=d.loc, scale=d.scale):
            sig = jnp.asarray(scale, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(loc, dtype), "cq": -0.5 * inv_s * inv_s,
                    "c0": -0.5 * LOG2PI - jnp.log(sig)}

        return mk(cf)
    if t is uv.StudentT:
        guard(ident, d.df, d.loc, d.scale)

        def cf(dtype):
            from jax.scipy import special as jsp

            v = jnp.asarray(d.df, dtype)
            sig = jnp.asarray(d.scale, dtype)
            inv_s = 1.0 / sig
            lognorm = (
                jsp.gammaln(0.5 * (v + 1.0))
                - jsp.gammaln(0.5 * v)
                - 0.5 * (jnp.log(v) + LOGPI)
            )
            return {"m": jnp.asarray(d.loc, dtype), "c6": -0.5 * (v + 1.0),
                    "la": inv_s / jnp.sqrt(v), "c0": lognorm - jnp.log(sig)}

        return mk(cf)
    if t is uv.Cauchy:
        guard(ident, d.loc, d.scale)

        def cf(dtype):
            sig = jnp.asarray(d.scale, dtype)
            return {"m": jnp.asarray(d.loc, dtype), "c6": -1.0,
                    "la": 1.0 / sig, "c0": -LOGPI - jnp.log(sig)}

        return mk(cf)
    if t is uv.Laplace:
        guard(ident, d.loc, d.scale)

        def cf(dtype):
            sig = jnp.asarray(d.scale, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(d.loc, dtype), "c3p": -inv_s,
                    "c3n": -inv_s, "c0": -LOG2 - jnp.log(sig)}

        return mk(cf)
    if t is uv.Logistic:
        guard(ident, d.loc, d.scale)

        def cf(dtype):
            # -z - 2 sp(-z) == -(|z| + 2 sp(-|z|)) via sp(x) = max(x,0)+sp(-|x|)
            sig = jnp.asarray(d.scale, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(d.loc, dtype), "c3p": -inv_s,
                    "c3n": -inv_s, "c4": -2.0, "sa": -inv_s,
                    "c0": -jnp.log(sig)}

        return mk(cf)
    if t is uv.Gumbel:
        guard(ident, d.loc, d.scale)

        def cf(dtype):
            sig = jnp.asarray(d.scale, dtype)
            inv_s = 1.0 / sig
            mi = jnp.asarray(d.loc, dtype) * inv_s
            return {"c1": -inv_s, "c5": -1.0, "ea": -inv_s, "eb": mi,
                    "c0": mi - jnp.log(sig)}

        return mk(cf)

    # --- positive half-line (log link, telescoped hooks) ---
    if t is uv.LogNormal:
        guard(uv._is_log_link(link), d.mu, d.sigma)

        def cf(dtype):
            sig = jnp.asarray(d.sigma, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(d.mu, dtype), "cq": -0.5 * inv_s * inv_s,
                    "c0": -0.5 * LOG2PI - jnp.log(sig)}

        return mk(cf)
    if t is uv.Gamma:
        guard(uv._is_log_link(link), d.concentration, d.rate)

        def cf(dtype):
            from jax.scipy import special as jsp

            a = jnp.asarray(d.concentration, dtype)
            r = jnp.asarray(d.rate, dtype)
            return {"c1": a, "c5": -r, "ea": 1.0,
                    "c0": a * jnp.log(r) - jsp.gammaln(a)}

        return mk(cf)
    if t is uv.Exponential:
        guard(uv._is_log_link(link), d.rate)

        def cf(dtype):
            r = jnp.asarray(d.rate, dtype)
            return {"c1": 1.0, "c5": -r, "ea": 1.0, "c0": jnp.log(r)}

        return mk(cf)
    if t is uv.InverseGamma:
        guard(uv._is_log_link(link), d.concentration, d.scale)

        def cf(dtype):
            from jax.scipy import special as jsp

            a = jnp.asarray(d.concentration, dtype)
            b = jnp.asarray(d.scale, dtype)
            return {"c1": -a, "c5": -b, "ea": -1.0,
                    "c0": a * jnp.log(b) - jsp.gammaln(a)}

        return mk(cf)
    if t is uv.HalfNormal:
        guard(uv._is_log_link(link), d.scale)

        def cf(dtype):
            ls = jnp.log(jnp.asarray(d.scale, dtype))
            return {"c1": 1.0, "c5": -0.5, "ea": 2.0, "eb": -2.0 * ls,
                    "c0": (LOG2 - 0.5 * LOG2PI) - ls}

        return mk(cf)
    if t is uv.HalfCauchy:
        guard(uv._is_log_link(link), d.scale)

        def cf(dtype):
            # const + v - sp(2(v-ls)) with sp folded into the U form
            ls = jnp.log(jnp.asarray(d.scale, dtype))
            return {"m": ls, "c1": 1.0, "c3p": -2.0, "c4": -1.0, "sa": -2.0,
                    "c0": (LOG2 - LOGPI) - ls}

        return mk(cf)
    if t is uv.Weibull:
        guard(uv._is_log_link(link), d.concentration, d.scale)

        def cf(dtype):
            k = jnp.asarray(d.concentration, dtype)
            c1_ = k * jnp.log(jnp.asarray(d.scale, dtype))
            return {"c1": k, "c5": -1.0, "ea": k, "eb": -c1_,
                    "c0": jnp.log(k) - c1_}

        return mk(cf)
    if t is uv.Chi:
        guard(uv._is_log_link(link), d.df)

        def cf(dtype):
            from jax.scipy import special as jsp

            df = jnp.asarray(d.df, dtype)
            k2 = 0.5 * df
            return {"c1": df, "c5": -0.5, "ea": 2.0,
                    "c0": -(k2 - 1.0) * LOG2 - jsp.gammaln(k2)}

        return mk(cf)
    if t is uv.Rayleigh:
        guard(uv._is_log_link(link), d.scale)

        def cf(dtype):
            ls = jnp.log(jnp.asarray(d.scale, dtype))
            return {"c1": 2.0, "c5": -0.5, "ea": 2.0, "eb": -2.0 * ls,
                    "c0": -2.0 * ls}

        return mk(cf)
    if t is uv.Frechet:
        guard(uv._is_log_link(link), d.shape_, d.scale)

        def cf(dtype):
            a = jnp.asarray(d.shape_, dtype)
            als = a * jnp.log(jnp.asarray(d.scale, dtype))
            return {"c1": -a, "c5": -1.0, "ea": -a, "eb": als,
                    "c0": jnp.log(a) + als}

        return mk(cf)

    # --- unit interval / bounded (logit link, telescoped hooks) ---
    if t is uv.Beta:
        guard(uv._is_interval_logit_link(link, 0.0, 1.0), d.a, d.b)

        def cf(dtype):
            # -a sp(-v) - b sp(v) == -(b 1[v>0] + a 1[v<0])|v| - (a+b) sp(-|v|)
            from jax.scipy import special as jsp

            a = jnp.asarray(d.a, dtype)
            b = jnp.asarray(d.b, dtype)
            return {"c3p": -b, "c3n": -a, "c4": -(a + b), "sa": -1.0,
                    "c0": -(jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))}

        return mk(cf)
    if t is uv.LogitNormal:
        guard(uv._is_interval_logit_link(link, 0.0, 1.0), d.mu, d.sigma)

        def cf(dtype):
            sig = jnp.asarray(d.sigma, dtype)
            inv_s = 1.0 / sig
            return {"m": jnp.asarray(d.mu, dtype), "cq": -0.5 * inv_s * inv_s,
                    "c0": -0.5 * LOG2PI - jnp.log(sig)}

        return mk(cf)
    if t is uv.Uniform:
        guard(uv._is_interval_logit_link(link, d.low, d.high), d.low, d.high)

        def cf(dtype):
            # -|v| - 2 sp(-|v|): parameter-free
            return {"c3p": -1.0, "c3n": -1.0, "c4": -2.0, "sa": -1.0}

        return mk(cf)

    # --- lower-bounded (shifted-log link, telescoped hooks) ---
    if t is uv.Pareto:
        guard(uv._is_shifted_log_link(link, d.scale), d.alpha, d.scale)

        def cf(dtype):
            # log a - lm + v - (a+1) sp(v - lm), sp folded into the U form
            a = jnp.asarray(d.alpha, dtype)
            lm = jnp.log(jnp.asarray(d.scale, dtype))
            return {"m": lm, "c1": 1.0, "c3p": -(a + 1.0), "c4": -(a + 1.0),
                    "sa": -1.0, "c0": jnp.log(a) - lm}

        return mk(cf)
    if t is uv.Levy:
        guard(uv._is_shifted_log_link(link, d.mu), d.mu, d.sigma)

        def cf(dtype):
            s = jnp.asarray(d.sigma, dtype)
            return {"c1": -0.5, "c5": -0.5 * s, "ea": -1.0,
                    "c0": 0.5 * (jnp.log(s) - LOG2PI)}

        return mk(cf)
    # no slab form: generic traced entry (auto-whitelisted by _scan_safe)
    return _traced_scalar_entry(d, link, n, row0, prow0)


def _leaf_entry(leaf, row0, prow0, eps):
    from .. import kernels
    from ..bijectors.base import Block, Identity
    from ..bijectors.corr import VecCholeskyBijector, VecCorrBijector
    from ..bijectors.pd import PDVecBijector
    from ..bijectors.simplex import SimplexBijector
    from ..dists import matrix as mx
    from ..dists import multivariate as mv
    from ..dists import univariate as uv
    from ..dists.multivariate import Dirichlet

    d, b = leaf.dist, leaf.link
    if leaf.event_shape == () and leaf.linked_shape == ():
        return _scalar_entry(d, b, 1, row0, prow0)
    t = type(d)
    # real-vector / positive-orthant families: unwrap the elementwise Block
    eb = b.bijector if (type(b) is Block and b.ndims == 1) else None
    eb_ident = type(eb) is Identity
    if t in (mv.MvNormalDiag, mv.MvLogNormal):
        # Per-row-independent Gaussians -> slab rows. MvLogNormal's linked
        # density telescopes exactly to the underlying normal's logpdf on v
        # (logpdf(e^v) + sum v: the -sum log x Jacobian of the base and the
        # +sum v link log-det cancel; reference src/vector/multivariate/
        # mvlognormal.jl / transformed_distribution.jl:93-101).
        ok_link = eb_ident if t is mv.MvNormalDiag else (
            eb is not None and uv._is_log_link(eb)
        )
        if not ok_link or jnp.ndim(d.loc) != 1 or jnp.ndim(d.scale_diag) > 1:
            raise _Unsupported
        K = int(jnp.shape(d.loc)[-1])

        def slab(dtype, d=d, K=K):
            mu = jnp.asarray(d.loc, dtype)
            sig = jnp.broadcast_to(jnp.asarray(d.scale_diag, dtype), (K,))
            inv_s = 1.0 / sig
            return {"m": mu, "cq": -0.5 * inv_s * inv_s,
                    "c0": -0.5 * LOG2PI - jnp.log(sig)}

        return _Entry(row0, K, prow0, 0, slab=slab)
    if t is mv.MvNormalTril and eb_ident:
        # lp = -0.5 ||L^-1 (v - mu)||^2 - sum log diag L - K/2 log 2pi
        # (multivariate.py::MvNormalTril.logpdf); C = L^-1 is host-side.
        if jnp.ndim(d.loc) != 1 or jnp.ndim(d.scale_tril) != 2:
            raise _Unsupported
        K = int(jnp.shape(d.loc)[-1])
        if K > kernels.MAX_K["mvn"]:
            raise _Unsupported

        def params(dtype, d=d, K=K):
            L = jnp.tril(jnp.asarray(d.scale_tril, dtype))
            C = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(K, dtype=dtype), lower=True
            )
            const = -0.5 * K * LOG2PI - jnp.sum(
                jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1
            )
            return [jnp.ravel(C), jnp.asarray(d.loc, dtype), const]

        return _Entry(
            row0, K, prow0, K * K + K + 1, _emit_gauss_quad(K, "lower"),
            params, _partials_gauss_quad(K, "lower"),
        )
    if t is mv.MvNormalCanon and eb_ident:
        # J = L L^T, lp = -0.5 ||L^T (v - mu)||^2 + sum log diag L - K/2
        # log 2pi with mu = J^-1 h (multivariate.py::MvNormalCanon.logpdf).
        if jnp.ndim(d.h) != 1 or jnp.ndim(d.prec) != 2:
            raise _Unsupported
        K = int(jnp.shape(d.h)[-1])
        if K > kernels.MAX_K["mvn"]:
            raise _Unsupported

        def params(dtype, d=d, K=K):
            from ..utils import cholesky_lower

            L = cholesky_lower(jnp.asarray(d.prec, dtype))
            mu = jax.scipy.linalg.cho_solve((L, True), jnp.asarray(d.h, dtype))
            const = -0.5 * K * LOG2PI + jnp.sum(
                jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1
            )
            return [jnp.ravel(L.T), mu, const]

        return _Entry(
            row0, K, prow0, K * K + K + 1, _emit_gauss_quad(K, "upper"),
            params, _partials_gauss_quad(K, "upper"),
        )
    if t is mv.MvStudentT and eb_ident:
        # lp = const - 0.5 (df + K) log1p(q / df), q = ||L^-1 (v - mu)||^2
        # (multivariate.py::MvStudentT.logpdf).
        if (
            jnp.ndim(d.loc) != 1
            or jnp.ndim(d.scale_tril) != 2
            or jnp.ndim(d.df) != 0
        ):
            raise _Unsupported
        K = int(jnp.shape(d.loc)[-1])
        if K > kernels.MAX_K["mvn"]:
            raise _Unsupported

        def params(dtype, d=d, K=K):
            from jax.scipy import special as jsp

            L = jnp.tril(jnp.asarray(d.scale_tril, dtype))
            C = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(K, dtype=dtype), lower=True
            )
            v = jnp.asarray(d.df, dtype)
            const = (
                jsp.gammaln(0.5 * (v + K))
                - jsp.gammaln(0.5 * v)
                - 0.5 * K * (jnp.log(v) + LOGPI)
                - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
            )
            return [jnp.ravel(C), jnp.asarray(d.loc, dtype), v, const]

        return _Entry(
            row0, K, prow0, K * K + K + 2, _emit_mvt(K),
            params, _partials_mvt(K),
        )
    if t is Dirichlet and type(b) is SimplexBijector:
        K = int(jnp.shape(d.alpha)[-1])
        if jnp.ndim(d.alpha) != 1 or K > kernels.MAX_K["simplex"]:
            raise _Unsupported

        if _SIMPLEX_SLAB:
            # TELESCOPED slab form (round 4): in exact algebra the whole
            # Dirichlet linked density collapses to per-row softplus pairs —
            # with t_k = y_k - log(K-1-k), z_k = sigmoid(t_k):
            #   log z_k = -sp(-t_k),  log(1-z_k) = -sp(t_k),
            #   log x_k  = log z_k + sum_{j<k} log(1-z_j)   (k <= K-2)
            #   log x_{K-1} = sum_j log(1-z_j)
            #   ld_inv   = sum_k [log z_k + log(1-z_k)] + sum_{k>=1} log rem_k,
            #              rem_k = prod_{j<k}(1-z_j)
            # so lp = sum_k -(1+a_k) sp(-t_k) - (K-1-k + A_k) sp(t_k) + const,
            # a = alpha-1, A_k = sum_{m>k} a_m. Slab mapping via
            # sp(+-D) = relu(+-D) + sp(-U): c3p = -w2, c3n = -w1,
            # c4 = -(w1+w2), sa = -1 (see _COEF_KEYS). One shared block
            # softplus pass replaces the loop entry's ~5K per-row
            # transcendentals (15 sigmoid + ~3K log at K=16) — the measured
            # transcendental bound of the whole-model kernel
            # (docs/kernels.md:138). Exactly robust at |y| -> inf (softplus
            # is globally stable; every term linear in |y| there).
            #
            # Formulation note: this is the UN-NUDGED density — the loop
            # entry / composed path apply the reference's eps-nudge
            # (src/Bijectors.jl:253, x + eps inside the logs), a
            # deliberate O(eps/x) density perturbation that exists to keep
            # a MATERIALIZED x interior. No x is materialized here, so the
            # telescoped form needs no nudge; the two differ by
            # ~eps*|alpha-1|/x (~1e-5 absolute in f32 at moderate states).

            def slab(dtype, d=d, K=K):
                from jax.scipy import special as jsp

                al = jnp.asarray(d.alpha, dtype)
                a = al - 1.0
                const = jsp.gammaln(jnp.sum(al)) - jnp.sum(jsp.gammaln(al))
                ks = jnp.arange(K - 1, dtype=dtype)
                c = jnp.log((K - 1.0) - ks)  # shift log(K-1-k)
                # A_k = sum_{m>k} a_m over ALL K alphas
                A = jnp.cumsum(a[::-1])[::-1][1:] if K > 1 else a[:0]
                w1 = 1.0 + a[: K - 1]
                w2 = (K - 1.0) - ks + A
                e0 = jnp.zeros((K - 1,), dtype).at[0].set(1.0)
                return {
                    "m": c,
                    "c3p": -w2,
                    "c3n": -w1,
                    "c4": -(w1 + w2),
                    "sa": jnp.full((K - 1,), -1.0, dtype),
                    "c0": const * e0,
                }

            return _Entry(row0, K - 1, prow0, 0, slab=slab)

        def params(dtype):
            from jax.scipy import special as jsp

            a = jnp.asarray(d.alpha, dtype)
            lognorm = jnp.sum(jsp.gammaln(a)) - jsp.gammaln(jnp.sum(a))
            return [a - 1.0, -lognorm]

        return _Entry(row0, K - 1, prow0, K + 1, _emit_simplex(K, eps), params, _partials_simplex(K, eps))
    if (t is mx.LKJ and type(b) is VecCorrBijector) or (
        t is mx.LKJCholesky and type(b) is VecCholeskyBijector
    ):
        # For the logdensity-only path the whole LKJ contribution telescopes
        # to ONE weighted logcosh reduction over the packed slab -- no column
        # recurrence at all: logJ = -sum_s cJ_s lc_s with cJ_s = K - i_s
        # (vec, corr.jl:474-483) or j - i + 1 (chol, corr.jl:485-501), and
        # every column's final running sum is -sum_{s in col} lc_s, so the
        # density term is another weighted sum. Slab form: logcosh(y) =
        # |y| + sp(-2|y|) - log 2 maps onto (c3, c4/sa, c0); d lp/d y_s =
        # -w_s tanh(y_s) falls out of the same coefficients (the slab
        # partial's sign(y)(1 - 2 sigmoid(-2|y|)) IS tanh).
        chol = t is mx.LKJCholesky
        K = int(d.dim)
        if jnp.ndim(d.eta) or K > kernels.MAX_K["lkj"]:
            raise _Unsupported
        P = K * (K - 1) // 2

        def slab(dtype, chol=chol, K=K, P=P):
            eta = jnp.asarray(d.eta, dtype)
            w = _lkj_weights(K, chol, eta, dtype)
            const = -mx._lkj_log_normalizer(K, eta, dtype)
            e0 = jnp.zeros((P,), dtype).at[0].set(1.0)
            return {"c3p": -w, "c3n": -w, "c4": -w,
                    "sa": jnp.full((P,), -2.0, dtype),
                    "c0": w * LOG2 + const * e0}

        return _Entry(row0, P, prow0, 0, slab=slab)
    if t is mx.Wishart and type(b) is PDVecBijector:
        if jnp.ndim(d.scale) != 2 or jnp.ndim(d.df) != 0:
            raise _Unsupported
        K = int(jnp.shape(d.scale)[-1])
        if K > kernels.MAX_K["pd"]:
            raise _Unsupported

        def params(dtype):
            from ..utils import cholesky_lower

            v = jnp.asarray(d.df, dtype)
            Sc = cholesky_lower(jnp.asarray(d.scale, dtype))
            Sinv = jax.scipy.linalg.cho_solve((Sc, True), jnp.eye(K, dtype=dtype))
            logdetS = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(Sc, axis1=-2, axis2=-1)), -1
            )
            const = (
                -0.5 * v * K * LOG2 - 0.5 * v * logdetS - mx._mv_lgamma(0.5 * v, K)
            )
            return [jnp.ravel(Sinv), v - K - 1.0, const]

        return _Entry(
            row0, K * (K + 1) // 2, prow0, K * K + 2, _emit_pd(K, "dot"),
            params, _partials_pd(K, "dot"),
        )
    if t is mx.InverseWishart and type(b) is PDVecBijector:
        if jnp.ndim(d.psi) != 2 or jnp.ndim(d.df) != 0:
            raise _Unsupported
        K = int(jnp.shape(d.psi)[-1])
        if K > kernels.MAX_K["pd"]:
            raise _Unsupported

        def params(dtype):
            from ..utils import cholesky_lower

            v = jnp.asarray(d.df, dtype)
            Pc = cholesky_lower(jnp.asarray(d.psi, dtype))
            logdetP = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(Pc, axis1=-2, axis2=-1)), -1
            )
            const = (
                0.5 * v * logdetP - 0.5 * v * K * LOG2 - mx._mv_lgamma(0.5 * v, K)
            )
            return [jnp.ravel(Pc), -(v + K + 1.0), const]

        return _Entry(
            row0, K * (K + 1) // 2, prow0, K * K + 2, _emit_pd(K, "solve"),
            params, _partials_pd(K, "solve"),
        )
    # no hand-written form: generic traced VECTOR entry (auto-whitelisted
    # by the same partial-eval + primitive scan as the scalar one)
    return _traced_vector_entry(leaf, row0, prow0)


_PLAN_CACHE: dict = {}  # (id(u), eps) -> (weakref.ref(u), plan-or-None)
_PLAN_CACHE_MAX = 64


def _plan(u, eps):
    """List of _Entry covering every linked row, or None if any leaf is
    unsupported. Static — depends only on tree structure and shapes.

    Memoized per LIVE unconstrainer object: plan entries close over the
    leaf dist params (which may be tracers when model params ride as jit
    args), so the only staleness-safe key is object identity guarded by a
    weakref — the same live `u` always holds the same params, and a dead
    `u` can never be aliased by a recycled id because the weakref check
    fails. This removes the ~5x plan recomputation per transposed-NUTS
    compile (_prep for value/jvp/vjp kernels + the model-level gate)."""
    import weakref

    key = (id(u), float(eps))
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[0]() is u:
        return hit[1]
    plan = _plan_uncached(u, eps)
    # prune dead-weakref entries on EVERY insert: cached plans close over
    # leaf params (possibly dead tracers / device buffers), so a dead entry
    # extends their lifetime until eviction — keep none around
    dead = [k for k, v in _PLAN_CACHE.items() if v[0]() is None]
    for k in dead:
        del _PLAN_CACHE[k]
    if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        # all-live overflow: drop everything (the cache is a compile-time
        # convenience, never load-bearing)
        _PLAN_CACHE.clear()
    try:
        _PLAN_CACHE[key] = (weakref.ref(u), plan)
    except TypeError:
        pass  # non-weakrefable unconstrainer: just skip memoization
    return plan


def _plan_uncached(u, eps):
    from .core import (
        IIDUnconstrainer,
        LeafUnconstrainer,
        TransformedUnconstrainer,
        TreeUnconstrainer,
    )

    entries = []

    def visit(node, row0):
        prow0 = sum(e.n_params for e in entries)
        if isinstance(node, TreeUnconstrainer):
            for c, (s, _) in zip(node.children, node.linked_offsets):
                visit(c, row0 + s)
            return
        if isinstance(node, TransformedUnconstrainer):
            # linked density telescopes to the base's (core.py::
            # TransformedUnconstrainer.linked_logdensity_t) — same rows
            visit(node.base, row0)
            return
        if isinstance(node, IIDUnconstrainer):
            inner = node.inner
            if not isinstance(inner, LeafUnconstrainer):
                raise _Unsupported
            if inner.event_shape == () and inner.linked_shape == ():
                entries.append(
                    _scalar_entry(inner.dist, inner.link, node.n, row0, prow0)
                )
                return
            # IID blocks of STRUCTURED leaves (per-group LKJ/Wishart/
            # Dirichlet/MvNormal...): n independent copies at shifted row
            # offsets. All copies share ONE params block (same dist), so
            # copy i > 0 contributes no params rows and reads the first
            # copy's prow0; slab copies just re-emit their coefficient
            # rows at the shifted offset.
            e0 = _leaf_entry(inner, row0, prow0, eps)
            entries.append(e0)
            per = inner.linked_vec_length
            for i in range(1, node.n):
                entries.append(
                    dataclasses.replace(
                        e0,
                        row0=row0 + i * per,
                        n_params=0,
                        params=(lambda dtype: []) if e0.params is not None else None,
                    )
                )
            return
        if isinstance(node, LeafUnconstrainer):
            entries.append(_leaf_entry(node, row0, prow0, eps))
            return
        raise _Unsupported

    try:
        visit(u, 0)
    except _Unsupported:
        return None
    return entries
