"""Model abstraction for the inference engines.

The reference has no inference code (SURVEY.md §2.7) — these engines are the
net-new layer the north star requires (BASELINE.json): leapfrog in
unconstrained space over the vectorize layer.

A `Model` is (priors, log_likelihood): priors is any distribution supported
by `unconstrain` (typically a NamedProduct), log_likelihood maps a sample
pytree to a scalar. The unconstrained target density is

    logp(v) = priors.logpdf(x) + loglik(x) + logdetJ,   (x, logdetJ) = from_linked_vec(v)

— exactly `logpdf_with_trans` composed with the flat ravel, evaluated as one
fused XLA computation per (chains,)-batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dists.base import Distribution
from ..tree import pytree_dataclass
from ..vectorize import unconstrain


@pytree_dataclass(meta_fields=("loglik",))
class Model:
    priors: Distribution
    loglik: object = None  # callable(sample_pytree) -> scalar, or None

    def unconstrainer(self):
        return unconstrain(self.priors)

    def dim(self) -> int:
        return self.unconstrainer().linked_vec_length

    def logdensity_fn(self):
        """Returns logp(v) on flat unconstrained vectors (batch-friendly).

        Uses the fused `from_linked_vec_with_logpdf` path: factor-aware
        densities (LKJ / Wishart) are evaluated from the Cholesky factor the
        inverse link already computes — no re-decomposition in the leapfrog
        hot loop."""
        u = self.unconstrainer()
        loglik = self.loglik

        def logdensity(v):
            x, lp = u.from_linked_vec_with_logpdf(v)
            if loglik is not None:
                lp = lp + loglik(x)
            return lp

        return logdensity

    def batched_logdensity_fn(self):
        """Like logdensity_fn but evaluated DIRECTLY on (batch, dim) arrays
        instead of per-example under vmap. Semantically identical (the
        vectorize layer broadcasts); operationally different on TPU: the
        trace sees the real batch, so the Pallas batch-on-lanes kernels
        dispatch. Use for batched density evaluation (ELBO Monte-Carlo
        samples, SMC weights, serving); the per-chain NUTS kernel keeps the
        vmapped scalar form."""
        u = self.unconstrainer()
        loglik = self.loglik

        if loglik is None:
            # prior-only density: leaves that don't need the constrained
            # sample (LKJ) skip materializing it (logdensity-only kernels)
            def prior_logdensity(v):
                return u.linked_logdensity(v)

            prior_logdensity.batch_capable = True
            return prior_logdensity

        def logdensity(v):
            x, lp = u.from_linked_vec_with_logpdf(v)
            return lp + (jax.vmap(loglik)(x) if v.ndim > 1 else loglik(x))

        logdensity.batch_capable = True  # consumed by as_batched
        return logdensity

    def batched_logdensity_t_fn(self):
        """Like batched_logdensity_fn but on the TRANSPOSED (dim, chains)
        state — the TPU-native orientation (chains on the 128-wide lane
        axis). For kernel-supported priors the density AND its reverse pass
        each run as ONE whole-model Pallas kernel (vectorize/fused_kernel.py),
        which is what the transposed NUTS leapfrog
        (hmc_batched.nuts_kernel_batched(transposed=True)) evaluates.

        With a log-likelihood, the constrained sample is materialized
        batch-major for the user callable (its leaves carry trailing event
        dims), so the likelihood term re-runs the inverse link; the fused
        prior density/gradient still dominates prior-heavy models."""
        u = self.unconstrainer()
        loglik = self.loglik

        def _prior_vg(vT):
            # leapfrog fast path: ONE fused Pallas pass for value AND full
            # gradient (state read from HBM once) when the whole-model
            # kernel is eligible; jax.vjp otherwise (2 kernels / 3+ passes).
            # NOTE: in the batch band where the vg kernel dispatches but
            # the value kernel declines (kernels.MEGA_VG_OFF_BAND vs
            # MEGA_OFF_BAND — [8192, 131072) as of the r5 measurement),
            # value_and_grad_fn's lp and a direct f(vT) call can differ
            # at the f32-association / Dirichlet-nudge level (~4e-5 rel;
            # user-facing caveat in docs/kernels.md). Samplers are immune:
            # init_sampler and every leapfrog consume THIS function, so
            # all MH energies in a run share one density definition.
            from ..vectorize.fused_kernel import try_mega_value_and_grad

            out = try_mega_value_and_grad(u, vT)
            if out is not None:
                return out
            lp, vjpf = jax.vjp(u.linked_logdensity_t, vT)
            (g,) = vjpf(jnp.ones_like(lp))
            return lp, g

        if loglik is None:

            def prior_logdensity_t(vT):
                return u.linked_logdensity_t(vT)

            prior_logdensity_t.batch_capable = True
            prior_logdensity_t.value_and_grad_fn = _prior_vg
            return prior_logdensity_t

        def logdensity_t(vT):
            lp = u.linked_logdensity_t(vT)
            x = u.from_linked_vec(jnp.swapaxes(vT, 0, 1))[0]
            return lp + jax.vmap(loglik)(x)

        def _full_vg(vT):
            lp_p, g_p = _prior_vg(vT)

            def lik_t(v):
                x = u.from_linked_vec(jnp.swapaxes(v, 0, 1))[0]
                return jax.vmap(loglik)(x)

            lp_l, vjpf = jax.vjp(lik_t, vT)
            (g_l,) = vjpf(jnp.ones_like(lp_l))
            return lp_p + lp_l, g_p + g_l

        logdensity_t.batch_capable = True
        logdensity_t.value_and_grad_fn = _full_vg
        return logdensity_t

    def constrain(self, v):
        """Flat unconstrained vector(s) -> sample pytree."""
        return self.unconstrainer().from_linked_vec(v)[0]

    def init_positions(self, key, n_chains: int, scale: float = 1.0):
        return scale * jax.random.normal(
            key, (n_chains, self.dim()), jnp.result_type(float)
        )

    def sample(
        self,
        key,
        n_chains: int = 8,
        n_warmup: int = 500,
        n_samples: int = 500,
        kernel: str = "auto",
        constrained: bool = True,
        init: str = "random",
        **kwargs,
    ):
        """One-call NUTS: windowed-adaptation warmup + sampling with the
        right kernel/log-density pairing chosen for you.

        kernel='auto' picks the transposed-layout multi-chain kernel
        (`nuts_batched_t`) whenever the whole-model fused kernel can
        dispatch: prior plan-eligible (vectorize/fused_kernel.py) AND on
        the TPU backend. The leapfrog then runs the ONE-PASS fused
        value-and-grad kernel (mega_value_and_grad_t), which the measured
        crossover shows winning at EVERY chain count (MEGA_CROSSOVER.json,
        megavg columns; tools/mega_crossover.py) — including the 4-64
        chains real users run. Otherwise the batch-major multi-chain
        kernel (whose per-leaf Pallas kernels have their own batch gate).
        Any explicit
        sampler.warmup_and_sample kernel name is accepted too, plus
        'chees' (run_chees: lockstep gradient-adapted trajectories on
        the batched density). Returns
        (samples, state, stats): samples is the constrained pytree with
        leading (n_kept, n_chains) axes when `constrained=True`, else the
        raw (n_kept, n_chains, dim) linked array.

        init='random' draws N(0, 1) starting positions; 'laplace' runs
        map_laplace and starts chains from the Laplace Gaussian with the
        inverse mass seeded from its covariance (diag or dense to match
        `metric`); 'pathfinder' runs fit_pathfinder and starts chains from
        its best-candidate draws with the diagonal of Σ as the mass seed.
        Warmup still re-adapts; a user-passed `inv_mass0` wins."""
        from .sampler import sample_with_kernel

        if kernel == "auto":
            from .. import kernels
            from ..utils import _eps
            from ..vectorize.core import TreeUnconstrainer
            from ..vectorize.fused_kernel import _plan

            u = self.unconstrainer()
            eligible = (
                kernels.enabled()
                and jax.default_backend() == "tpu"
                and jnp.result_type(float) == jnp.float32
                and isinstance(u, TreeUnconstrainer)
                and _plan(u, _eps(jnp.result_type(float))) is not None
            )
            kernel = "nuts_batched_t" if eligible else "nuts_batched"
        fn = {
            "nuts": self.logdensity_fn,
            "hmc": self.logdensity_fn,
            "nuts_batched": self.batched_logdensity_fn,
            "nuts_batched_t": self.batched_logdensity_t_fn,
            "chees": self.batched_logdensity_fn,
        }[kernel]()
        k_init, k_run = jax.random.split(key)
        if init == "random":
            q0 = self.init_positions(k_init, n_chains)
        elif init == "laplace":
            from .map_laplace import map_laplace

            _, lap = map_laplace(self)
            q0 = lap.sample(k_init, n_chains)
            if "inv_mass0" not in kwargs:
                kwargs["inv_mass0"] = (
                    lap.covariance()
                    if kwargs.get("metric") == "dense"
                    else lap.marginal_sd() ** 2
                )
        elif init == "pathfinder":
            from .pathfinder import fit_pathfinder

            kp, k_init = jax.random.split(k_init)
            res = fit_pathfinder(
                self.logdensity_fn(),
                kp,
                jnp.zeros(self.dim(), jnp.result_type(float)),
                n_draws=n_chains,
            )
            q0 = res.draws
            if "inv_mass0" not in kwargs and kwargs.get("metric") != "dense":
                # diag(Σ) = α + rowsum(β ∘ (βγ)) — γ is symmetric
                diag = res.alpha + jnp.sum(
                    res.beta * (res.beta @ res.gamma), axis=1
                )
                kwargs["inv_mass0"] = jnp.clip(diag, 1e-10, None)
        else:
            raise ValueError(f"unknown init {init!r}")
        samples, state, stats = sample_with_kernel(
            fn, k_run, q0, n_warmup=n_warmup, n_samples=n_samples,
            kernel=kernel, **kwargs,
        )
        if constrained:
            samples = self.constrain(samples)
        return samples, state, stats


def as_batched(logdensity_fn):
    """Wrap a log-density so it evaluates whole (batch, dim) arrays at once
    when it DECLARES batch support (`fn.batch_capable = True`, as
    Model.batched_logdensity_fn does), falling back to `jax.vmap` otherwise.

    Opt-in by attribute rather than a shape probe: a per-example density
    whose reductions happen to broadcast back to (batch,) would pass a shape
    check while silently mixing samples' likelihoods. Used by the ADVI/SMC
    engines."""
    if getattr(logdensity_fn, "batch_capable", False):

        def batched(v):
            return logdensity_fn(v)

        return batched

    def vmapped(v):
        if v.ndim == 1:
            return logdensity_fn(v)
        return jax.vmap(logdensity_fn)(v)

    return vmapped
