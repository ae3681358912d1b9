"""Run the test_all property sweep on the REAL TPU in f32.

The pytest suite runs on a virtual CPU mesh in f64 (tests/conftest.py); this
tool drives the same distribution-level properties on actual hardware in the
f32 performance mode — the configuration production inference uses.

Usage: python tools/tpu_sweep.py [fast|full]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import traceback

import jax
import jax.numpy as jnp

from tpu_bijectors import dists, transformed
from tpu_bijectors.testing import test_all

e = jnp.asarray


def cases(full: bool):
    out = [
        dists.Normal(0.0, 1.0),
        dists.LogNormal(0.0, 1.0),
        dists.Beta(2.0, 2.0),
        dists.Gamma(7.5, 1.0),
        dists.Uniform(0.0, 1.0),
        dists.StudentT(5.0),
        dists.Kumaraswamy(2.0, 5.0),
        dists.Logistic() * -3,
        dists.Truncated(dists.Normal(), lower=0.0, upper=1.0),
        dists.Dirichlet(e([2.0, 3.0, 4.0])),
        dists.MvNormalDiag(jnp.zeros(4), jnp.ones(4)),
        dists.LKJ(4, 2.0),
        dists.LKJCholesky(3, 1.5, "L"),
        dists.Wishart(6.0, 2.0 * jnp.eye(3)),
        dists.IIDProduct(dists.Beta(2.0, 2.0), 10),
        dists.NamedProduct.of(
            mu=dists.Normal(), w=dists.Dirichlet(jnp.ones(4)), c=dists.LKJ(3, 2.0)
        ),
        transformed(dists.Beta(2.0, 2.0)),
    ]
    if full:
        out += [
            dists.NoncentralChisq(2.0, 3.0),
            dists.NoncentralT(2.0, 3.0),
            dists.Rician(0.5, 1.0),
            dists.Kolmogorov(),
            dists.JohnsonSU(0.0, 1.0, 0.0, 1.0),
            dists.SkewedExponentialPower(0.0, 1.0, 0.7, 0.7),
            dists.InverseWishart(6.0, 2.0 * jnp.eye(3)),
            dists.MatrixTDist(5.0, jnp.zeros((2, 3)), jnp.eye(2), jnp.eye(3)),
            dists.Mixture(dists.Normal(e([-2.0, 3.0]), e([1.0, 2.0])), jnp.log(e([0.5, 0.5]))),
            dists.HeterogeneousMixture(
                (dists.Gamma(2.0, 1.0), dists.Exponential(3.0)), jnp.log(e([0.5, 0.5]))
            ),
            dists.JointOrderStatistics(dists.Normal(), 4),
            dists.Reshaped(dists.Dirichlet(jnp.ones(4)), (2, 2)),
        ]
    return out


def mega_smoke():
    """Compile + run the whole-model fused kernel ON CHIP (not interpret
    mode) for every leaf-entry kind, incl. the generic traced scalar
    entries — this is the only place their Mosaic lowering is validated
    (the CPU suite can only check interpret-mode semantics). Compares the
    kernel against the composed path in f32 at a dispatch-eligible batch."""
    import numpy as np

    from tpu_bijectors.vectorize import unconstrain
    from tpu_bijectors.vectorize.fused_kernel import _plan, try_mega

    models = {
        "slab+structured": dists.NamedProduct.of(
            mu=dists.IIDProduct(dists.Normal(0.5, 2.0), 4),
            sig=dists.LogNormal(0.1, 0.5),
            w=dists.Dirichlet(jnp.ones(5) * 1.3),
            c=dists.LKJ(4, 2.0),
            wi=dists.Wishart(6.0, jnp.eye(3)),
            mvd=dists.MvNormalDiag(jnp.zeros(3), jnp.ones(3)),
            mvt=dists.MvNormalTril(
                jnp.zeros(3),
                jnp.asarray([[1.3, 0.0, 0.0], [0.4, 0.9, 0.0], [-0.2, 0.3, 1.6]]),
            ),
        ),
        "generic-traced": dists.NamedProduct.of(
            tn=dists.Truncated(dists.Normal(0.3, 1.2), lower=-0.5, upper=2.0),
            tst=dists.Truncated(dists.StudentT(4.0, 0.2, 1.1), lower=0.0),
            ku=dists.Kumaraswamy(2.0, 3.0),
            bp=dists.BetaPrime(2.0, 3.5),
            ig=dists.InverseGaussian(1.2, 2.0),
            js=dists.JohnsonSU(0.1, 1.2, 0.3, 1.1),
            tri=dists.TriangularDist(-1.0, 2.0, 0.5),
            mx=dists.Mixture(
                dists.Normal(e([-2.0, 3.0]), e([1.0, 2.0])),
                jnp.log(e([0.5, 0.5])),
            ),
            jo=dists.JointOrderStatistics(dists.Normal(0.2, 1.3), 4),
        ),
    }
    failures = []
    for name, d in models.items():
        try:
            u = unconstrain(d)
            assert _plan(u, 1e-6) is not None, "plan unexpectedly None"
            dim = u.linked_vec_length
            key = jax.random.PRNGKey(0)
            # B=512 sits BELOW kernels.MEGA_OFF_BAND, where try_mega
            # dispatches (the band [1024, 65536) routes to the composed
            # per-leaf path by measurement — MEGA_CROSSOVER.json)
            vT = 0.6 * jax.random.normal(key, (dim, 512), jnp.float32)
            got = try_mega(u, vT)
            assert got is not None, "try_mega declined at dispatch shape"
            ref = u._linked_logdensity_t_children(vT)
            # 1e-4 allowance: the TELESCOPED Dirichlet slab entry is the
            # exact (un-nudged) density; the composed reference keeps the
            # reference's eps-nudge — they differ by ~eps*|alpha-1|/x,
            # measured 4e-5 rel max at these states (docs/kernels.md,
            # Round-4 additions)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-4, atol=5e-4
            )
            g1 = jax.grad(lambda vT: jnp.sum(try_mega(u, vT)))(vT)
            g2 = jax.grad(
                lambda vT: jnp.sum(u._linked_logdensity_t_children(vT))
            )(vT)
            # both sides are f32 Pallas paths with different but equal
            # formulations; f64-arbitrated absolute accuracy is ~1e-4-level
            # for the loop-entry partials (mega is 30x MORE accurate than
            # composed for LKJ), so the bound here is absolute-dominated
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=1e-3
            )
            # the ONE-PASS fused value-and-grad kernel (leapfrog fast
            # path) — new Mosaic code, pinned on chip here
            from tpu_bijectors.vectorize.fused_kernel import (
                mega_value_and_grad_t,
            )

            lp_f, g_f = mega_value_and_grad_t(u, vT)
            np.testing.assert_allclose(
                np.asarray(lp_f), np.asarray(ref), rtol=1e-4, atol=5e-4
            )
            np.testing.assert_allclose(
                np.asarray(g_f), np.asarray(g2), rtol=2e-4, atol=1e-3
            )
            print(f"  OK   mega[{name}] (value + grad + fused-vg on chip)")
        except Exception as ex:
            failures.append((f"mega[{name}]", ex))
            print(f"  FAIL mega[{name}]: {type(ex).__name__}: {str(ex)[:300]}")
            traceback.print_exc(limit=2)
    return failures


def kernel_grad_smoke():
    """Pin the COMPILED Mosaic lowering of every per-leaf Pallas kernel —
    value AND gradient — on chip at a dispatch-eligible batch, against the
    kernels-disabled jnp path (ADVICE r3 #4: the PD trace-grad backward
    kernel landed after the last on-chip capture and its grad path was
    CPU/interpret-validated only; this makes that class of gap impossible
    to reopen). Batch-major and transposed layouts both run."""
    import numpy as np

    from tpu_bijectors import kernels
    from tpu_bijectors.vectorize import unconstrain

    B = 4096
    leaves = {
        "Dirichlet(8)": dists.Dirichlet(jnp.arange(1.0, 9.0)),
        "LKJ(8)": dists.LKJ(8, 2.0),
        "LKJCholesky(6,L)": dists.LKJCholesky(6, 1.5, "L"),
        "Wishart(8)": dists.Wishart(10.0, jnp.eye(8)),          # dot mode
        "InverseWishart(8)": dists.InverseWishart(12.0, jnp.eye(8)),  # solve mode + trace-grad kernel
    }
    failures = []
    key = jax.random.PRNGKey(3)
    for name, d in leaves.items():
        try:
            u = unconstrain(d)
            dim = u.linked_vec_length
            v = 0.4 * jax.random.normal(key, (B, dim), jnp.float32)

            def val_grad(f, x):
                g = jax.grad(lambda xx: jnp.sum(f(xx)))(x)
                return np.asarray(f(x), np.float64), np.asarray(g, np.float64)

            # batch-major
            lp_k, g_k = val_grad(u.linked_logdensity, v)
            kernels.enable(False)
            try:
                lp_j, g_j = val_grad(u.linked_logdensity, v)
            finally:
                kernels.enable(True)
            # f32 bars: kernel and jnp sum the same terms in different
            # association orders; the measured spread is ~1e-4-relative
            # at K=8 PD slots (f64-arbitrated — docs/kernels.md, mega
            # smoke note). The smoke pins LOWERING + gross correctness.
            np.testing.assert_allclose(lp_k, lp_j, rtol=3e-4, atol=3e-3)
            np.testing.assert_allclose(g_k, g_j, rtol=5e-4, atol=5e-3)
            # transposed
            vT = v.T
            lp_kt, g_kt = val_grad(u.linked_logdensity_t, vT)
            kernels.enable(False)
            try:
                lp_jt, g_jt = val_grad(u.linked_logdensity_t, vT)
            finally:
                kernels.enable(True)
            np.testing.assert_allclose(lp_kt, lp_jt, rtol=3e-4, atol=3e-3)
            np.testing.assert_allclose(g_kt, g_jt, rtol=5e-4, atol=5e-3)
            print(f"  OK   kernel-grad[{name}] (both layouts, value + grad)")
        except Exception as ex:
            failures.append((f"kernel-grad[{name}]", ex))
            print(f"  FAIL kernel-grad[{name}]: {type(ex).__name__}: {str(ex)[:300]}")
            traceback.print_exc(limit=2)
    return failures


def engines_smoke():
    """Run every inference engine briefly ON CHIP in f32: QR/Cholesky/
    while-loop/linesearch codepaths (map_laplace, pathfinder, parallel
    tempering, ensemble) are exactly the class the CPU/f64 suite cannot
    validate on TPU. Checks finite outputs + a loose conjugate moment."""
    import numpy as np

    from tpu_bijectors.infer import (
        Model,
        fit_pathfinder,
        map_laplace,
        run_ensemble,
        run_parallel_tempering,
    )

    a, b, n_tr, heads = 2.0, 2.0, 50, 17
    model = Model(
        priors=dists.NamedProduct.of(
            p=dists.Beta(a, b), s=dists.LogNormal(0.0, 0.5)
        ),
        loglik=lambda x: heads * jnp.log(x["p"])
        + (n_tr - heads) * jnp.log1p(-x["p"]),
    )
    exact_mean = (a + heads) / (a + b + n_tr)
    key = jax.random.PRNGKey(0)
    failures = []

    def check(name, fn):
        try:
            fn()
            print(f"  OK   engines[{name}]")
        except Exception as ex:
            failures.append((f"engines[{name}]", ex))
            print(f"  FAIL engines[{name}]: {type(ex).__name__}: {str(ex)[:300]}")
            traceback.print_exc(limit=2)

    def _map():
        res, lap = map_laplace(model, n_steps=100)
        assert float(res.grad_norm) < 1e-2, float(res.grad_norm)
        assert np.isfinite(float(lap.log_evidence()))
        assert np.all(np.isfinite(np.asarray(lap.sample(key, 64))))

    def _pf():
        res = fit_pathfinder(
            model.logdensity_fn(), key, jnp.zeros(model.dim(), jnp.float32),
            max_iters=25, n_draws=64,
        )
        assert np.isfinite(float(res.elbo[res.best]))
        p = np.asarray(model.constrain(res.draws)["p"])
        assert abs(p.mean() - exact_mean) < 0.15, p.mean()

    def _pt():
        prior_only = Model(priors=model.priors)
        res = run_parallel_tempering(
            prior_only.batched_logdensity_fn(),
            lambda v: model.loglik(model.constrain(v)),
            key, jnp.zeros((16, model.dim()), jnp.float32),
            n_temps=6, n_warmup=100, n_samples=200, n_leapfrog=8,
        )
        p = np.asarray(
            model.constrain(res.samples.reshape(-1, model.dim()))["p"]
        )
        assert abs(p.mean() - exact_mean) < 0.1, p.mean()
        assert np.isfinite(float(res.log_evidence))

    def _ens():
        res = run_ensemble(
            model.batched_logdensity_fn(), key,
            0.5 * jax.random.normal(key, (32, model.dim()), jnp.float32),
            n_warmup=300, n_samples=800,
        )
        p = np.asarray(
            model.constrain(res.samples.reshape(-1, model.dim()))["p"]
        )
        assert abs(p.mean() - exact_mean) < 0.1, p.mean()

    def _chees():
        from tpu_bijectors.infer import run_chees

        samples, state, stats = run_chees(
            model.batched_logdensity_fn(), key,
            0.5 * jax.random.normal(key, (32, model.dim()), jnp.float32),
            n_warmup=300, n_samples=400,
        )
        p = np.asarray(
            model.constrain(samples.reshape(-1, model.dim()))["p"]
        )
        assert abs(p.mean() - exact_mean) < 0.1, p.mean()
        assert np.isfinite(float(state.eps)) and np.isfinite(float(state.log_t))

    def _neutra():
        from tpu_bijectors.infer import neutra_sample

        s, res, _ = neutra_sample(
            model, key, n_chains=16, n_warmup=200, n_samples=300,
            fit_kwargs=dict(n_steps=300, n_mc=32, n_layers=2, hidden=8),
        )
        p = np.asarray(s["p"]).ravel()
        assert abs(p.mean() - exact_mean) < 0.12, p.mean()
        assert np.all(np.isfinite(np.asarray(res.losses)))

    def _stl():
        from tpu_bijectors.infer import fit_advi

        res = fit_advi(
            model.batched_logdensity_fn(), key, model.dim(),
            n_steps=400, n_mc=32, estimator="stl",
        )
        p = np.asarray(
            model.constrain(res.q.sample(key, 2048))["p"]
        )
        assert abs(p.mean() - exact_mean) < 0.1, p.mean()

    def _serving():
        from tpu_bijectors import serving

        v = 0.4 * jax.random.normal(key, (32, model.dim()), jnp.float32)
        fn = serving.load(serving.export_logdensity(model, 32))
        ref = model.batched_logdensity_fn()(v)
        np.testing.assert_allclose(
            np.asarray(fn(v)), np.asarray(ref), rtol=2e-5
        )

    def _nsf():
        from tpu_bijectors.flows import nsf_ar_stack

        flow = nsf_ar_stack(key, 3, n_layers=2, dtype=jnp.float32)
        x = 0.8 * jax.random.normal(key, (64, 3), jnp.float32)
        y, ld = flow.forward_and_log_det(x)
        x2, ld_i = flow.inverse_and_log_det(y)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=3e-5)
        np.testing.assert_allclose(np.asarray(ld + ld_i), 0.0, atol=3e-5)
        g = jax.grad(lambda f: jnp.sum(f.forward_and_log_det(x)[1]))(flow)
        assert all(
            np.all(np.isfinite(np.asarray(l)))
            for l in jax.tree_util.tree_leaves(g)
        )

    check("map_laplace", _map)
    check("pathfinder", _pf)
    check("tempering", _pt)
    check("ensemble", _ens)
    check("chees", _chees)
    check("neutra+maf", _neutra)
    check("advi_stl", _stl)
    check("serving_export", _serving)
    check("nsf_flow", _nsf)
    return failures


def kernel_perf_sentinel(update: bool = False):
    """Per-family kernel PERF regression net (VERDICT r4 item 7): slope-time
    every per-leaf Pallas kernel against its jnp reference (kernels
    trace-time disabled) at one profitable shape (transposed layout,
    B=131072) and FAIL when the speedup ratio drops below the stored
    per-family floor — a per-kernel vs_jnp sentinel instead of the single
    bench-model mix (bench.py's vs_jnp_batched guards only that mix).

    Floors live in KERNEL_PERF.json at the repo root: floor = 0.6 x the
    ratio measured at capture time (40% head-room for run-to-run tunnel
    variance). `update=True` (or a missing file) re-captures and rewrites
    the floors; plain runs only compare. Protocol = bench.py's (scan
    serialized through a model parameter, slope of two lengths)."""
    import json
    import time

    import numpy as np
    from jax import lax

    from tpu_bijectors import kernels
    from tpu_bijectors.vectorize import unconstrain

    B = 131072
    families = {
        "Dirichlet(16)": lambda t: dists.Dirichlet(jnp.ones(16) * (1.3 + t)),
        "LKJ(16)": lambda t: dists.LKJ(16, 2.0 + t),
        "LKJCholesky(12,L)": lambda t: dists.LKJCholesky(12, 1.5 + t, "L"),
        "Wishart(8)": lambda t: dists.Wishart(10.0 + t, jnp.eye(8)),
        "InverseWishart(8)": lambda t: dists.InverseWishart(
            12.0 + t, jnp.eye(8)
        ),
    }
    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "KERNEL_PERF.json",
    )
    stored = {}
    if _os.path.exists(path) and not update:
        with open(path) as f:
            stored = json.load(f)

    def prog(build, n, use_kernels):
        # BOTH arms serialize through the STATE (v + f(carry)): per-leaf
        # densities are v-only given fixed params, and under param-only
        # serialization XLA's LICM hoists the v-only work out of the scan
        # — including the pallas_call itself when the family's parameter
        # enters OUTSIDE the kernel (observed: LKJ(16) kernel arm "2.6 us"
        # and InverseWishart jnp arm "11 us", both below the HBM floor for
        # even reading the state). The perturbation costs each arm one
        # materialized state copy (~1 HBM pass, identical for both), so
        # kernel_us/jnp_us include it and the stored ratios are slightly
        # CONSERVATIVE — fine for a regression sentinel, which needs
        # stability, not purity.
        @jax.jit
        def many(vT):
            u0 = unconstrain(build(0.0))

            def body(carry, _):
                pert = 1e-3 * jnp.tanh(0.01 * carry)[None, :]
                if not use_kernels:
                    kernels.enable(False)
                try:
                    lp = u0.linked_logdensity_t(vT + pert)
                finally:
                    if not use_kernels:
                        kernels.enable(True)
                return lp, None

            lp, _ = lax.scan(
                body, jnp.zeros((B,), vT.dtype), None, length=n
            )
            return jnp.sum(lp)

        return many

    def t2f(p, vT):
        t0 = time.perf_counter()
        s = float(p(vT))
        assert s == s
        return time.perf_counter() - t0

    def slope(build, vT, use_kernels, n1, n2, reps=3):
        pa, pb = prog(build, n1, use_kernels), prog(build, n2, use_kernels)
        t2f(pa, vT)
        t2f(pb, vT)
        pers = sorted(
            (t2f(pb, vT) - t2f(pa, vT)) / (n2 - n1) for _ in range(reps)
        )
        return pers[reps // 2]

    failures = []
    measured = {}
    key = jax.random.PRNGKey(9)
    for name, build in families.items():
        try:
            u = unconstrain(build(0.0))
            dim = u.linked_vec_length
            vT = 0.4 * jax.random.normal(key, (dim, B), jnp.float32)
            # fast kernels (LKJ's logcosh reduction ~ tens of us) need a
            # long spread: 496 iterations of signal; retry 4x longer if
            # tunnel noise still swamps it (non-positive slope)
            t_k = slope(build, vT, True, 16, 512)
            if t_k <= 0:
                t_k = slope(build, vT, True, 64, 2048)
            t_j = slope(build, vT, False, 2, 10)
            if t_j <= 0:
                t_j = slope(build, vT, False, 2, 34)
            if t_k <= 0 or t_j <= 0:
                raise AssertionError(
                    f"non-positive slope (t_k={t_k:.2e}, t_j={t_j:.2e}) — "
                    "tunnel noise swamped the signal; re-run"
                )
            ratio = t_j / t_k
            measured[name] = {
                "kernel_us": round(t_k * 1e6, 1),
                "jnp_us": round(t_j * 1e6, 1),
                "ratio": round(ratio, 2),
            }
            floor = stored.get(name, {}).get("floor")
            if floor is not None:
                measured[name]["floor"] = floor
                if ratio < floor:
                    raise AssertionError(
                        f"perf sentinel: ratio {ratio:.2f} < floor {floor}"
                    )
            else:
                measured[name]["floor"] = round(0.6 * ratio, 2)
            print(f"  OK   kernel-perf[{name}] {measured[name]}")
        except Exception as ex:
            failures.append((f"kernel-perf[{name}]", ex))
            print(
                f"  FAIL kernel-perf[{name}]: {type(ex).__name__}: "
                f"{str(ex)[:300]}"
            )
            traceback.print_exc(limit=2)
    if measured and (update or not stored):
        with open(path, "w") as f:
            json.dump(measured, f, indent=1)
        print(f"  wrote {path}")
    return failures


def main():
    mode = _sys.argv[1] if len(_sys.argv) > 1 else "fast"
    full = mode == "full"
    print(f"devices: {jax.devices()}  (f32 sweep, {mode})")
    if mode == "perf":
        # perf-sentinel-only run: python tools/tpu_sweep.py perf [update]
        failures = kernel_perf_sentinel(update="update" in _sys.argv[2:])
        print(f"\n{len(failures)} failures" if failures else "\nALL OK")
        _sys.exit(1 if failures else 0)
    failures = mega_smoke()
    failures += kernel_grad_smoke()
    failures += engines_smoke()
    if full:
        failures += kernel_perf_sentinel()
    for d in cases(full):
        name = type(d).__name__
        try:
            # f32 bars: ~1e3*eps round-trip tolerance (sweep is dtype-aware);
            # skip the AD-Jacobian oracle (f32 slogdet too coarse — covered
            # in f64 by the CPU suite)
            test_all(d, atol=1e-4, check_logjac_ad=False, inverse_scale=0.5)
            print(f"  OK   {name}")
        except Exception as ex:
            failures.append((name, ex))
            print(f"  FAIL {name}: {type(ex).__name__}: {str(ex)[:200]}")
            traceback.print_exc(limit=2)
    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    _sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
