"""Parameterized on-chip verify drive (replaces the per-round copies
tools/verify_drive_r03.py / tools/verify_r04.py — VERDICT r4 item 8).

Drives the PUBLIC package surface on the real TPU in f32: golden values,
registry round-trips, grad paths, robustness, error paths, and a short
inference fit. Sections are selectable:

    python tools/verify_drive.py                # core sections
    python tools/verify_drive.py core advi      # plus an ADVI fit
    python tools/verify_drive.py all            # everything

Exits nonzero on any failure; prints an OK line per check.
"""

import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

FAILURES = []


def check(name, fn):
    try:
        fn()
        print(f"OK   {name}", flush=True)
    except Exception:
        FAILURES.append(name)
        print(f"FAIL {name}", flush=True)
        traceback.print_exc()


def sec_core():
    import tpu_bijectors as tb
    from tpu_bijectors import dists

    print("devices:", jax.devices(), flush=True)

    def golden():
        v = float(
            tb.logpdf_with_trans(dists.LogNormal(), jnp.asarray(math.e), True)
        )
        assert abs(v - (-1.4189385)) < 1e-4, v

    check("golden logpdf_with_trans(LogNormal, e)", golden)

    def dirichlet_roundtrip():
        d = dists.Dirichlet(jnp.ones(8))
        b = tb.bijector(d)
        x = d.sample(jax.random.PRNGKey(0), (4096,))
        y, ld = jax.jit(b.forward_and_log_det)(x)
        err = float(jnp.max(jnp.abs(jax.jit(b.inverse)(y) - x)))
        assert err < 1e-4, err
        assert bool(jnp.all(jnp.isfinite(ld)))

    check("Dirichlet jitted batched round-trip", dirichlet_roundtrip)

    def grad_path():
        d = dists.Dirichlet(jnp.ones(8))
        b = tb.bijector(d)
        g = jax.jit(
            jax.grad(
                lambda y: -(d.logpdf(b.inverse(y)) + b.inverse_and_log_det(y)[1])
            )
        )(jnp.zeros(7))
        assert bool(jnp.all(jnp.isfinite(g)))

    check("grad through fused inverse+logdet", grad_path)

    def robustness():
        d = dists.Dirichlet(jnp.ones(5))
        b = tb.bijector(d)
        y = 1e10 * jax.random.normal(jax.random.PRNGKey(1), (1000, 4))
        x = jax.jit(b.inverse)(y)
        lp = tb.logpdf_with_trans(d, x, True)
        assert bool(jnp.all(jnp.isfinite(lp)))

    check("1e10-jump robustness", robustness)

    def transformed_bulk():
        td = tb.transformed(dists.Gamma(2.0, 3.0))
        y = jax.random.normal(jax.random.PRNGKey(2), (200_000,))
        lp = jax.jit(td.logpdf)(y)
        assert bool(jnp.all(jnp.isfinite(lp)))

    check("transformed(Gamma).logpdf over 2e5 points", transformed_bulk)

    def error_paths():
        from tpu_bijectors.bijectors import SimplexBijector

        try:
            SimplexBijector().forward(jnp.ones(1))
            raise AssertionError("expected ValueError")
        except ValueError:
            pass

    check("error paths (SimplexBijector K=1)", error_paths)


def sec_nuts():
    from tpu_bijectors import dists
    from tpu_bijectors.infer import Model

    def nuts_auto():
        model = Model(
            priors=dists.NamedProduct.of(
                mu=dists.IIDProduct(dists.Normal(0.0, 1.0), 3),
                s=dists.LogNormal(0.0, 0.5),
                w=dists.Dirichlet(jnp.ones(4)),
            ),
            loglik=None,
        )
        samples, state, stats = model.sample(
            jax.random.PRNGKey(0), n_chains=8, n_warmup=300, n_samples=300
        )
        import numpy as np

        mu = np.asarray(samples["mu"]).reshape(-1, 3)
        assert abs(mu.mean()) < 0.15, mu.mean()
        assert abs(mu.std() - 1.0) < 0.15, mu.std()
        w = np.asarray(samples["w"]).reshape(-1, 4)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
        div = float(np.asarray(stats.diverging, float).mean())
        assert div < 0.05, div

    check("Model.sample(kernel='auto') moments", nuts_auto)


def sec_advi():
    from tpu_bijectors import dists
    from tpu_bijectors.infer import Model, fit_advi

    def advi_fit():
        model = Model(
            priors=dists.NamedProduct.of(
                w=dists.Dirichlet(jnp.asarray([2.0, 3.0, 4.0])),
                s=dists.LogNormal(0.0, 0.5),
            ),
            loglik=None,
        )
        res = jax.jit(
            lambda k: fit_advi(
                model.batched_logdensity_fn(), k, model.dim(),
                n_steps=800, n_mc=16, learning_rate=2e-2,
            )
        )(jax.random.PRNGKey(3))
        import numpy as np

        losses = np.asarray(res.losses)
        assert np.all(np.isfinite(losses))
        assert losses[-50:].mean() < losses[:50].mean(), "ELBO did not improve"
        # transposed orientation: whole-model fused kernel path on chip
        res_t = jax.jit(
            lambda k: fit_advi(
                model.batched_logdensity_t_fn(), k, model.dim(),
                n_steps=200, n_mc=256, learning_rate=2e-2, transposed=True,
            )
        )(jax.random.PRNGKey(4))
        lt = np.asarray(res_t.losses)
        assert np.all(np.isfinite(lt))

    check("fit_advi (batch-major + transposed) on chip", advi_fit)


SECTIONS = {"core": sec_core, "nuts": sec_nuts, "advi": sec_advi}


def main(argv):
    names = argv or ["core"]
    if names == ["all"]:
        names = list(SECTIONS)
    for n in names:
        print(f"=== section {n} ===", flush=True)
        SECTIONS[n]()
    if FAILURES:
        print("FAILURES:", FAILURES, flush=True)
        return 1
    print("ALL OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
