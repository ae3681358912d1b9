"""Benchmark: batched transform+logdetJ evals/s/chip on the real device.

Measures the fused `linked_logdensity` hot path (what every NUTS leapfrog
step evaluates) for a hierarchical mixed-support model
(location + positive scales + simplex weights + LKJ(16) correlation),
batched at 131072.

The fused path holds the state in the TPU-native transposed (dim, batch)
orientation and evaluates the ENTIRE model as ONE Pallas kernel
(vectorize/fused_kernel.py): batch rides the 128-wide lane axis end to
end, the state is read from HBM exactly once, and no matrix is ever
decomposed — the LKJ density telescopes to a weighted logcosh reduction
(factor-aware fusion, reference src/bijectors/corr.jl:56-79 semantics).
The naive baseline is the honest unfused alternative a user without the
fused API would write: per-sample from_linked_vec, then logpdf(x) (which
must re-Cholesky the (131072, 16, 16) correlation batch) minus a separately
recomputed forward log-det, vmapped.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "evals/s/chip", "vs_baseline": R,
   "vs_jnp_batched": R2}
value = true fused evals/s; vs_baseline = t_naive / t_fused (the reference
publishes no throughput numbers, BASELINE.md); vs_jnp_batched =
t_jnp_batched / t_fused, the REGRESSION SENTINEL: the same fused model with
the Pallas kernels disabled (best batched+transposed jnp path). Unlike the
naive ratio (~1000x, which a 5x kernel regression would not dent), this
ratio directly tracks the kernels' contribution (~3-25x per
docs/kernels.md); below 1.5 the bench prints a loud WARNING and exits
nonzero. `--no-kernels` forces the fused path onto the jnp path too
(ratio ~1), demonstrating the sentinel trips.

Measurement protocol (CLAUDE.md + memory tpu-benchmark-gotchas; every rule
exists because this tunnel breaks the usual assumptions):
- block_until_ready does NOT wait for device execution here, so each
  variant runs n iterations inside ONE lax.scan with a real data
  dependence (the carry drives a MODEL PARAMETER of the next eval, so
  the program cannot be hoisted; the state buffer itself stays
  loop-invariant and read-only — perturbing the state instead would
  force a materialized (dim, batch) copy per iteration, ~2 extra HBM
  passes billed to every path) and is synced by float(sum(...)) — a
  transfer cannot return before the queued program finished.
- per-iteration time = slope between two scan lengths, which cancels the
  ~33 ms transfer cost and all host overheads; median of 3 slopes.
- the first transfer in a process costs 150-500 s (tunnel handshake), paid
  once up front.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

BATCH = 131072
K = 16


def _model(loc=0.0):
    from tpu_bijectors import dists

    return dists.NamedProduct.of(
        mu=dists.IIDProduct(dists.Normal(loc, 2.0), 8),
        sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
        w=dists.Dirichlet(jnp.ones(16)),
        corr=dists.LKJ(K, 2.0),
    )


def _scan_prog(step_fn, n, serialize="param"):
    # Loop-serialization rides the MODEL PARAMETERS, not the state: each
    # iteration's Normal loc depends on the previous log-density, so XLA
    # cannot hoist the eval out of the scan, while the (dim, batch) state
    # stays a loop-invariant READ-ONLY buffer. The old protocol perturbed
    # the state itself (v + f(carry)), which forced a materialized full
    # copy of the state every iteration — ~2 extra HBM passes billed to
    # every path (kernel, jnp, naive alike), ~2x on the fused time. Params
    # ride in the kernel's tiny coefficient operand (KB), so this form
    # times what the metric names: one transform+logdetJ eval over the
    # batch.
    #
    # EXCEPTION (serialize="state"): the naive path's expensive work — the
    # per-sample re-Cholesky and second link pass — depends only on v, so
    # with a loop-invariant v XLA's loop-invariant code motion hoists it
    # out of the scan entirely and t_naive measures only the loc-dependent
    # Normal leaf (observed: 300 ms -> 2.4 ms, deflating vs_baseline
    # ~100x). The naive path therefore keeps the state-perturbing form;
    # its copy overhead (~0.2 ms) is ~0.1% of its own per-iteration cost,
    # so the ratio stays honest to <1%. The fused/jnp paths (the ratio's
    # numerator and the sentinel) are one opaque kernel / one fused
    # cluster over (v, params) each iteration — nothing hoists.
    @jax.jit
    def many(v):
        def body(carry, _):
            if serialize == "state":
                pert = 1e-3 * jnp.tanh(0.01 * carry)
                pert = pert[:, None] if v.shape[0] == BATCH else pert[None, :]
                lp = step_fn(v + pert, 0.0)
            else:
                lp = step_fn(v, 1e-3 * jnp.tanh(0.01 * jnp.mean(carry)))
            return lp, None

        lp, _ = lax.scan(body, jnp.zeros((BATCH,), v.dtype), None, length=n)
        return jnp.sum(lp)

    return many


def _t2f(prog, v):
    t0 = time.perf_counter()
    s = float(prog(v))
    assert s == s, "NaN logdensity in bench"
    return time.perf_counter() - t0


def _slope(step_fn, v, n1, n2, reps=3, serialize="param"):
    pa = _scan_prog(step_fn, n1, serialize)
    pb = _scan_prog(step_fn, n2, serialize)
    _t2f(pa, v)  # compile
    _t2f(pb, v)
    pers = sorted(
        (_t2f(pb, v) - _t2f(pa, v)) / (n2 - n1) for _ in range(reps)
    )
    return pers[reps // 2]


def _arm_watchdog(seconds=900):
    """Emit a fallback JSON line and exit if the device never responds.

    The axon tunnel can go down for hours (device enumeration / the first
    transfer then hangs indefinitely). A bench that hangs records nothing;
    this guarantees the driver always captures ONE parseable line. The
    timeout is far above the worst observed healthy handshake (~500 s), so
    it cannot fire on a slow-but-alive tunnel."""
    import os
    import threading

    done = threading.Event()

    def fire():
        if done.wait(seconds):
            return
        print(
            json.dumps(
                {
                    "metric": "hierarchical transform+logdetJ evals/s/chip "
                    "(TPU tunnel unreachable for %ds — no measurement this "
                    "run; last LIVE on-chip capture 2026-08-17, same code "
                    "path: 6.13e8 evals/s/chip, vs_baseline 1408 slope-timed"
                    " — see STATUS.md / docs/kernels.md)" % seconds,
                    "value": 0.0,
                    "unit": "evals/s/chip",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        os._exit(2)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main():
    from tpu_bijectors.vectorize import unconstrain

    if "--no-kernels" in sys.argv:
        # sentinel self-test: with kernels globally off the fused path IS
        # the jnp path, so vs_jnp_batched ~ 1 and the bench must exit 1
        from tpu_bijectors import kernels

        kernels.enable(False)
        kernels.enable = lambda flag=True: None  # keep the in-trace toggle off

    watchdog_done = _arm_watchdog()

    dim = unconstrain(_model()).linked_vec_length
    v = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (BATCH, dim))
    # the fused hot path holds the state in the TPU-native transposed
    # (dim, batch) orientation and evaluates the whole model as ONE Pallas
    # kernel (vectorize/fused_kernel.py) — batch on lanes end to end, the
    # state read from HBM exactly once
    vt = jnp.swapaxes(v, 0, 1)

    def fused_fn(vT, loc):
        return unconstrain(_model(loc)).linked_logdensity_t(vT)

    def jnp_batched_fn(vT, loc):
        # regression sentinel baseline: the SAME batched transposed path
        # with the Pallas kernels disabled (trace-time toggle; this body
        # runs during tracing, so the whole trace sees kernels off)
        from tpu_bijectors import kernels

        kernels.enable(False)
        try:
            return unconstrain(_model(loc)).linked_logdensity_t(vT)
        finally:
            kernels.enable(True)

    def naive_fn(v, loc):
        priors = _model(loc)
        un = unconstrain(priors)

        def naive_one(vi):
            x, _ = un.from_linked_vec(vi)
            _, ld = un.to_linked_vec(x)  # recompute logdet the long way round
            return priors.logpdf(x) - ld

        return jax.vmap(naive_one)(v)

    # handshake: pay the first-transfer cost on a tiny program
    t0 = time.perf_counter()
    _t2f(_scan_prog(fused_fn, 1), vt)
    print("handshake %.0fs" % (time.perf_counter() - t0), file=sys.stderr)
    watchdog_done.set()  # device is alive; measurement proceeds unbounded

    # fused is ~100 us/iter: a 384-iteration spread is ~40 ms of signal
    t_fused = _slope(fused_fn, vt, 16, 400)
    # jnp batched sentinel baseline is ~5 ms/iter; a (2, 18) spread ~80 ms
    t_jnp = _slope(jnp_batched_fn, vt, 2, 18)
    # naive is ~three orders slower; a (1, 3) spread is ~0.6 s of signal.
    # serialize="state": its v-only re-Cholesky must not hoist (see
    # _scan_prog); copy overhead is ~0.1% of the naive cost.
    t_naive = _slope(naive_fn, v, 1, 3, serialize="state")

    vs_baseline = t_naive / t_fused
    vs_jnp = t_jnp / t_fused
    sentinel_tripped = vs_jnp < 1.5
    if sentinel_tripped:
        print(
            "WARNING: kernel regression sentinel TRIPPED: vs_jnp_batched "
            "%.3f < 1.5 (t_fused=%.1fus t_jnp_batched=%.1fus) — the fused "
            "kernels are no faster than the batched jnp path"
            % (vs_jnp, t_fused * 1e6, t_jnp * 1e6),
            file=sys.stderr,
        )
    if vs_baseline < 1.2:
        print(
            "WARNING: fusion ratio %.3f < 1.2 (t_fused=%.1fus t_naive=%.1fus)"
            % (vs_baseline, t_fused * 1e6, t_naive * 1e6),
            file=sys.stderr,
        )

    out = {
        "metric": "hierarchical transform+logdetJ evals/s/chip "
        "(batch=%d, dim=%d, LKJ K=%d, slope-timed)" % (BATCH, dim, K),
        "value": round(BATCH / t_fused, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(vs_baseline, 3),
        "vs_jnp_batched": round(vs_jnp, 3),
    }
    try:
        out["nuts_draws_per_s_chip_b64"] = _nuts_secondary()
    except Exception as ex:  # secondary metric must never sink the bench
        print("nuts secondary skipped: %r" % (ex,), file=sys.stderr)
    print(json.dumps(out))
    if sentinel_tripped:
        sys.exit(1)


def _nuts_secondary(B=64, n_warmup=300, n1=64, n2=256):
    """End-to-end NUTS draws/s/chip at B=64 chains on the same model — the
    BASELINE.md north-star metric, regressed every round (full sweep over
    B and kernels-on/off: tools/nuts_throughput.py -> NUTS_THROUGHPUT.json).
    Same protocol: programs jitted once, slope of two cached sampling
    lengths cancels warmup and constants."""
    from tpu_bijectors.infer import Model
    from tpu_bijectors.infer.sampler import warmup_and_sample

    m = Model(priors=_model(), loglik=None)
    logp = m.batched_logdensity_t_fn()
    q0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, m.dim()))
    key = jax.random.PRNGKey(7)

    def build(n):
        return jax.jit(
            lambda k, q: warmup_and_sample(
                logp, k, q, n_warmup=n_warmup, n_samples=n,
                kernel="nuts_batched_t", max_depth=8,
            )[0]
        )

    def timed(prog, reps=3):
        def once():
            t0 = time.perf_counter()
            s = float(jnp.sum(prog(key, q0)))
            assert s == s
            return time.perf_counter() - t0

        once()
        once()
        return sorted(once() for _ in range(reps))[reps // 2]

    per_draw = (timed(build(n2)) - timed(build(n1))) / (n2 - n1)
    return round(B / per_draw, 1)


if __name__ == "__main__":
    main()
