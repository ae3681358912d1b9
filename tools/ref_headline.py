"""Head-to-head against the reference's ONLY published performance numbers.

The reference's sole quantitative perf claims (BASELINE.md) are the
Elementwise fast-path timings for d = product_distribution(fill(Beta(2,2),10))
(/root/reference/src/vector/product/fill.jl:5-6, dev-machine comment):

    from_linked_vec(d)(y):  731 ns -> 59 ns  (generic -> fast path)
    to_linked_vec(d)(x):    278 ns -> 75 ns

Those are single-sample CPU latencies. The TPU-native equivalent of the
fast path is the IIDUnconstrainer: ONE batched bijector over the block, so
the honest comparison is amortized per-eval time at a serving batch
(and at batch=1 for the latency-parity row). Slope-timed scans (see memory
tpu-benchmark-gotchas: block_until_ready does not wait on this tunnel).

Usage: python tools/ref_headline.py   (run from /root/repo, ~2 min on chip)
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from tpu_bijectors import dists
from tpu_bijectors.vectorize import unconstrain


def slope_time(mk_prog, v):
    """Per-iteration seconds of prog(v, n) via the slope between two n."""

    def t2f(prog):
        t0 = time.perf_counter()
        s = float(prog(v))
        assert s == s, "NaN"
        return time.perf_counter() - t0

    p8, p40 = mk_prog(8), mk_prog(40)
    t2f(p8), t2f(p40)  # compile
    per0 = max((t2f(p40) - t2f(p8)) / 32, 1e-7)
    n1 = 16
    n2 = n1 + min(65536, max(64, int(0.06 / per0)))
    pa, pb = mk_prog(n1), mk_prog(n2)
    t2f(pa), t2f(pb)
    pers = sorted((t2f(pb) - t2f(pa)) / (n2 - n1) for _ in range(3))
    return pers[1]


def main():
    d = dists.IIDProduct(dists.Beta(2.0, 2.0), 10)  # fill(Beta(2,2), 10)
    u = unconstrain(d)
    dim = u.linked_vec_length
    assert dim == 10

    rows = []
    for batch in (1, 4096, 131072):
        v = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (batch, dim))

        def mk_from(n):
            @jax.jit
            def prog(v):
                def body(c, _):
                    x, _ld = u.from_linked_vec(v + 1e-3 * jnp.tanh(0.01 * c))
                    return x, None

                x, _ = lax.scan(body, v, None, length=n)
                return jnp.sum(x)

            return prog

        def mk_to(n):
            @jax.jit
            def prog(v):
                def body(c, _):
                    y, _ld = u.to_linked_vec(0.5 + 0.4 * jnp.tanh(c))
                    return y, None

                y, _ = lax.scan(body, v, None, length=n)
                return jnp.sum(y)

            return prog

        t_from = slope_time(mk_from, v)
        t_to = slope_time(mk_to, v)
        rows.append((batch, t_from, t_to))
        print(
            "batch=%6d  from_linked_vec: %10.1f ns/call %10.3f ns/eval   "
            "to_linked_vec: %10.1f ns/call %10.3f ns/eval"
            % (batch, t_from * 1e9, t_from * 1e9 / batch, t_to * 1e9, t_to * 1e9 / batch),
            flush=True,
        )

    b, tf, tt = rows[-1]
    b1, tf1, tt1 = rows[0]
    print(
        "\nreference fast path (fill.jl:5-6, single-sample CPU): "
        "from=59 ns  to=75 ns"
    )
    # both framings, labeled (ADVICE r2): single-sample latency is the
    # apples-to-apples quote; amortized per-eval is the batched-throughput
    # framing the TPU design targets — do not quote one as the other.
    print(
        "this build, single-sample LATENCY at batch=%d: from=%.1f ns (%.2fx)  "
        "to=%.1f ns (%.2fx)"
        % (b1, tf1 * 1e9, 59 / (tf1 * 1e9), tt1 * 1e9, 75 / (tt1 * 1e9))
    )
    print(
        "this build, AMORTIZED per eval at batch=%d: from=%.3f ns (%.0fx)  "
        "to=%.3f ns (%.0fx)"
        % (b, tf * 1e9 / b, 59 / (tf * 1e9 / b), tt * 1e9 / b, 75 / (tt * 1e9 / b))
    )


if __name__ == "__main__":
    main()
