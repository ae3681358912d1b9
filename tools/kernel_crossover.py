"""Regenerate the Pallas-vs-jnp crossover table backing the dispatch
thresholds in kernels/__init__.py (VERDICT r1 Weak #6).

Run on the real TPU: `python tools/kernel_crossover.py [--quick]`.
Prints a markdown table (paste into docs/kernels.md) of per-dispatch times
for the Pallas kernel vs the jnp reference at each (kernel, K, B), with the
winner marked. Uses min-of-blocks timing (the tunnel's per-dispatch latency
drifts at machine level — see CLAUDE.md).
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _time(fn, *args, iters=30, blocks=4, warmup=8):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main():
    quick = "--quick" in sys.argv
    from tpu_bijectors import kernels
    from tpu_bijectors.bijectors import corr, pd, simplex

    Bs = (512, 4096, 131072) if quick else (256, 1024, 4096, 16384, 65536, 131072)
    cases = []
    for K in (4, 8, 16) if quick else (4, 8, 16, 32):
        cases.append(("simplex", K))
    for K in (4, 8, 16):
        cases.append(("lkj", K))
        cases.append(("pd", K))

    print("| kernel | K | B | jnp us | pallas us | speedup |")
    print("|---|---|---|---|---|---|")
    for kind, K in cases:
        for B in Bs:
            key = jax.random.PRNGKey(0)
            if kind == "simplex":
                y = 0.3 * jax.random.normal(key, (B, K - 1))
                jnp_fn = jax.jit(simplex._simplex_inverse_logdet_jnp)
                pal_fn = jax.jit(simplex._simplex_inverse_logdet_pallas_diffable)
            elif kind == "lkj":
                d = K * (K - 1) // 2
                y = 0.3 * jax.random.normal(key, (B, d))
                jnp_fn = jax.jit(corr._vec_corr_logdet_jnp)
                pal_fn = jax.jit(lambda v, K=K: corr._vec_corr_logdet_pallas(v, K))
            else:
                d = K * (K + 1) // 2
                y = 0.3 * jax.random.normal(key, (B, d))
                jnp_fn = jax.jit(lambda v: pd._pd_inverse_all_jnp(v)[1])
                pal_fn = jax.jit(lambda v, K=K: pd._pd_inverse_all_pallas(v, K)[1])
            tj = _time(jnp_fn, y)
            tp = _time(pal_fn, y)
            mark = " <-- pallas wins" if tp < tj else ""
            print(
                f"| {kind} | {K} | {B} | {tj*1e6:.1f} | {tp*1e6:.1f} | "
                f"{tj/tp:.2f}{mark} |",
                flush=True,
            )


if __name__ == "__main__":
    main()
