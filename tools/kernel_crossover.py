"""Regenerate the Pallas-vs-jnp crossover table backing the dispatch
thresholds in kernels/__init__.py, using SLOPE-TIMED scans (the only
trustworthy protocol on this tunnel — see CLAUDE.md / tools/slope_probe.py;
block_until_ready does not wait for device execution here).

Run on the real TPU: `python tools/kernel_crossover.py [--quick]`
(background mode: the first transfer costs 150-500 s). Prints a markdown
table for docs/kernels.md.
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def _scan_prog(fn, batch, n):
    @jax.jit
    def many(y):
        def body(carry, _):
            out = fn(y + 1e-3 * jnp.tanh(0.01 * carry[:, None]))
            s = sum(
                l if l.ndim == 1 else jnp.sum(l, axis=tuple(range(1, l.ndim)))
                for l in jax.tree_util.tree_leaves(out)
            )
            return s, None

        s, _ = lax.scan(body, jnp.zeros((batch,), y.dtype), None, length=n)
        return jnp.sum(s)

    return many


def _t2f(prog, y):
    t0 = time.perf_counter()
    s = float(prog(y))
    assert s == s
    return time.perf_counter() - t0


def _slope(fn, y, n1, n2, reps=3):
    pa, pb = _scan_prog(fn, y.shape[0], n1), _scan_prog(fn, y.shape[0], n2)
    _t2f(pa, y), _t2f(pb, y)
    pers = sorted((_t2f(pb, y) - _t2f(pa, y)) / (n2 - n1) for _ in range(reps))
    return pers[reps // 2]


def main():
    quick = "--quick" in sys.argv
    from tpu_bijectors.bijectors import corr, pd, simplex

    Bs = (4096, 131072) if quick else (1024, 16384, 131072)
    Ks = (4, 16) if quick else (4, 8, 16)
    cases = [(kind, K) for K in Ks for kind in ("simplex", "lkj", "pd")]

    # handshake
    y0 = jnp.ones((1024, 3))
    _t2f(_scan_prog(lambda y: jnp.sum(y, -1), 1024, 1), y0)
    print("handshake done", file=sys.stderr)

    print("| kernel | K | B | jnp us | pallas us | speedup |")
    print("|---|---|---|---|---|---|")
    for kind, K in cases:
        for B in Bs:
            key = jax.random.PRNGKey(0)
            if kind == "simplex":
                y = 0.3 * jax.random.normal(key, (B, K - 1))
                jnp_fn = lambda v: simplex._simplex_inverse_logdet_jnp(v)[1]
                pal_fn = lambda v: simplex._simplex_inverse_logdet_pallas_diffable(v)[1]
            elif kind == "lkj":
                d = K * (K - 1) // 2
                y = 0.3 * jax.random.normal(key, (B, d))
                jnp_fn = corr._vec_corr_logdet_jnp
                pal_fn = lambda v, K=K: corr._vec_corr_logdet_pallas(v, K)
            else:
                d = K * (K + 1) // 2
                y = 0.3 * jax.random.normal(key, (B, d))
                jnp_fn = lambda v: pd._pd_inverse_all_jnp(v)[1]
                pal_fn = lambda v, K=K: pd._pd_inverse_all_pallas(v, K)[1]
            # spread sized for ~30+ ms of signal even at fast configs
            n1, n2 = 8, 8 + (2048 if B <= 16384 else 256)
            tj = _slope(jnp_fn, y, n1, n2)
            tp = _slope(pal_fn, y, n1, n2)
            mark = " <-- pallas" if tp < tj else ""
            print(
                "| %s | %d | %d | %.1f | %.1f | %.2f%s |"
                % (kind, K, B, tj * 1e6, tp * 1e6, tj / tp, mark),
                flush=True,
            )


if __name__ == "__main__":
    main()
