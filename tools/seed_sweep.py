"""Seed-robustness sweep: testing.test_all over the ENTIRE family matrix
with fresh seeds (the pinned-seed pytest suite cannot catch seed-sensitive
numerics; this can — a one-off run of two fresh seeds found 0 failures on
2026-08-18).

Usage: python tools/seed_sweep.py [seed ...]   (default: 101 202; ~15 min
per seed on one CPU core)
"""

import sys as _sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import os as _os  # noqa: E402

_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _ROOT)
_sys.path.insert(0, _os.path.join(_ROOT, "tests"))

import test_all_matrix as m  # noqa: E402  (the pytest matrix is the case source)
from tpu_bijectors.testing import test_all  # noqa: E402


def groups():
    return {
        "univariate": [
            (d, dict(inverse_scale=0.5 if isinstance(d, m._SCALE_DOWN) else 1.0))
            for d in m._univariates()
        ],
        "discrete": [(d, {}) for d in m._discretes()],
        "multivariate": [(d, {}) for d in m._multivariates()],
        "matrix": [(d, {}) for d in m._matrix_dists()],
        "product": [(d, {}) for d in m._products()],
        "wrapped": [(d, {}) for d in m._wrapped()],
    }


def main():
    seeds = [int(s) for s in _sys.argv[1:]] or [101, 202]
    fails = []
    for seed in seeds:
        for gname, cases in groups().items():
            for d, kw in cases:
                label = f"seed{seed}:{gname}:{type(d).__name__}"
                try:
                    test_all(d, seed=seed, **kw)
                except Exception as ex:  # noqa: BLE001 — report and continue
                    fails.append(label)
                    print(f"FAIL {label}: {type(ex).__name__}: {str(ex)[:200]}",
                          flush=True)
            print(f"seed {seed} group {gname} done", flush=True)
    print("TOTAL FAILURES:", len(fails), fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
