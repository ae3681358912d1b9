"""Root-cause probe for TPUSWEEP_r03.txt:52-70: on the real TPU in f32,
element 2 (a Dirichlet free coordinate) of grad(linked_logdensity) for
NamedProduct(mu=Normal, w=Dirichlet(4), c=LKJ(3)) disagreed with central
differences by 9.2% relative, while the standalone Dirichlet row passed.

This reproduces the sweep's exact evaluation point (same rng consumption
order as testing/sweep.py::test_all at seed=23, inverse_scale=0.5) and
prints, elementwise:
  - AD grad on this backend (f32)
  - central differences at the sweep's h on this backend (f32)
  - the f64 analytic oracle (CPU, via jax.grad in x64) when run on CPU
  - per-h FD sweeps (h/4, h, 4h) to separate truncation error from a wrong
    gradient: a REAL AD bug stays put as h shrinks; FD noise moves.

Run:  python tools/namedproduct_grad_probe.py          (TPU)
      python tools/namedproduct_grad_probe.py cpu      (CPU f32 + f64 oracle)
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(_os.path.abspath(__file__)))))

import jax

if len(_sys.argv) > 1 and _sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.vectorize import unconstrain


def main():
    print("devices:", jax.devices())
    d = dists.NamedProduct.of(
        mu=dists.Normal(), w=dists.Dirichlet(jnp.ones(4)), c=dists.LKJ(3, 2.0)
    )
    u = unconstrain(d)
    dim = u.linked_vec_length
    # replicate the sweep's rng stream at tpu_sweep settings
    # (check_logjac_ad=False, inverse_scale=0.5): prop 2 draws (16, dim),
    # prop 5 draws dim, prop 6 is SKIPPED, prop 8 draws dim
    rng = np.random.default_rng(23)
    rng.standard_normal((16, dim))
    rng.standard_normal(dim)
    y64 = rng.standard_normal(dim) * 0.3 * 0.5

    def run(dtype, tag):
        y = jnp.asarray(y64, dtype)
        f = lambda v: jnp.sum(u.linked_logdensity(v))
        g = np.asarray(jax.grad(f)(y), np.float64)
        eps = float(jnp.finfo(dtype).eps)
        h0 = eps ** (1.0 / 3.0)
        print(f"\n[{tag}] dtype={dtype.__name__}  y={np.asarray(y)}")
        print(f"  AD grad: {g}")
        for mult in (0.25, 1.0, 4.0):
            h = h0 * mult
            E = jnp.eye(dim, dtype=dtype) * h
            fd = np.asarray(
                (u.linked_logdensity(y + E) - u.linked_logdensity(y - E))
                / (2.0 * h),
                np.float64,
            )
            rel = np.abs(g - fd) / (1.0 + np.abs(fd))
            print(f"  FD(h={h:.2e}): {fd}")
            print(f"    rel vs AD : {rel}")
        # batched-vs-single consistency of the VALUE path (FD evaluates a
        # (dim, dim) batch; AD a single row — a batch-dependent kernel
        # dispatch would show up here)
        single = np.array(
            [float(u.linked_logdensity(r[None, :])[0]) for r in jnp.eye(dim, dtype=dtype) * h0 + y]
        )
        batched = np.asarray(u.linked_logdensity(y + jnp.eye(dim, dtype=dtype) * h0), np.float64)
        print(f"  batched-vs-single value max abs diff: {np.abs(single - batched).max():.3e}")
        return g

    g32 = run(jnp.float32, "f32")
    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)
        try:
            d64 = dists.NamedProduct.of(
                mu=dists.Normal(),
                w=dists.Dirichlet(jnp.ones(4, jnp.float64)),
                c=dists.LKJ(3, 2.0),
            )
            u64 = unconstrain(d64)
            y = jnp.asarray(y64)
            g64 = np.asarray(
                jax.grad(lambda v: jnp.sum(u64.linked_logdensity(v)))(y)
            )
            print(f"\n[f64 oracle] AD grad: {g64}")
            print(f"  f32 AD vs f64 AD rel: {np.abs(g32 - g64) / (1.0 + np.abs(g64))}")
        finally:
            jax.config.update("jax_enable_x64", False)


if __name__ == "__main__":
    main()
