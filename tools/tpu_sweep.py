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


def main():
    full = len(_sys.argv) > 1 and _sys.argv[1] == "full"
    print(f"devices: {jax.devices()}  (f32 sweep, {'full' if full else 'fast'})")
    failures = []
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
