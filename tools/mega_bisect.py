"""Bisect which mega-kernel leaf kind faults the TPU.

Usage: python tools/mega_bisect.py <case> [--grad]
Cases: full, generic, or a comma-list of leaf names from the sets below.
Run each case in a FRESH process (a Mosaic fault poisons the whole client).
"""
import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "")  # default: let axon TPU register

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_bijectors import dists  # noqa: E402
from tpu_bijectors.vectorize import unconstrain  # noqa: E402
from tpu_bijectors.vectorize.fused_kernel import _plan, try_mega  # noqa: E402


def e(x):
    return jnp.asarray(x, jnp.float32)


SLAB = {
    "mu": lambda: dists.IIDProduct(dists.Normal(0.5, 2.0), 4),
    "sig": lambda: dists.LogNormal(0.1, 0.5),
    "w": lambda: dists.Dirichlet(jnp.ones(5) * 1.3),
    "c": lambda: dists.LKJ(4, 2.0),
    "wi": lambda: dists.Wishart(6.0, jnp.eye(3)),
    "mvd": lambda: dists.MvNormalDiag(jnp.zeros(3), jnp.ones(3)),
    "mvt": lambda: dists.MvNormalTril(
        jnp.zeros(3),
        jnp.asarray([[1.3, 0.0, 0.0], [0.4, 0.9, 0.0], [-0.2, 0.3, 1.6]]),
    ),
}
GEN = {
    "tn": lambda: dists.Truncated(dists.Normal(0.3, 1.2), lower=-0.5, upper=2.0),
    "tst": lambda: dists.Truncated(dists.StudentT(4.0, 0.2, 1.1), lower=0.0),
    "ku": lambda: dists.Kumaraswamy(2.0, 3.0),
    "bp": lambda: dists.BetaPrime(2.0, 3.5),
    "ig": lambda: dists.InverseGaussian(1.2, 2.0),
    "js": lambda: dists.JohnsonSU(0.1, 1.2, 0.3, 1.1),
    "tri": lambda: dists.TriangularDist(-1.0, 2.0, 0.5),
    "mx": lambda: dists.Mixture(
        dists.Normal(e([-2.0, 3.0]), e([1.0, 2.0])), jnp.log(e([0.5, 0.5]))
    ),
    "jo": lambda: dists.JointOrderStatistics(dists.Normal(0.2, 1.3), 4),
}
ALL = {**SLAB, **GEN}


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "full"
    do_grad = "--grad" in sys.argv
    if case == "full":
        names = list(SLAB)
    elif case == "generic":
        names = list(GEN)
    else:
        names = case.split(",")
    print("devices:", jax.devices(), flush=True)
    d = dists.NamedProduct.of(**{n: ALL[n]() for n in names})
    u = unconstrain(d)
    plan = _plan(u, 1e-6)
    print("plan:", "None" if plan is None else "ok", flush=True)
    if plan is None:
        return
    dim = u.linked_vec_length
    vT = 0.6 * jax.random.normal(jax.random.PRNGKey(0), (dim, 2048), jnp.float32)
    got = try_mega(u, vT)
    assert got is not None, "try_mega declined"
    gv = np.asarray(got)
    print("value read OK, finite:", bool(np.isfinite(gv).all()), flush=True)
    ref = np.asarray(u._linked_logdensity_t_children(vT))
    err = float(np.max(np.abs(gv - ref) / (1.0 + np.abs(ref))))
    print("value rel err:", err, flush=True)
    if do_grad:
        g1 = jax.grad(lambda t: jnp.sum(try_mega(u, t)))(vT)
        g1 = np.asarray(g1)
        print("grad read OK, finite:", bool(np.isfinite(g1).all()), flush=True)
    print("CASE OK:", case, flush=True)


if __name__ == "__main__":
    main()
