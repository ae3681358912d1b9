"""NeuTra on Neal's funnel: geometry no single step size can sample.

    y ~ N(0, 3);  x_i | y ~ N(0, exp(y/2))    (Var(y) = 9)

Step-size-adapted NUTS compromises between the wide mouth and the narrow
neck and underestimates Var(y). NeuTra trains a MAF transport to the
target with ADVI and runs NUTS on the pulled-back (near-spherical)
density; transported draws are asymptotically exact.

Run: python examples/neutra_funnel.py   (CPU or one TPU chip)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors.infer import (
    fit_neutra_flow,
    neutra_logdensity,
    warmup_and_sample,
)

DIM = 4  # y + 3 x's
_LOG2PI = float(np.log(2.0 * np.pi))


def funnel_logp(v):
    y, x = v[..., 0], v[..., 1:]
    lp_y = -0.5 * (y / 3.0) ** 2 - jnp.log(3.0) - 0.5 * _LOG2PI
    lp_x = jnp.sum(
        -0.5 * (x * jnp.exp(-y[..., None] / 2.0)) ** 2
        - y[..., None] / 2.0 - 0.5 * _LOG2PI,
        -1,
    )
    return lp_y + lp_x


funnel_logp.batch_capable = True

key = jax.random.PRNGKey(0)

# vanilla NUTS baseline: watch Var(y) come out low (max_depth capped —
# uncapped trees on the funnel neck are exactly the pathology NeuTra fixes)
q0 = jax.random.normal(jax.random.PRNGKey(1), (16, DIM))
vanilla, _, _ = jax.jit(
    lambda k, q: warmup_and_sample(
        funnel_logp, k, q, n_warmup=400, n_samples=800, kernel="nuts_batched",
        max_depth=8,
    )
)(key, q0)
y_v = np.asarray(vanilla)[..., 0].ravel()
print(f"vanilla NUTS : mean(y)={y_v.mean():+.3f}  var(y)={y_v.var():.2f}  (truth 9.0)",
      flush=True)

# NeuTra: fit the transport, sample in z, push forward
res = fit_neutra_flow(funnel_logp, key, DIM, n_layers=4, hidden=64,
                      n_steps=4000, n_mc=128)
print(f"transport fit: KL(q||target) ~ {float(res.losses[-100:].mean()):.3f}",
      flush=True)
logp_z = neutra_logdensity(funnel_logp, res.flow)
z, _, stats = jax.jit(
    lambda k, q: warmup_and_sample(
        logp_z, k, q, n_warmup=400, n_samples=800, kernel="nuts_batched"
    )
)(jax.random.PRNGKey(2), q0)
y_n = np.asarray(res.flow.forward(z))[..., 0].ravel()
print(f"NeuTra  NUTS : mean(y)={y_n.mean():+.3f}  var(y)={y_n.var():.2f}  (truth 9.0)")
