"""/verify drive, round 4: public API on the REAL TPU (f32, axon).

Covers the standard recipe plus the subsystems this round's diff touched:
- Model.sample(kernel='auto') — engages the ONE-PASS fused value-and-grad
  leapfrog (mega_value_and_grad_t) at a realistic 8-chain count
- infer.resume_sampling — bit-identical continuation from a SamplerState
- the telescoped Dirichlet slab entry's extreme-state semantics (1e10)
- a generic-traced model (JohnsonSU — the r3 on-chip crash) value+grad
"""
import math
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.infer import Model, resume_sampling, warmup_and_sample

print("devices:", jax.devices())

# 1. golden value (f32: expect ~-1.41893)
g0 = float(tb.logpdf_with_trans(dists.LogNormal(), jnp.asarray(math.e), True))
print(f"logpdf_with_trans(LogNormal, e, True) = {g0:.5f}  (expect ~-1.41893)")
assert abs(g0 - (-1.41893)) < 1e-3

# 2. batched jitted round-trip through the registry
d = dists.Dirichlet(jnp.ones(8))
b = tb.bijector(d)
x = d.sample(jax.random.PRNGKey(0), (4096,))
y, ld = jax.jit(b.forward_and_log_det)(x)
rt = float(jnp.max(jnp.abs(jax.jit(b.inverse)(y) - x)))
print(f"Dirichlet round-trip max err = {rt:.2e}  (f32, expect ~1e-5)")
assert rt < 1e-4

# 3. grad through fused inverse+logdet (NUTS hot path)
g = jax.jit(
    jax.grad(
        lambda y: -(d.logpdf(b.inverse(y)) + b.inverse_and_log_det(y)[1])
    )
)(jnp.zeros(7))
print("grad finite:", bool(jnp.all(jnp.isfinite(g))))
assert bool(jnp.all(jnp.isfinite(g)))

# 4. extreme robustness: 1e10 jump through the TELESCOPED Dirichlet slab
m = Model(
    priors=dists.NamedProduct.of(
        mu=dists.Normal(0.0, 1.0),
        w=dists.Dirichlet(2.0 * jnp.ones(8)),
        c=dists.LKJ(8, 2.0),
    )
)
lp_fn = m.batched_logdensity_t_fn()
vT = 1e10 * jax.random.normal(jax.random.PRNGKey(1), (m.dim(), 64))
lp_big = lp_fn(vT)
gr_big = jax.grad(lambda v: jnp.sum(lp_fn(v)))(vT)
print(
    "1e10 jump: lp finite:", bool(jnp.all(jnp.isfinite(lp_big))),
    " grad finite:", bool(jnp.all(jnp.isfinite(gr_big))),
)
assert bool(jnp.all(jnp.isfinite(gr_big)))

# 5. Model.sample(kernel='auto') — fused value-and-grad leapfrog on chip
t0 = time.time()
samples, state, stats = m.sample(
    jax.random.PRNGKey(2), n_chains=8, n_warmup=150, n_samples=150
)
jax.block_until_ready(samples)
names = list(samples.keys()) if isinstance(samples, dict) else "arr"
mu_s = samples["mu"] if isinstance(samples, dict) else samples
print(
    f"Model.sample(auto): {time.time()-t0:.0f}s  keys={names} "
    f"mu mean={float(jnp.mean(mu_s)):+.3f} sd={float(jnp.std(mu_s)):.3f} "
    f"div={int(jnp.sum(stats.diverging))}"
)
assert abs(float(jnp.mean(mu_s))) < 0.25
assert abs(float(jnp.std(mu_s)) - 1.0) < 0.25

# 6. resume_sampling: bit-identical continuation (on chip)
lp = lambda v: -0.5 * jnp.sum(v * v, axis=-1)
q0 = jax.random.normal(jax.random.PRNGKey(3), (4, 3))
s_full, _, _ = warmup_and_sample(
    lp, jax.random.PRNGKey(4), q0, n_warmup=30, n_samples=20, max_depth=4
)
_, st_half, _ = warmup_and_sample(
    lp, jax.random.PRNGKey(4), q0, n_warmup=30, n_samples=10, max_depth=4
)
s_resumed, _, _ = resume_sampling(lp, st_half, 10, max_depth=4)
same = bool(jnp.all(s_full[10:] == s_resumed))
print("resume bit-identical on chip:", same)
assert same

# 7. generic-traced model on chip (the r3 crash class): JohnsonSU value+grad
mj = Model(
    priors=dists.NamedProduct.of(
        a=dists.JohnsonSU(0.1, 1.2, 0.3, 1.5), b_=dists.Normal(0.0, 1.0)
    )
)
lpj = mj.batched_logdensity_t_fn()
vj = jax.random.normal(jax.random.PRNGKey(5), (mj.dim(), 256))
lj = lpj(vj)
gj = jax.grad(lambda v: jnp.sum(lpj(v)))(vj)
print(
    "JohnsonSU traced model: lp finite:", bool(jnp.all(jnp.isfinite(lj))),
    " grad finite:", bool(jnp.all(jnp.isfinite(gj))),
)
assert bool(jnp.all(jnp.isfinite(gj)))

# 8. transformed(dist).logpdf jitted over 2e5 points
td = tb.transformed(dists.Gamma(2.0, 3.0), tb.Invert(tb.Exp()))
pts = jax.random.normal(jax.random.PRNGKey(6), (200_000,))
lpt = jax.jit(td.logpdf)(pts)
print("transformed logpdf finite:", bool(jnp.all(jnp.isfinite(lpt))))
assert bool(jnp.all(jnp.isfinite(lpt)))

# 9. error path: simplex forward with wrong shape
try:
    tb.SimplexBijector().forward(jnp.ones(1))
    print("ERROR PATH FAILED: no exception")
    raise SystemExit(1)
except Exception as e:
    print(f"simplex wrong-shape raises: {type(e).__name__}")

print("VERIFY r04: ALL OK")
