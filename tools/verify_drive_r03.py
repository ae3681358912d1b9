import math, time, sys, os
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import jax, jax.numpy as jnp
import numpy as np
import tpu_bijectors as tb
from tpu_bijectors import dists

t0=time.time()
print("devices:", jax.devices(), flush=True)

# 1. golden value
g1 = float(tb.logpdf_with_trans(dists.LogNormal(), jnp.asarray(math.e), True))
print("golden logpdf_with_trans(LogNormal, e, True) = %.6f (expect ~-1.41894)" % g1, flush=True)
assert abs(g1 - (-1.4189385)) < 1e-4

# 2. registry round-trip, batched jitted
d = dists.Dirichlet(jnp.ones(8)); b = tb.bijector(d)
x = d.sample(jax.random.PRNGKey(0), (4096,))
y, ld = jax.jit(b.forward_and_log_det)(x)
rt = float(jnp.max(jnp.abs(jax.jit(b.inverse)(y) - x)))
print("dirichlet roundtrip max err:", rt, flush=True); assert rt < 1e-4

# 3. QUANTILE GRADS on TPU f32 (this round's fix)
dg = dists.Gamma(2.0, 3.0)
qb = tb.QuantileBijector(dg)
grad = jax.jit(jax.vmap(jax.grad(qb.forward)))(jnp.asarray([0.1, 0.3, 0.5, 0.9]))
xq = jax.jit(jax.vmap(qb.forward))(jnp.asarray([0.1, 0.3, 0.5, 0.9]))
true = 1.0 / jnp.exp(dg.logpdf(xq))
rel = float(jnp.max(jnp.abs(grad - true) / true))
print("TPU quantile grad vs 1/pdf rel err:", rel, "grad[1]=%.4f (0.0 before fix)" % float(grad[1]), flush=True)
assert rel < 1e-3 and float(grad[1]) > 0.5
# param grad via betainc FD fallback on chip
gb = float(jax.jit(jax.grad(lambda a: dists.Beta(a, 5.0).quantile(0.4)))(2.0))
print("TPU Beta dq/da:", gb, flush=True); assert 0.05 < gb < 0.2

# closed-form quantile sweep on chip
for dd in [dists.Laplace(0.3,1.7), dists.Rayleigh(2.1), dists.HalfNormal(1.4),
           dists.Levy(0.5,2.0), dists.GeneralizedPareto(0.1,1.2,0.3)]:
    qs = jnp.asarray([0.1,0.5,0.9])
    err = float(jnp.max(jnp.abs(dd.cdf(dd.quantile(qs)) - qs)))
    assert err < 1e-4, (type(dd).__name__, err)
print("closed-form quantiles cdf-roundtrip OK on chip", flush=True)

# 4. MEGA KERNEL (split modules + block transcendentals) on real TPU
from tpu_bijectors.vectorize import unconstrain
from tpu_bijectors.vectorize.fused_kernel import _mega_diffable, _plan
from tpu_bijectors.utils import _eps
priors = dists.NamedProduct.of(
    mu=dists.IIDProduct(dists.Normal(0.0, 2.0), 8),
    sigma=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 8),
    w=dists.Dirichlet(jnp.ones(16)),
    corr=dists.LKJ(16, 2.0),
)
u = unconstrain(priors)
assert _plan(u, _eps(jnp.float32)) is not None
Bk = 2048
vT = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (u.linked_vec_length, Bk))
lp_k = jax.jit(lambda v: _mega_diffable(u, v))(vT)
lp_c = jax.jit(lambda v: u._linked_logdensity_t_children(v))(vT)
relk = float(jnp.max(jnp.abs(lp_k - lp_c) / jnp.abs(lp_c)))
print("mega vs composed ON CHIP (B=%d): rel %.2e" % (Bk, relk), flush=True)
assert relk < 5e-6
# grad path: fused JVP/transpose kernels. Both sides are f32 Pallas paths
# with different (mathematically equal) formulations; f64-arbitrated CPU
# oracle puts mega at rms 2.6e-5 / max 1.5e-4 abs (simplex; composed is
# 2.1e-6) and 30x MORE accurate than composed for LKJ — compare on an
# absolute scale, not rel with a 1e-3 floor.
gk = jax.jit(jax.grad(lambda v: jnp.sum(_mega_diffable(u, v))))(vT)
gc = jax.jit(jax.grad(lambda v: jnp.sum(u._linked_logdensity_t_children(v))))(vT)
gscale = float(jnp.max(jnp.abs(gc)))
absg = float(jnp.max(jnp.abs(gk - gc)))
print("mega grad vs composed ON CHIP: maxabs %.2e (grad scale %.1f)" % (absg, gscale), flush=True)
assert absg < 2e-3 * max(1.0, gscale)

# also a PD (Wishart) model incl. the block-exp path
priors2 = dists.NamedProduct.of(W=dists.Wishart(18.0, jnp.eye(16)), m=dists.Normal(0.0,1.0))
u2 = unconstrain(priors2)
v2 = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (u2.linked_vec_length, Bk))
lw_k = jax.jit(lambda v: _mega_diffable(u2, v))(v2)
lw_c = jax.jit(lambda v: u2._linked_logdensity_t_children(v))(v2)
relw = float(jnp.max(jnp.abs(lw_k - lw_c) / jnp.abs(lw_c)))
gw_k = jax.jit(jax.grad(lambda v: jnp.sum(_mega_diffable(u2, v))))(v2)
gw_c = jax.jit(jax.grad(lambda v: jnp.sum(u2._linked_logdensity_t_children(v))))(v2)
wscale = float(jnp.max(jnp.abs(gw_c)))
abswg = float(jnp.max(jnp.abs(gw_k - gw_c)))
print("wishart mega value rel %.2e grad maxabs %.2e (scale %.1f) ON CHIP" % (relw, abswg, wscale), flush=True)
assert relw < 5e-6 and abswg < 2e-3 * max(1.0, wscale)

# 5. 1e10-jump robustness on the LINKED path (value + grad), kernel and composed
vx = vT.at[:, 0].set(1e10).at[:, 1].set(-1e10)
lx = jax.jit(lambda v: _mega_diffable(u, v))(vx)
fin_v = bool(jnp.all(jnp.isfinite(lx)))
gx = jax.jit(jax.grad(lambda v: jnp.sum(_mega_diffable(u, v))))(vx)
fin_g = bool(jnp.all(jnp.isfinite(gx)))
print("1e10 jump finite:", fin_v, "grad finite:", fin_g, flush=True)
assert fin_v and fin_g

# 6. short batched NUTS over the quantile-linked prior (mixing = nonzero grads)
from tpu_bijectors.infer import Model
prior_q = dists.NamedProduct.of(theta=tb.transformed(dists.Uniform(0.0, 1.0), tb.QuantileBijector(dists.Gamma(2.0, 3.0))))
model = Model(prior_q)
samples, _, _ = model.sample(jax.random.PRNGKey(3), n_chains=8, n_warmup=150, n_samples=200, kernel="nuts_batched")
th = np.asarray(samples["theta"]).reshape(-1)
ref = np.asarray(dists.Gamma(2.0, 3.0).sample(jax.random.PRNGKey(4), (4000,)))
print("quantile-linked NUTS: mean %.4f (ref %.4f) std %.4f (ref %.4f)" % (th.mean(), ref.mean(), th.std(), ref.std()), flush=True)
assert np.isfinite(th).all() and th.std() > 0.3 * ref.std()
assert abs(th.mean() - ref.mean()) < 6.0 * ref.std() / np.sqrt(160.0)

print("ALL VERIFY DRIVES PASSED in %.0fs" % (time.time() - t0), flush=True)
