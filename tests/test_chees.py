"""ChEES-HMC: trajectory-length adaptation (must stretch to the widest
scale), lockstep-batch moment correctness, batch-capable density path, and
Halton jitter properties."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_bijectors import dists
from tpu_bijectors.infer import Model, run_chees
from tpu_bijectors.infer.chees import _halton2


def test_halton_low_discrepancy():
    u = np.asarray(jax.vmap(_halton2)(jnp.arange(256)))
    assert np.all((u > 0) & (u < 1))
    # van der Corput base 2: any 2^k-length prefix is perfectly stratified
    for k, width in [(0, 0.5), (1, 0.25), (2, 0.125)]:
        counts, _ = np.histogram(u[:64], bins=int(1 / width), range=(0, 1))
        assert counts.max() == counts.min()


def test_chees_adapts_trajectory_to_widest_scale(key):
    """N(0, diag(1, 100)): the optimal trajectory is O(largest sd), an
    order of magnitude beyond the step size — ChEES must find it and the
    moments must come out right."""
    sd = jnp.asarray([1.0, 10.0], jnp.float64)
    logp = lambda v: -0.5 * jnp.sum((v / sd) ** 2, -1)
    logp.batch_capable = True
    q0 = jax.random.normal(jax.random.PRNGKey(1), (32, 2), jnp.float64)
    samples, state, stats = jax.jit(
        lambda k, q: run_chees(logp, k, q, n_warmup=700, n_samples=700)
    )(key, q0)
    t_final = float(jnp.exp(state.log_t))
    eps = float(state.eps)
    assert t_final > 5.0 * eps, (t_final, eps)
    x = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(x.mean(0), 0.0, atol=0.35)
    np.testing.assert_allclose(x.std(0), np.asarray(sd), rtol=0.12)
    # the adapted mass matrix should absorb the scale difference
    inv_mass = np.asarray(state.inv_mass)
    assert inv_mass[1] / inv_mass[0] > 10.0


def test_chees_correlated_gaussian_moments(key):
    rho = 0.9
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float64)
    prec = jnp.linalg.inv(cov)
    logp = lambda v: -0.5 * v @ prec @ v
    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (16, 2), jnp.float64)
    samples, state, stats = jax.jit(
        lambda k, q: run_chees(logp, k, q, n_warmup=600, n_samples=1000)
    )(key, q0)
    x = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(x.T), np.asarray(cov), atol=0.12)
    acc = float(np.asarray(stats.accept_prob).mean())
    assert 0.4 < acc < 0.95
    # every chain ran the same (lockstep) number of steps per iteration
    assert stats.n_steps.ndim == 1


def test_chees_divergence_does_not_poison_adaptation(key):
    """Early-warmup blowups (eps 500x too large for a stiff target) must
    not NaN the Adam trajectory moments: 0 * inf in the ChEES gradient is
    masked, divergences are reported, and adaptation recovers."""
    sd = 0.01
    logp = lambda v: -0.5 * jnp.sum((v / sd) ** 2, -1)
    logp.batch_capable = True
    q0 = jax.random.normal(jax.random.PRNGKey(8), (8, 2), jnp.float64)
    # (a) nearly no warmup: sampling still blows up -> divergences REPORTED
    _, state_a, stats_a = jax.jit(
        lambda k, q: run_chees(logp, k, q, n_warmup=5, n_samples=50, eps0=5.0)
    )(key, q0)
    assert bool(np.asarray(stats_a.diverging).any())
    for leaf in (state_a.log_t, state_a.adam_m, state_a.adam_v):
        assert np.all(np.isfinite(np.asarray(leaf))), leaf
    # (b) full warmup: adaptation RECOVERS from the early-blowup regime
    samples, state, stats = jax.jit(
        lambda k, q: run_chees(
            logp, k, q, n_warmup=400, n_samples=200, eps0=5.0
        )
    )(key, q0)
    for leaf in (state.log_t, state.eps, state.adam_m, state.adam_v):
        assert np.all(np.isfinite(np.asarray(leaf))), leaf
    # recovery: the Welford mass absorbed the 0.01 scale (eps itself
    # returns to O(1) in the preconditioned space)
    assert np.asarray(state.inv_mass).max() < 1e-2
    x = np.asarray(samples).reshape(-1, 2)
    assert np.all(np.isfinite(x))
    np.testing.assert_allclose(x.std(0), sd, rtol=0.3)


def test_chees_dense_metric(key):
    """metric='dense' on a rho=0.95 Gaussian: the adapted dense inverse
    mass recovers the covariance and moments stay exact."""
    rho = 0.95
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float64)
    prec = jnp.linalg.inv(cov)
    logp = lambda v: -0.5 * jnp.einsum("...i,ij,...j->...", v, prec, v)
    logp.batch_capable = True
    q0 = 0.3 * jax.random.normal(jax.random.PRNGKey(6), (16, 2), jnp.float64)
    samples, state, stats = jax.jit(
        lambda k, q: run_chees(
            logp, k, q, n_warmup=600, n_samples=800, metric="dense"
        )
    )(key, q0)
    assert state.inv_mass.shape == (2, 2)
    np.testing.assert_allclose(
        np.asarray(state.inv_mass), np.asarray(cov), atol=0.25
    )
    x = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(x.T), np.asarray(cov), atol=0.12)


def test_chees_chain_parallel(key):
    """Sharded over the 8-device mesh: shared scalar trajectory schedule
    keeps devices lockstep; moments still correct."""
    from tpu_bijectors.shard import chain_parallel_chees, make_mesh, shard_chains

    mesh = make_mesh("chain")
    mu = jnp.asarray([1.0, -1.0], jnp.float64)
    logp = lambda v: -0.5 * jnp.sum((v - mu) ** 2, -1)
    logp.batch_capable = True
    q0 = shard_chains(mesh, jax.random.normal(jax.random.PRNGKey(4), (16, 2), jnp.float64))
    samples, state, stats = chain_parallel_chees(
        logp, mesh, key, q0, n_warmup=400, n_samples=500
    )
    x = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(x.mean(0), np.asarray(mu), atol=0.12)
    np.testing.assert_allclose(x.var(0), 1.0, atol=0.25)
    assert np.ndim(np.asarray(state.eps)) == 0  # shared adaptation


def test_chees_constrained_model(key):
    """Beta-Binomial through the vectorize layer: conjugate posterior mean —
    both the raw engine and the Model.sample(kernel='chees') one-call."""
    a, b, n_trials, heads = 2.0, 2.0, 50, 17
    m = Model(
        priors=dists.NamedProduct.of(p=dists.Beta(a, b)),
        loglik=lambda x: heads * jnp.log(x["p"])
        + (n_trials - heads) * jnp.log1p(-x["p"]),
    )
    q0 = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (16, 1), jnp.float64)
    samples, _, _ = jax.jit(
        lambda k, q: run_chees(
            m.batched_logdensity_fn(), k, q, n_warmup=500, n_samples=800
        )
    )(key, q0)
    p = np.asarray(m.constrain(samples.reshape(-1, 1))["p"]).ravel()
    a_post, b_post = a + heads, b + n_trials - heads
    np.testing.assert_allclose(p.mean(), a_post / (a_post + b_post), atol=0.02)

    s2, _, _ = m.sample(
        jax.random.PRNGKey(7), n_chains=16, n_warmup=400, n_samples=600,
        kernel="chees",
    )
    p2 = np.asarray(s2["p"]).ravel()
    np.testing.assert_allclose(p2.mean(), a_post / (a_post + b_post), atol=0.02)


def test_neutra_with_chees_kernel(key):
    """neutra_sample(kernel='chees'): flow-whitened space + lockstep
    trajectories; prior-only model moments."""
    from tpu_bijectors.infer import neutra_sample

    m = Model(priors=dists.NamedProduct.of(mu=dists.Normal(1.0, 2.0)))
    samples, res, stats = neutra_sample(
        m, key, n_chains=8, n_warmup=300, n_samples=500, kernel="chees",
        fit_kwargs=dict(n_steps=300, n_mc=32, n_layers=2, hidden=8),
    )
    mu = np.asarray(samples["mu"]).ravel()
    assert abs(mu.mean() - 1.0) < 0.2 and abs(mu.std() - 2.0) < 0.25
