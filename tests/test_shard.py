"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4:
collective tests without TPUs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_bijectors as tb
from tpu_bijectors import dists
from tpu_bijectors.infer import Model, init_sampler, warmup_and_sample
from tpu_bijectors.shard import (
    chain_parallel_nuts,
    chain_parallel_resume,
    chain_parallel_smc,
    load_sampler_state,
    make_mesh,
    save_sampler_state,
    shard_chains,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    return make_mesh("chain")


def test_chain_parallel_nuts_gaussian(mesh, key):
    dim = 4
    mu = jnp.asarray([1.0, -1.0, 0.5, 2.0])
    logp = lambda v: -0.5 * jnp.sum((v - mu) ** 2)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (16, dim))  # 2 chains/device
    q0 = shard_chains(mesh, q0)
    samples, state, stats = chain_parallel_nuts(
        logp, mesh, key, q0, n_warmup=300, n_samples=400
    )
    s = np.asarray(samples).reshape(-1, dim)
    np.testing.assert_allclose(s.mean(0), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(s.var(0), 1.0, atol=0.2)
    # adaptation state is shared: eps identical across devices by construction
    assert np.ndim(np.asarray(state.eps)) == 0


def test_chain_parallel_matches_single_device_statistically(mesh, key):
    """Same model sharded vs unsharded gives the same posterior (different
    rng streams, so compare moments)."""
    model = Model(
        priors=dists.NamedProduct.of(w=dists.Dirichlet(jnp.asarray([2.0, 3.0, 4.0]))),
        loglik=None,
    )
    logp = model.logdensity_fn()
    q0 = model.init_positions(jax.random.PRNGKey(3), 16, scale=0.5)
    samples_sharded, _, _ = chain_parallel_nuts(
        logp, mesh, key, shard_chains(mesh, q0), n_warmup=300, n_samples=400
    )
    samples_local, _, _ = jax.jit(
        lambda k, q: warmup_and_sample(logp, k, q, n_warmup=300, n_samples=400)
    )(jax.random.PRNGKey(4), q0)
    w_sh = np.asarray(model.constrain(jnp.reshape(samples_sharded, (-1, 2)))["w"])
    w_lo = np.asarray(model.constrain(jnp.reshape(samples_local, (-1, 2)))["w"])
    np.testing.assert_allclose(w_sh.mean(0), w_lo.mean(0), atol=0.03)
    np.testing.assert_allclose(w_sh.mean(0), [2 / 9, 3 / 9, 4 / 9], atol=0.03)


def test_chain_parallel_advi_matches_unsharded(mesh, key):
    """Sharded ADVI == unsharded ADVI on the SAME key: every device draws
    the identical full MC batch from the replicated per-step key and
    evaluates only its slice; pmean of per-device means reassembles the
    exact same estimator, so the whole (loss, q) trajectory matches the
    single-device fit_advi up to summation order."""
    from tpu_bijectors.infer import Model, fit_advi
    from tpu_bijectors.shard import chain_parallel_advi

    model = Model(
        priors=dists.NamedProduct.of(
            w=dists.Dirichlet(jnp.asarray([2.0, 3.0, 4.0])),
            s=dists.LogNormal(0.0, 0.5),
        ),
        loglik=None,
    )
    logp = model.batched_logdensity_fn()
    dim = model.dim()
    kw = dict(n_steps=200, n_mc=16, learning_rate=2e-2, dtype=jnp.float64)
    res_sh = chain_parallel_advi(logp, mesh, key, dim, **kw)
    res_lo = jax.jit(lambda k: fit_advi(logp, k, dim, **kw))(key)
    np.testing.assert_allclose(
        np.asarray(res_sh.losses), np.asarray(res_lo.losses), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.q.loc), np.asarray(res_lo.q.loc), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res_sh.q.log_scale), np.asarray(res_lo.q.log_scale), atol=1e-8
    )


def test_chain_parallel_advi_estimators_and_families(mesh, key):
    """The sharded path composes with every fit_advi family/estimator the
    single-device path supports: full-rank + STL, and flow + IWELBO; the
    fitted posterior is correct (conjugate Gaussian check)."""
    from tpu_bijectors.infer import fit_advi
    from tpu_bijectors.infer.advi import FullRankGaussian
    from tpu_bijectors.shard import chain_parallel_advi

    mu = jnp.asarray([1.0, -0.5], jnp.float64)
    logp = lambda v: -0.5 * jnp.sum((v - mu) ** 2, -1)
    logp.batch_capable = True
    kw = dict(
        n_steps=600, n_mc=16, learning_rate=2e-2, dtype=jnp.float64,
        q=FullRankGaussian.init(2, jnp.float64), estimator="stl",
    )
    res_sh = chain_parallel_advi(logp, mesh, key, 2, **kw)
    res_lo = jax.jit(lambda k: fit_advi(logp, k, 2, **kw))(key)
    np.testing.assert_allclose(np.asarray(res_sh.q.loc), mu, atol=0.05)
    np.testing.assert_allclose(
        np.asarray(res_sh.q.loc), np.asarray(res_lo.q.loc), atol=1e-6
    )

    # iwelbo: groups of n_iw stay whole on one device
    kw = dict(
        n_steps=800, n_mc=16, n_iw=4, learning_rate=2e-2, dtype=jnp.float64,
        estimator="iwelbo",
    )
    res_iw = chain_parallel_advi(logp, mesh, key, 2, **kw)
    res_iw_lo = jax.jit(lambda k: fit_advi(logp, k, 2, **kw))(key)
    np.testing.assert_allclose(
        np.asarray(res_iw.losses), np.asarray(res_iw_lo.losses),
        rtol=1e-7, atol=1e-7,
    )
    # iwelbo's per-step gradient is noisier than the ELBO's (log of an
    # n_iw-average); the strict bar here is trajectory equality above
    np.testing.assert_allclose(np.asarray(res_iw.q.loc), mu, atol=0.15)

    with pytest.raises(ValueError, match="divisible"):
        chain_parallel_advi(logp, mesh, key, 2, n_mc=3)


def test_chain_parallel_smc(mesh, key):
    x_obs, s_lik = 1.0, 0.5
    log_prior = lambda v: -0.5 * jnp.sum(v * v)
    log_lik = lambda v: -0.5 * ((x_obs - v[0]) / s_lik) ** 2
    particles0 = jax.random.normal(key, (2048, 1), jnp.float64)
    parts, log_ev, beta, stages = chain_parallel_smc(
        log_prior, log_lik, mesh, jax.random.PRNGKey(5),
        shard_chains(mesh, particles0), rw_scale=0.5, n_mutations=8,
    )
    post_var = 1.0 / (1.0 + 1.0 / s_lik**2)
    post_mean = post_var * x_obs / s_lik**2
    p = np.asarray(parts[:, 0])
    np.testing.assert_allclose(p.mean(), post_mean, atol=0.06)
    assert float(beta) == 1.0


def test_checkpoint_roundtrip(tmp_path, key):
    logp = lambda v: -0.5 * jnp.sum(v * v)
    q0 = jax.random.normal(key, (4, 3))
    state = init_sampler(logp, key, q0)
    path = str(tmp_path / "ckpt.npz")
    save_sampler_state(path, state)
    loaded = load_sampler_state(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chain_parallel_checkpoint_resume_bitwise(mesh, key, tmp_path):
    """Preemption recovery ON THE MESH: checkpoint the sharded SamplerState
    after part of the run, reload from disk, chain_parallel_resume — the
    continuation is BITWISE identical to the tail of an uninterrupted run
    (valid because the per-step axis-index fold keeps state.key replicated;
    see infer/sampler._fold_axis)."""
    dim = 3
    logp = lambda v: -0.5 * jnp.sum(v * v)
    q0 = shard_chains(mesh, jax.random.normal(jax.random.PRNGKey(5), (16, dim)))
    kw = dict(n_warmup=25, n_samples=8, max_depth=4)
    samples_full, _, _ = chain_parallel_nuts(logp, mesh, key, q0, **kw)
    kw["n_samples"] = 4
    _, state_a, _ = chain_parallel_nuts(logp, mesh, key, q0, **kw)
    path = str(tmp_path / "mesh_ckpt.npz")
    save_sampler_state(path, state_a)
    loaded = load_sampler_state(path, state_a)
    samples_b, state_b, _ = chain_parallel_resume(
        logp, mesh, loaded, 4, max_depth=4
    )
    np.testing.assert_array_equal(
        np.asarray(samples_full[4:]), np.asarray(samples_b)
    )
    assert int(state_b.iteration) == int(25 + 8)


def test_resume_reproduces(key):
    """Deterministic restart: running 2x50 samples from a checkpointed state
    equals running 100 straight (same kernel stream)."""
    from tpu_bijectors.infer.sampler import SamplerState

    logp = lambda v: -0.5 * jnp.sum(v * v)
    q0 = jax.random.normal(jax.random.PRNGKey(7), (2, 3))

    run = jax.jit(
        lambda k, q, n: warmup_and_sample(logp, k, q, n_warmup=50, n_samples=n),
        static_argnums=2,
    )
    samples_full, state_full, _ = run(key, q0, 100)

    samples_a, state_a, _ = run(key, q0, 50)

    # continue from state_a with sampling only
    from tpu_bijectors.infer.hmc import nuts_kernel

    kern = jax.vmap(nuts_kernel(logp), in_axes=(0, 0, 0, 0, None, None))

    def sample_only(state, n):
        def step(s, _):
            k, sub = jax.random.split(s.key)
            keys = jax.random.split(sub, s.q.shape[0])
            q, logp_, grad, info = kern(keys, s.q, s.logp, s.grad, s.eps, s.inv_mass)
            return s._replace(key=k, q=q, logp=logp_, grad=grad), q

        return jax.lax.scan(step, state, None, length=n)

    state_b, samples_b = jax.jit(sample_only, static_argnums=1)(state_a, 50)
    np.testing.assert_allclose(
        np.asarray(samples_full[50:]), np.asarray(samples_b), atol=1e-12
    )


def test_param_parallel_from_linked_matches_unsharded(rng):
    """Parameter-axis sharding (the SP analogue, SURVEY.md §2.2): sharded
    from_linked_vec == unsharded, logdet psum'd once."""
    from tpu_bijectors.shard import (
        make_mesh,
        param_parallel_from_linked,
        param_parallel_logdensity,
        shard_params,
    )
    from tpu_bijectors.vectorize import unconstrain

    d = dists.IIDProduct(dists.Beta(2.0, 3.0), 512)
    u = unconstrain(d)
    mesh = make_mesh("param")
    v = jnp.asarray(rng.standard_normal((4, u.linked_vec_length)))
    v_sh = shard_params(mesh, v)

    fn = jax.jit(param_parallel_from_linked(u, mesh))
    x_sh, ld_sh = fn(v_sh)
    x_ref, ld_ref = u.from_linked_vec(v)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ld_sh), np.asarray(ld_ref), rtol=1e-12)

    logp = jax.jit(param_parallel_logdensity(d, mesh))
    got = logp(v_sh)
    _, ref = u.from_linked_vec_with_logpdf(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)
    # grads flow through the sharded program (the HMC requirement)
    g = jax.jit(jax.grad(lambda v: jnp.sum(logp(v))))(v_sh)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_param_parallel_simplex_blocks(rng):
    """Entangled blocks (IID Dirichlet) shard too: each device owns whole
    simplices; only the scalar density crosses the mesh."""
    from tpu_bijectors.shard import make_mesh, param_parallel_logdensity, shard_params
    from tpu_bijectors.vectorize import unconstrain

    d = dists.IIDProduct(dists.Dirichlet(jnp.ones(5)), 64)
    u = unconstrain(d)
    mesh = make_mesh("param")
    v = jnp.asarray(rng.standard_normal((3, u.linked_vec_length)))
    got = jax.jit(param_parallel_logdensity(u, mesh))(shard_params(mesh, v))
    _, ref = u.from_linked_vec_with_logpdf(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)


def test_chain_parallel_pathfinder_matches_unsharded(mesh, key):
    """Sharded multi-path Pathfinder == unsharded multipath_pathfinder on
    the SAME key: per-path key blocks are the same slice of the same
    split, pools gather in device order (= path order), and the truncated
    importance resampling runs on the identical global weight vector."""
    from tpu_bijectors.infer import multipath_pathfinder
    from tpu_bijectors.shard import chain_parallel_pathfinder

    dim = 3
    mu = jnp.asarray([1.0, -0.5, 0.25])
    logp = lambda v: -0.5 * jnp.sum((v - mu) ** 2)
    v0s = 2.0 * jax.random.normal(jax.random.PRNGKey(11), (16, dim))
    kw = dict(n_draws=256, per_path_draws=64, max_iters=20)
    draws_sh, res_sh = chain_parallel_pathfinder(logp, mesh, key, v0s, **kw)
    draws_lo, res_lo = multipath_pathfinder(logp, key, v0s, **kw)
    np.testing.assert_allclose(
        np.asarray(draws_sh), np.asarray(draws_lo), atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(draws_sh).mean(0), mu, atol=0.2)
    assert res_sh.draws.shape == res_lo.draws.shape
    with pytest.raises(ValueError, match="divisible"):
        chain_parallel_pathfinder(logp, mesh, key, v0s[:3], **kw)


def test_chain_param_2d_mesh_composition(rng):
    """The 2-D ('chain', 'param') mesh the docs describe: chains sharded on
    one axis, the heterogeneous parameter axis on the other — one psum
    over 'param' inside, chain rows independent."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpu_bijectors.shard import param_parallel_logdensity
    from tpu_bijectors.vectorize import unconstrain

    d = dists.NamedProduct.of(
        w=dists.Dirichlet(jnp.ones(5)),
        s=dists.IIDProduct(dists.LogNormal(), 3),
        c=dists.LKJ(3, 2.0),
    )
    u = unconstrain(d)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("chain", "param"))
    fn = param_parallel_logdensity(
        u, mesh, axis_name="param", batch_axis_name="chain"
    )
    layout = fn.layout
    assert layout.n_dev == 4
    v = jnp.asarray(rng.standard_normal((8, u.linked_vec_length)))
    vp = layout.pack(v)
    vp = jax.device_put(vp, NamedSharding(mesh, P("chain", "param")))
    got = jax.jit(fn)(vp)
    ref = u.linked_logdensity(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)


def test_param_parallel_heterogeneous_tree(rng):
    """Heterogeneous param-axis sharding (SURVEY.md §2.2 SP row: 'shard the
    unconstrained vector + Stacked block ranges'): a mixed model — scalars
    + IID positives + a Dirichlet + an LKJ — sharded on a 'param' mesh
    matches the unsharded linked_logdensity to f64 tolerance, with whole
    entangled blocks device-local and grads flowing through the switch."""
    from tpu_bijectors.shard import (
        make_mesh,
        param_parallel_logdensity,
        shard_params,
    )
    from tpu_bijectors.vectorize import unconstrain

    d = dists.NamedProduct.of(
        mu=dists.Normal(0.0, 2.0),
        scales=dists.IIDProduct(dists.LogNormal(0.0, 0.5), 7),
        w=dists.Dirichlet(jnp.ones(5)),
        corr=dists.LKJ(4, 2.0),
        b=dists.Beta(2.0, 3.0),
    )
    u = unconstrain(d)
    mesh = make_mesh("param")
    fn = param_parallel_logdensity(u, mesh)
    layout = fn.layout
    # every child assigned exactly once, order preserved
    flat = [c for owned in layout.assign for c in owned]
    assert flat == list(range(len(u.children)))
    assert layout.packed_dim == 8 * layout.seg_len

    v = jnp.asarray(rng.standard_normal((3, u.linked_vec_length)))
    vp = shard_params(mesh, layout.pack(v))
    got = jax.jit(fn)(vp)
    ref = u.linked_logdensity(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)

    # 1-D (single state) and gradient flow (the HMC requirement)
    v1 = v[0]
    got1 = jax.jit(fn)(shard_params(mesh, layout.pack(v1)))
    np.testing.assert_allclose(float(got1), float(ref[0]), rtol=1e-10)
    g = jax.jit(jax.grad(lambda vv: jnp.sum(fn(vv))))(shard_params(mesh, layout.pack(v)))
    assert bool(jnp.all(jnp.isfinite(g)))
    # padding slots receive zero gradient (they feed nothing)
    gp = np.asarray(g).reshape(3, 8, layout.seg_len)
    for i, owned in enumerate(layout.assign):
        used = sum(layout.child_ranges[c][1] for c in owned)
        assert np.all(gp[:, i, used:] == 0.0)


def test_param_parallel_hetero_fewer_children_than_devices(rng):
    """More devices than blocks: trailing devices own nothing and contribute
    zero; the density still matches."""
    from tpu_bijectors.shard import (
        make_mesh,
        param_parallel_logdensity,
        shard_params,
    )
    from tpu_bijectors.vectorize import unconstrain

    d = dists.NamedProduct.of(
        w=dists.Dirichlet(jnp.ones(4)), s=dists.LogNormal()
    )
    u = unconstrain(d)
    mesh = make_mesh("param")
    fn = param_parallel_logdensity(d, mesh)
    v = jnp.asarray(rng.standard_normal((2, u.linked_vec_length)))
    got = jax.jit(fn)(shard_params(mesh, fn.layout.pack(v)))
    ref = u.linked_logdensity(v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-10)


def test_chain_parallel_with_batched_kernel(rng):
    """chain_parallel_nuts composes with kernel='nuts_batched': each device's
    chain block evaluates its log-density as one batch inside shard_map."""
    from tpu_bijectors.infer import Model
    from tpu_bijectors.shard import chain_parallel_nuts, make_mesh, shard_chains

    model = Model(
        priors=dists.NamedProduct.of(
            w=dists.Dirichlet(jnp.ones(4)), s=dists.LogNormal()
        ),
        loglik=None,
    )
    mesh = make_mesh("chain")
    n_chains = 4 * mesh.devices.size
    q0 = shard_chains(mesh, model.init_positions(jax.random.PRNGKey(40), n_chains, 0.5))
    samples, state, stats = chain_parallel_nuts(
        model.batched_logdensity_fn(), mesh, jax.random.PRNGKey(41), q0,
        n_warmup=150, n_samples=200, kernel="nuts_batched",
    )
    x = model.constrain(samples.reshape(-1, model.dim()))
    w = np.asarray(x["w"])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(w.mean(0), 0.25, atol=0.05)


def test_chain_parallel_with_transposed_kernel(rng):
    """chain_parallel_nuts composes with kernel='nuts_batched_t': each
    device's chain block runs the TRANSPOSED (dim, chains_local) tree inside
    shard_map, so the whole-model fused density/VJP evaluate once per
    leapfrog per device while adaptation stays globally shared."""
    from tpu_bijectors.infer import Model
    from tpu_bijectors.shard import chain_parallel_nuts, make_mesh, shard_chains

    model = Model(
        priors=dists.NamedProduct.of(
            w=dists.Dirichlet(jnp.ones(4)), s=dists.LogNormal()
        ),
        loglik=None,
    )
    mesh = make_mesh("chain")
    n_chains = 4 * mesh.devices.size
    q0 = shard_chains(mesh, model.init_positions(jax.random.PRNGKey(50), n_chains, 0.5))
    samples, state, stats = chain_parallel_nuts(
        model.batched_logdensity_t_fn(), mesh, jax.random.PRNGKey(51), q0,
        n_warmup=150, n_samples=200, kernel="nuts_batched_t",
    )
    assert np.ndim(np.asarray(state.eps)) == 0  # shared adaptation
    x = model.constrain(samples.reshape(-1, model.dim()))
    w = np.asarray(x["w"])
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(w.mean(0), 0.25, atol=0.05)
    s = np.asarray(x["s"])
    np.testing.assert_allclose(np.log(s).mean(), 0.0, atol=0.15)


def test_chain_parallel_smc_batched_density(mesh):
    """chain_parallel_smc evaluates batch-capable densities on whole local
    particle blocks (one fused call per device instead of per-particle vmap)
    and matches the conjugate posterior."""
    from tpu_bijectors.infer import Model

    x_obs, s_lik = 1.0, 0.5
    model = Model(priors=dists.NamedProduct.of(v=dists.Normal()), loglik=None)
    log_prior = model.batched_logdensity_fn()

    def log_lik(v):
        out = -0.5 * ((x_obs - v[..., 0]) / s_lik) ** 2
        return out

    log_lik.batch_capable = True
    particles0 = jax.random.normal(jax.random.PRNGKey(6), (2048, 1), jnp.float64)
    parts, log_ev, beta, stages = chain_parallel_smc(
        log_prior, log_lik, mesh, jax.random.PRNGKey(7),
        shard_chains(mesh, particles0), rw_scale=0.5, n_mutations=8,
    )
    post_var = 1.0 / (1.0 + 1.0 / s_lik**2)
    post_mean = post_var * x_obs / s_lik**2
    p = np.asarray(parts[:, 0])
    np.testing.assert_allclose(p.mean(), post_mean, atol=0.06)
    np.testing.assert_allclose(p.var(), post_var, atol=0.06)
    assert float(beta) == 1.0


def test_chain_parallel_pt_bimodal(mesh, key):
    """Sharded parallel tempering: 8 devices × 4 chains on a bimodal
    target — both modes recovered, swap/step stats identical across
    devices (replicated out-specs would fail otherwise), evidence finite."""
    from tpu_bijectors.shard import chain_parallel_pt

    log_prior = lambda v: -0.5 * jnp.sum((v / 3.0) ** 2)
    log_lik = lambda v: jax.scipy.special.logsumexp(
        jnp.stack(
            [
                -0.5 * jnp.sum(((v - 4.0) / 0.5) ** 2),
                -0.5 * jnp.sum(((v + 4.0) / 0.5) ** 2),
            ]
        )
    ) - jnp.log(2.0)
    q0 = shard_chains(mesh, jnp.full((32, 1), 4.0))
    res = chain_parallel_pt(
        log_prior, log_lik, mesh, key, q0,
        n_temps=6, n_warmup=200, n_samples=400, n_leapfrog=8,
    )
    draws = np.asarray(res.samples).reshape(-1)
    frac_neg = float((draws < 0).mean())
    assert 0.25 < frac_neg < 0.75, frac_neg
    assert res.samples.shape[1] == 32
    assert res.swap_accept.shape == (5,)
    assert np.all(np.isfinite(np.asarray(res.eps)))
    assert np.isfinite(float(res.log_evidence))
