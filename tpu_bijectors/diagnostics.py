"""Observability & diagnostics (SURVEY.md §5).

The reference's only debug channel is the DEBUG_BIJECTORS env flag + _clamp
logging (src/Bijectors.jl:88-100). Here:

  * `nan_check(x, name)`: jax.debug-based NaN/Inf check, active only when
    DEBUG_TPU_BIJECTORS is set — zero cost otherwise (trace-time no-op);
  * `profile_trace(dir)`: context manager around jax.profiler for TPU traces;
  * `benchmark(fn, *args)`: wall-clock timing with block_until_ready;
  * MCMC quality metrics: split-R-hat and bulk effective sample size
    (rank-normalized, Vehtari et al. 2021) — cross-chain psum-able.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from .utils import DEBUG


def nan_check(x, name: str = "value"):
    """Assert finiteness under the debug flag; identity otherwise."""
    if not DEBUG:
        return x

    def _cb(v):
        bad = np.sum(~np.isfinite(np.asarray(v)))
        if bad:
            print(f"[tpu_bijectors DEBUG] {name}: {bad} non-finite elements")

    jax.debug.callback(_cb, x)
    return x


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/tpu_bijectors_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, n_iter: int = 50, warmup: int = 3, **kwargs):
    """Median wall-clock seconds per call (compiled, device-synced)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


# ---------------------------------------------------------------------------
# MCMC diagnostics
# ---------------------------------------------------------------------------


def split_rhat(samples):
    """Split-R-hat. samples: (draws, chains, ...) -> R-hat per parameter."""
    n, m = samples.shape[0], samples.shape[1]
    half = n // 2
    x = jnp.concatenate(
        [samples[:half], samples[half : 2 * half]], axis=1
    )  # (half, 2m, ...)
    nn, mm = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=0)
    chain_var = jnp.var(x, axis=0, ddof=1)
    between = nn * jnp.var(chain_mean, axis=0, ddof=1)
    within = jnp.mean(chain_var, axis=0)
    est = (nn - 1) / nn * within + between / nn
    return jnp.sqrt(est / within)


def ess_bulk(samples):
    """Bulk ESS via Geyer initial monotone sequence on rank-normalized draws.

    samples: (draws, chains, ...) -> ESS per parameter. Computed on host
    (numpy) — a diagnostic, not a hot path.
    """
    x = np.asarray(samples)
    n, m = x.shape[0], x.shape[1]
    flat_shape = x.shape[2:]
    x = x.reshape(n, m, -1)
    out = np.empty(x.shape[-1])
    for j in range(x.shape[-1]):
        out[j] = _ess_1d(_rank_normalize(x[:, :, j]))
    return out.reshape(flat_shape) if flat_shape else float(out[0])


def ess_tail(samples):
    """Tail ESS (Vehtari et al. 2021): the smaller of the ESS of the 5% and
    95% quantile indicator functions — the resolution available for tail
    quantities, which bulk ESS overstates on heavy-tailed chains.

    samples: (draws, chains, ...) -> tail ESS per parameter (host numpy)."""
    x = np.asarray(samples)
    n, m = x.shape[0], x.shape[1]
    flat_shape = x.shape[2:]
    x = x.reshape(n, m, -1)
    out = np.empty(x.shape[-1])
    for j in range(x.shape[-1]):
        col = x[:, :, j]
        vals = []
        for q in (0.05, 0.95):
            ind = (col <= np.quantile(col, q)).astype(np.float64)
            vals.append(_ess_1d(_rank_normalize(ind)))
        out[j] = min(vals)
    return out.reshape(flat_shape) if flat_shape else float(out[0])


def rhat(samples):
    """Rank-normalized folded split-R-hat (Vehtari et al. 2021): the max of
    split-R-hat on rank-normalized draws (location differences) and on
    rank-normalized |x - median| (scale differences — a chain with the
    right mean but wrong variance fails this one).

    samples: (draws, chains, ...) -> R-hat per parameter (host numpy)."""
    x = np.asarray(samples)
    n, m = x.shape[0], x.shape[1]
    flat_shape = x.shape[2:]
    x = x.reshape(n, m, -1)
    out = np.empty(x.shape[-1])
    for j in range(x.shape[-1]):
        col = x[:, :, j]
        z = _rank_normalize(col)
        zf = _rank_normalize(np.abs(col - np.median(col)))
        out[j] = max(
            float(split_rhat(jnp.asarray(z[:, :, None]))[0]),
            float(split_rhat(jnp.asarray(zf[:, :, None]))[0]),
        )
    return out.reshape(flat_shape) if flat_shape else float(out[0])


def mcse_mean(samples):
    """Monte-Carlo standard error of the posterior mean: sd / sqrt(ess_bulk).

    samples: (draws, chains, ...) -> MCSE per parameter (host numpy)."""
    x = np.asarray(samples)
    sd = x.reshape(x.shape[0] * x.shape[1], -1).std(0, ddof=1)
    ess = np.asarray(ess_bulk(x)).reshape(-1)
    out = sd / np.sqrt(np.maximum(ess, 1.0))
    return out.reshape(x.shape[2:]) if x.ndim > 2 else float(out[0])


def _rank_normalize(x):
    from scipy.stats import norm

    n, m = x.shape
    # average ranks for ties (indicator columns are almost all ties —
    # ordinal ranks would fabricate within-tie variation)
    from scipy.stats import rankdata

    r = rankdata(x, axis=None).reshape(x.shape)
    u = (r - 0.375) / (n * m + 0.25)
    return norm.ppf(u)


def _ess_1d(x):
    """Multi-chain ESS (Vehtari et al. 2021 / Stan). x: (draws, chains)."""
    n, m = x.shape
    chain_means = x.mean(axis=0)
    xc = x - chain_means
    # per-chain autocovariance via FFT
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, nfft, axis=0)
    acov = np.fft.irfft(f * np.conj(f), nfft, axis=0)[:n].real / n  # (n, m)
    W = float((acov[0] * n / (n - 1.0)).mean())  # mean within-chain variance
    B_over_n = float(chain_means.var(ddof=1)) if m > 1 else 0.0
    var_plus = W * (n - 1.0) / n + B_over_n
    if var_plus <= 0:
        return float(n * m)
    rho = 1.0 - (W - acov.mean(axis=1)) / var_plus  # rho[t], t = 0..n-1
    # Geyer: Gamma_k = rho_{2k} + rho_{2k+1}; truncate at first negative pair,
    # enforce monotone non-increasing; tau = 2 * sum(Gamma) - 1.
    gamma_sum = 0.0
    prev = np.inf
    k = 0
    while 2 * k + 1 < n:
        g = rho[2 * k] + rho[2 * k + 1]
        if g < 0:
            break
        g = min(g, prev)
        prev = g
        gamma_sum += g
        k += 1
    tau = max(2.0 * gamma_sum - 1.0, 1.0 / np.log10(n * m + 10.0))
    return float(n * m / tau)


def summarize(samples, quantiles=(0.05, 0.5, 0.95)):
    """Per-parameter posterior summary of a constrained sample pytree.

    `samples`: what `Model.sample` returns — a pytree whose leaves have
    leading (draws, chains) axes (trailing event axes allowed) — or a bare
    array. Returns {parameter path: {"mean", "sd", "q5"/"q50"/..., "rhat",
    "ess_bulk"}} with one numpy entry per event coordinate. Host-side
    numpy (a diagnostic, not a hot path)."""
    leaves = jax.tree_util.tree_flatten_with_path(samples)[0]
    out = {}
    for path, leaf in leaves:
        x = np.asarray(leaf)
        if x.ndim < 2:
            raise ValueError(
                "summarize expects (draws, chains, ...) leaves; got shape "
                f"{x.shape}"
            )
        name = "".join(str(p) for p in path) or "value"
        flat = x.reshape(x.shape[0] * x.shape[1], -1)
        stats = {
            "mean": flat.mean(0).reshape(x.shape[2:]),
            "sd": flat.std(0, ddof=1).reshape(x.shape[2:]),
        }
        for q in quantiles:
            stats[f"q{int(round(q * 100))}"] = np.quantile(
                flat, q, axis=0
            ).reshape(x.shape[2:])
        stats["rhat"] = np.asarray(rhat(x))
        ess = np.asarray(ess_bulk(x))
        stats["ess_bulk"] = ess
        stats["ess_tail"] = np.asarray(ess_tail(x))
        # mcse = sd / sqrt(ess) from the ess already computed (ess_bulk is
        # a per-coordinate Geyer fit — the expensive host-side loop)
        stats["mcse"] = stats["sd"] / np.sqrt(np.maximum(ess, 1.0))
        out[name] = stats
    return out


def summary_table(samples, quantiles=(0.05, 0.5, 0.95)) -> str:
    """`summarize` rendered as a fixed-width text table (one row per event
    coordinate, numpy-style flattened index labels)."""
    s = summarize(samples, quantiles)
    cols = ["mean", "sd"] + [f"q{int(round(q * 100))}" for q in quantiles] + [
        "rhat", "ess_bulk", "ess_tail", "mcse",
    ]
    rows = []
    for name, stats in s.items():
        shape = np.shape(stats["mean"])
        for idx in np.ndindex(shape or (1,)):
            label = name + (
                "[" + ",".join(map(str, idx)) + "]" if shape else ""
            )
            vals = [
                float(np.asarray(stats[c])[idx] if shape else stats[c])
                for c in cols
            ]
            rows.append((label, vals))
    w = max((len(r[0]) for r in rows), default=5)
    head = " ".join([f"{'':<{w}}"] + [f"{c:>9}" for c in cols])
    lines = [head]
    for label, vals in rows:
        lines.append(
            " ".join([f"{label:<{w}}"] + [f"{v:9.3g}" for v in vals])
        )
    return "\n".join(lines)
