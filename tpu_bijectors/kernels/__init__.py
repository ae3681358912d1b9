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
