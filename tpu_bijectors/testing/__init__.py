from .harness import (
    assert_bijector_ok,
    check_logdet_against_jacobian,
    random_unconstrained,
)
from .sweep import test_all
