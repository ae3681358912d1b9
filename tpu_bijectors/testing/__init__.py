from .harness import (
    assert_bijector_ok,
    check_logdet_against_jacobian,
    random_unconstrained,
)
from .oracles import simplex_invlink_jacobian, simplex_link_jacobian
from .sweep import test_all
