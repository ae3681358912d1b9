"""Bijector library (reference: /root/reference/src/bijectors/)."""

from .base import (
    Bijector,
    Block,
    Chain,
    Identity,
    Invert,
    Transform,
    elementwise,
    inverse,
)
from .corr import CorrBijector, VecCholeskyBijector, VecCorrBijector
from .linear import LinearMap, TriangularLinearMap
from .ordered import OrderedBijector
from .pd import CholeskyVecBijector, PDBijector, PDVecBijector
from .scalar import (
    Exp,
    LeakyReLU,
    Log,
    Logit,
    Scale,
    Shift,
    SignFlip,
    Softplus,
    Truncated,
)
from .simplex import SimplexBijector
