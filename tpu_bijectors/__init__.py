"""tpu_bijectors — a TPU-native probabilistic-transform + inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TuringLang/Bijectors.jl (reference mounted at /root/reference): bijectors with
log-abs-det-Jacobians, a distribution->bijector registry, transformed
distributions, a pytree<->flat-unconstrained-vector API for PPL samplers,
trainable normalizing-flow layers, and chain-parallel NUTS/ADVI/SMC engines
sharded over TPU meshes.

See SURVEY.md for the layer-by-layer correspondence with the reference.
"""

from .bijectors.base import (
    Bijector,
    Block,
    Chain,
    Identity,
    Invert,
    Transform,
    elementwise,
    inverse,
)
from .bijectors.corr import CorrBijector, VecCholeskyBijector, VecCorrBijector
from .bijectors.ordered import OrderedBijector
from .bijectors.pd import CholeskyVecBijector, PDBijector, PDVecBijector
from .bijectors.scalar import (
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
from .bijectors.cdf_quantile import CDFBijector, QuantileBijector
from .bijectors.coupling import Coupling, PartitionMask
from .bijectors.linear import LinearMap, TriangularLinearMap
from .bijectors.product import NamedCoupling, NamedTransform, ProductBijector
from .bijectors.reshape import Permute, Reshape
from .bijectors.simplex import SimplexBijector
from .bijectors.stacked import Stacked
from .compat import (
    columnwise,
    isclosedform,
    isinvertible,
    logabsdetjac,
    logabsdetjacinv,
    output_size,
    transform,
    with_logabsdet_jacobian,
)
from .flows import InvertibleBatchNorm, PlanarLayer, RadialLayer, RationalQuadraticSpline
from .registry import bijector, invlink, link, logpdf_with_trans, register_bijector
from .transformed import OrderedDistribution, TransformedDistribution, ordered, transformed
from .tree import pytree_dataclass
from .vectorize import unconstrain

from . import dists
from . import flows
from . import vectorize
from . import utils

__version__ = "0.1.0"

__all__ = [
    # core
    "Transform",
    "Bijector",
    "Invert",
    "Chain",
    "Block",
    "Identity",
    "inverse",
    "elementwise",
    "pytree_dataclass",
    # classic functional interface (compat.py)
    "transform",
    "with_logabsdet_jacobian",
    "logabsdetjac",
    "logabsdetjacinv",
    "isinvertible",
    "isclosedform",
    "output_size",
    "columnwise",
    # flow layers (top-level like the reference's export list)
    "PlanarLayer",
    "RadialLayer",
    "InvertibleBatchNorm",
    "RationalQuadraticSpline",
    # scalar bijectors
    "Exp",
    "Log",
    "Logit",
    "Shift",
    "Scale",
    "SignFlip",
    "LeakyReLU",
    "Softplus",
    "Truncated",
    # structural bijectors
    "Stacked",
    "ProductBijector",
    "NamedTransform",
    "NamedCoupling",
    "Reshape",
    "Permute",
    "Coupling",
    "PartitionMask",
    "LinearMap",
    "TriangularLinearMap",
    "CDFBijector",
    "QuantileBijector",
    # vector/matrix bijectors
    "SimplexBijector",
    "OrderedBijector",
    "PDBijector",
    "PDVecBijector",
    "CholeskyVecBijector",
    "CorrBijector",
    "VecCorrBijector",
    "VecCholeskyBijector",
    # registry / transformed
    "bijector",
    "link",
    "invlink",
    "logpdf_with_trans",
    "register_bijector",
    "transformed",
    "TransformedDistribution",
    "ordered",
    "OrderedDistribution",
    "unconstrain",
    # modules
    "dists",
    "flows",
    "vectorize",
    "utils",
]
