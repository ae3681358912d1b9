"""Trainable normalizing-flow layers (reference: planar_layer.jl,
radial_layer.jl, rational_quadratic_spline.jl, normalise.jl, coupling.jl)."""

from ..bijectors.coupling import Coupling, PartitionMask
from .maf import MaskedAutoregressive, flow_stack, maf_stack
from .nsf import MaskedAutoregressiveSpline, nsf_ar_stack
from .normalise import InvertibleBatchNorm
from .planar import PlanarLayer, find_alpha
from .radial import RadialLayer
from .rqs import RationalQuadraticSpline

__all__ = [
    "PlanarLayer",
    "RadialLayer",
    "RationalQuadraticSpline",
    "InvertibleBatchNorm",
    "Coupling",
    "PartitionMask",
    "find_alpha",
    "MaskedAutoregressive",
    "maf_stack",
    "MaskedAutoregressiveSpline",
    "nsf_ar_stack",
    "flow_stack",
]
