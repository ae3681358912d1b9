"""Inference engines: NUTS/HMC, ADVI, SMC (net-new layer per SURVEY.md §2.7
and the BASELINE.json north star)."""

from .adapt import (
    StepSizeAdaptState,
    WelfordState,
    build_schedule,
    stepsize_init,
    stepsize_update,
    welford_cov_init,
    welford_cov_update_batch,
    welford_covariance,
    welford_init,
    welford_update_batch,
    welford_variance,
)
from .advi import (
    ADVIResult,
    FlowPosterior,
    FullRankGaussian,
    MeanFieldGaussian,
    fit_advi,
)
from .chees import CheesState, CheesStats, run_chees
from .ensemble import EnsembleResult, run_ensemble
from .evidence import (
    BridgeResult,
    ISResult,
    bridge_sampling_evidence,
    importance_sampling_evidence,
)
from .loo import LOOResult, WAICResult, fit_gpd, psis_loo, waic
from .hmc import IntegratorState, NutsInfo, hmc_kernel, leapfrog, nuts_kernel
from .map_laplace import (
    LaplaceApprox,
    MAPResult,
    fit_map,
    laplace_approximation,
    map_laplace,
)
from .model import Model
from .neutra import (
    NeutraResult,
    fit_neutra_flow,
    neutra_logdensity,
    neutra_sample,
)
from .pathfinder import PathfinderResult, fit_pathfinder, multipath_pathfinder
from .predictive import posterior_predictive, ppc_pvalue, prior_predictive
from .sbc import SBCResult, sbc_ranks, sbc_uniformity
from .sampler import (
    RunStats,
    SamplerState,
    init_sampler,
    resume_sampling,
    warmup_and_sample,
)
from .smc import SMCResult, run_smc, systematic_resample
from .tempering import PTResult, default_ladder, run_parallel_tempering

__all__ = [
    "Model",
    "nuts_kernel",
    "hmc_kernel",
    "leapfrog",
    "IntegratorState",
    "NutsInfo",
    "SamplerState",
    "RunStats",
    "init_sampler",
    "warmup_and_sample",
    "resume_sampling",
    "fit_advi",
    "MeanFieldGaussian",
    "FullRankGaussian",
    "FlowPosterior",
    "ADVIResult",
    "run_smc",
    "SMCResult",
    "systematic_resample",
    "fit_map",
    "MAPResult",
    "fit_pathfinder",
    "multipath_pathfinder",
    "PathfinderResult",
    "run_parallel_tempering",
    "PTResult",
    "default_ladder",
    "run_ensemble",
    "EnsembleResult",
    "bridge_sampling_evidence",
    "BridgeResult",
    "importance_sampling_evidence",
    "ISResult",
    "psis_loo",
    "waic",
    "fit_gpd",
    "LOOResult",
    "WAICResult",
    "laplace_approximation",
    "LaplaceApprox",
    "map_laplace",
    "neutra_logdensity",
    "fit_neutra_flow",
    "neutra_sample",
    "NeutraResult",
    "sbc_ranks",
    "sbc_uniformity",
    "SBCResult",
    "run_chees",
    "CheesState",
    "CheesStats",
    "prior_predictive",
    "posterior_predictive",
    "ppc_pvalue",
    # adaptation
    "stepsize_init",
    "stepsize_update",
    "StepSizeAdaptState",
    "welford_init",
    "welford_cov_init",
    "welford_cov_update_batch",
    "welford_covariance",
    "welford_update_batch",
    "welford_variance",
    "WelfordState",
    "build_schedule",
]
