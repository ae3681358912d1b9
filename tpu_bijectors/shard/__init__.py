"""Device-mesh sharding: chain/particle-parallel inference over TPU meshes
(net-new vs the reference; SURVEY.md §2.2 "TPU-native plan" column)."""

from .chain_parallel import (
    build_advi_sharded,
    build_nuts_sharded,
    build_resume_sharded,
    build_smc_sharded,
    chain_parallel_advi,
    chain_parallel_chees,
    chain_parallel_nuts,
    chain_parallel_pathfinder,
    chain_parallel_pt,
    chain_parallel_resume,
    chain_parallel_smc,
    make_mesh,
    multihost_init,
    shard_chains,
)
from .checkpoint import load_sampler_state, save_sampler_state
from .param_parallel import (
    ParamLayout,
    build_param_layout,
    param_parallel_from_linked,
    param_parallel_logdensity,
    shard_params,
)

__all__ = [
    "make_mesh",
    "multihost_init",
    "shard_chains",
    "build_advi_sharded",
    "build_nuts_sharded",
    "build_resume_sharded",
    "build_smc_sharded",
    "chain_parallel_advi",
    "chain_parallel_chees",
    "chain_parallel_nuts",
    "chain_parallel_pathfinder",
    "chain_parallel_pt",
    "chain_parallel_resume",
    "chain_parallel_smc",
    "shard_params",
    "ParamLayout",
    "build_param_layout",
    "param_parallel_from_linked",
    "param_parallel_logdensity",
    "save_sampler_state",
    "load_sampler_state",
]
