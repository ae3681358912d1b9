"""Device-mesh sharding: chain/particle-parallel inference over TPU meshes
(net-new vs the reference; SURVEY.md §2.2 "TPU-native plan" column)."""

from .chain_parallel import (
    chain_parallel_nuts,
    chain_parallel_smc,
    make_mesh,
    multihost_init,
    shard_chains,
)
from .checkpoint import load_sampler_state, save_sampler_state

__all__ = [
    "make_mesh",
    "multihost_init",
    "shard_chains",
    "chain_parallel_nuts",
    "chain_parallel_smc",
    "save_sampler_state",
    "load_sampler_state",
]
