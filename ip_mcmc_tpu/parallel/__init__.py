from ip_mcmc_tpu.parallel.fused_shard import (sharded_fused_chain,
                                              sharded_fused_chain_composed)
from ip_mcmc_tpu.parallel.mesh import (
    CHAIN_AXIS,
    chain_sharding,
    make_chain_mesh,
    replicate,
    sample_chains_sharded,
    shard_chains,
)

__all__ = [
    "CHAIN_AXIS",
    "make_chain_mesh",
    "chain_sharding",
    "shard_chains",
    "replicate",
    "sample_chains_sharded",
    "sharded_fused_chain",
    "sharded_fused_chain_composed",
]
