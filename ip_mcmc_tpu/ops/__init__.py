from ip_mcmc_tpu.ops.fused_mcmc import (
    fused_ess_chain,
    fused_ess_chain_recorded,
    fused_mala_chain,
    fused_mala_chain_recorded,
    fused_pcn_chain,
    fused_pcn_chain_dense,
    fused_pcn_chain_dense_recorded,
    fused_pcn_chain_warm,
    fused_pcn_chain_warm_recorded,
    fused_pcn_chain_recorded,
    fused_rwm_chain,
    fused_rwm_chain_recorded,
)

__all__ = [
    "fused_ess_chain",
    "fused_ess_chain_recorded",
    "fused_rwm_chain",
    "fused_rwm_chain_recorded",
    "fused_mala_chain",
    "fused_mala_chain_recorded",
    "fused_pcn_chain",
    "fused_pcn_chain_dense",
    "fused_pcn_chain_dense_recorded",
    "fused_pcn_chain_warm",
    "fused_pcn_chain_warm_recorded",
    "fused_pcn_chain_recorded",
]
