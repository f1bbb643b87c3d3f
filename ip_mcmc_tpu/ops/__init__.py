from ip_mcmc_tpu.ops.fused_mcmc import (
    fused_pcn_chain,
    fused_pcn_chain_recorded,
    fused_rwm_chain,
)

__all__ = ["fused_rwm_chain", "fused_pcn_chain", "fused_pcn_chain_recorded"]
