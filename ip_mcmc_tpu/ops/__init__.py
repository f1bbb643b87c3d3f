from ip_mcmc_tpu.ops.fused_mcmc import fused_rwm_chain, fused_pcn_chain

__all__ = ["fused_rwm_chain", "fused_pcn_chain"]
