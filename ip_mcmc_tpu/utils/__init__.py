from ip_mcmc_tpu.utils.struct import pytree_dataclass, replace

__all__ = ["pytree_dataclass", "replace"]
