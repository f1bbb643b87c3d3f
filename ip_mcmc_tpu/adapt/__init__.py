from ip_mcmc_tpu.adapt import dual_averaging
from ip_mcmc_tpu.adapt.warmup import (
    warmup_hmc,
    warmup_nuts,
    warmup_pcn,
    warmup_rwm,
)

__all__ = ["dual_averaging", "warmup_rwm", "warmup_pcn", "warmup_hmc", "warmup_nuts"]
