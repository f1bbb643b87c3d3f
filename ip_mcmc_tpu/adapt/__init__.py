from ip_mcmc_tpu.adapt import dual_averaging
from ip_mcmc_tpu.adapt import warmup
from ip_mcmc_tpu.adapt.warmup import (
    map_localize,
    warmup_hmc,
    warmup_mala,
    warmup_nuts,
    warmup_pcn,
    warmup_rwm,
)

__all__ = [
    "dual_averaging",
    "warmup",
    "map_localize",
    "warmup_rwm",
    "warmup_pcn",
    "warmup_mala",
    "warmup_hmc",
    "warmup_nuts",
]
