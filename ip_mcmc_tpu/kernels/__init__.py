from ip_mcmc_tpu.kernels import (
    chees_hmc,
    da_pcn,
    ensemble,
    elliptical,
    hmc,
    mala,
    nuts,
    pcn,
    rwm,
    tempering,
)
from ip_mcmc_tpu.kernels.base import MHInfo

__all__ = [
    "rwm",
    "pcn",
    "da_pcn",
    "ensemble",
    "mala",
    "hmc",
    "nuts",
    "chees_hmc",
    "elliptical",
    "tempering",
    "MHInfo",
]
