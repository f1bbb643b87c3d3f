from ip_mcmc_tpu.kernels import elliptical, hmc, mala, nuts, pcn, rwm
from ip_mcmc_tpu.kernels.base import MHInfo

__all__ = ["rwm", "pcn", "mala", "hmc", "nuts", "elliptical", "MHInfo"]
