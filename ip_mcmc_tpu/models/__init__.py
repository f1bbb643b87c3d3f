from ip_mcmc_tpu.models import burgers, darcy, kl, linear, ode

__all__ = ["linear", "ode", "darcy", "burgers", "kl"]
