"""Darcy pCN: scan+vmap vs fully-fused Pallas (whole PCG solve in-kernel).

Run on TPU: python -m benchmarks.fused_darcy [n_chains] [n_steps]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ip_mcmc_tpu import distributions, driver, potentials
from ip_mcmc_tpu.kernels import pcn
from ip_mcmc_tpu.models import darcy
from ip_mcmc_tpu.ops import fused_pcn_chain

BETA = 0.08
NOISE = 0.002


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    print(
        f"device: {jax.devices()[0]}, {n_chains} chains x {n_steps} steps",
        file=sys.stderr, flush=True,
    )
    fwd, aux = darcy.make_darcy_forward(n_grid=16, n_modes_per_dim=8)
    prior = distributions.DiagGaussian(mean=jnp.zeros(64), scale=jnp.ones(64))
    u_true = prior.sample(jax.random.key(1))
    m = len(aux["obs_indices"])
    noise = distributions.DiagGaussian(
        mean=jnp.zeros(m), scale=NOISE * jnp.ones(m)
    )
    y = fwd(u_true) + noise.sample(jax.random.key(2))
    phi = potentials.misfit_potential(fwd, y, noise)
    kernel = pcn.build_kernel(phi, prior, beta=BETA)
    positions = prior.sample(jax.random.key(3), (n_chains,))

    # scan+vmap
    state = driver.init_chains(pcn.init, positions, phi)

    def run_scan():
        st, s, _ = driver.sample_chains(
            kernel, state, jax.random.key(4), n_samples=1, burn_in=n_steps
        )
        return st.position

    out = run_scan()
    jax.block_until_ready(out)
    t0 = time.time()
    out = run_scan()
    jax.block_until_ready(out)
    scan_s = time.time() - t0
    scan_rate = n_chains * n_steps / scan_s

    # fused pallas
    phi_batch = darcy.make_batched_misfit(aux, y, NOISE)
    block = min(n_chains, 512)

    def run_fused(seed):
        return fused_pcn_chain(
            phi_batch, positions, prior_mean=np.zeros(64),
            prior_scale=np.ones(64), beta=BETA, seed=seed,
            n_steps=n_steps, block_chains=block,
        )

    f_out, _ = run_fused(0)
    jax.block_until_ready(f_out)
    t0 = time.time()
    f_out, acc = run_fused(1)
    jax.block_until_ready(f_out)
    fused_s = time.time() - t0
    fused_rate = n_chains * n_steps / fused_s

    print(
        f"scan+vmap : {scan_rate:,.0f} steps/s ({scan_s:.3f}s)\n"
        f"pallas    : {fused_rate:,.0f} steps/s ({fused_s:.3f}s, block {block})\n"
        f"speedup   : {fused_rate / scan_rate:.2f}x "
        f"(fused accept={float(np.asarray(acc).mean()):.3f})"
    )


if __name__ == "__main__":
    main()
