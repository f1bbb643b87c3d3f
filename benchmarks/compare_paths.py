"""Compare the scan+vmap path vs the fused Pallas path on an analytic
target (chain-steps/sec). The Pallas kernel's win comes from (a) the
counter-hash RNG (~8 ALU ops/draw vs threefry's ~50+), (b) zero HBM traffic
between steps (state lives in VMEM for the whole launch).

Run on TPU: python benchmarks/compare_paths.py [n_chains] [n_steps]
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

from ip_mcmc_tpu import driver
from ip_mcmc_tpu.kernels import rwm
from ip_mcmc_tpu.ops import fused_rwm_chain

MEAN = jnp.array([1.0, -0.5])
VAR = jnp.array([2.0, 0.5])


def logpi(x):
    return -0.5 * jnp.sum((x - MEAN) ** 2 / VAR)


def pot_batch(x):
    # features-first batch: (d, block) -> (block,)
    return 0.5 * jnp.sum((x - MEAN[:, None]) ** 2 / VAR[:, None], axis=0)


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    print(f"device: {jax.devices()[0]}, {n_chains} chains x {n_steps} steps",
          file=sys.stderr)

    # scan+vmap path
    kernel = rwm.build_kernel(logpi, step_size=0.9)
    state = driver.init_chains(rwm.init, jnp.zeros((n_chains, 2)), logpi)

    def run_scan():
        st, samples, _ = driver.sample_chains(
            kernel, state, jax.random.key(0), n_samples=1, burn_in=n_steps,
        )
        return st.position

    out = run_scan()
    jax.block_until_ready(out)
    t0 = time.time()
    out = run_scan()
    jax.block_until_ready(out)
    scan_s = time.time() - t0
    scan_rate = n_chains * n_steps / scan_s

    # fused pallas path
    pos = jnp.zeros((n_chains, 2), jnp.float32)
    f_out, _ = fused_rwm_chain(
        pot_batch, pos, step_size=0.9, seed=0, n_steps=n_steps,
        block_chains=min(n_chains, 1024),
    )
    jax.block_until_ready(f_out)
    t0 = time.time()
    f_out, acc = fused_rwm_chain(
        pot_batch, pos, step_size=0.9, seed=1, n_steps=n_steps,
        block_chains=min(n_chains, 1024),
    )
    jax.block_until_ready(f_out)
    fused_s = time.time() - t0
    fused_rate = n_chains * n_steps / fused_s

    print(
        f"scan+vmap : {scan_rate:,.0f} steps/s ({scan_s:.3f}s)\n"
        f"pallas    : {fused_rate:,.0f} steps/s ({fused_s:.3f}s)\n"
        f"speedup   : {fused_rate / scan_rate:.2f}x  "
        f"(fused accept={float(np.asarray(acc).mean()):.3f})"
    )


if __name__ == "__main__":
    main()
