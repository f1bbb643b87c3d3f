"""Headline benchmark: effective samples/sec/chip on the Darcy pCN inverse
problem (BASELINE.json config 4: 64-dim KL, 4096 parallel chains) vs the
reference-equivalent NumPy single-chain oracle.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology (SURVEY.md §6, §7.3 item 6 — honest ESS accounting):
- identical algorithm on both sides: pCN with the same β on the same
  posterior (same KL basis, grid, observations, noise);
- ESS/step is measured ONCE from the TPU run's 4096-chain sample tensor
  with the multi-chain Geyer estimator (the oracle's single short chain
  cannot estimate its own ESS as well; the per-step statistical efficiency
  of the two identical kernels is equal in expectation);
- each side's ESS/sec = (ESS/step/chain) × (chain-steps/sec);
- vs_baseline = TPU ESS/sec (one chip) / oracle ESS/sec (one CPU process —
  the reference's deployment model).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from benchmarks.oracle_darcy import OracleDarcyPCN
    from ip_mcmc_tpu import diagnostics, distributions, driver, potentials
    from ip_mcmc_tpu.kernels import pcn
    from ip_mcmc_tpu.models import darcy

    BETA = 0.08
    NOISE = 0.002
    N_CHAINS = 4096
    N_SAMPLES = 400
    BURN = 300

    log(f"device: {jax.devices()[0]}")

    # ---- shared problem (data synthesized once, numpy side) -------------
    oracle = OracleDarcyPCN()
    rng = np.random.default_rng(7)
    u_true = rng.standard_normal(oracle.K)
    y = oracle.forward(u_true) + NOISE * rng.standard_normal(len(oracle.obs))

    # ---- TPU side -------------------------------------------------------
    fwd, aux = darcy.make_darcy_forward(n_grid=16, n_modes_per_dim=8)
    noise = distributions.DiagGaussian(
        mean=jnp.zeros(len(y)), scale=NOISE * jnp.ones(len(y))
    )
    phi = potentials.misfit_potential(fwd, jnp.asarray(y, jnp.float32), noise)
    prior = distributions.DiagGaussian(mean=jnp.zeros(64), scale=jnp.ones(64))
    kernel = pcn.build_kernel(phi, prior, beta=BETA)

    key_i, key_r = jax.random.split(jax.random.key(0), 2)
    state = driver.init_chains(pcn.init, prior.sample(key_i, (N_CHAINS,)), phi)

    # ONE compiled program: burn-in + sampling in a single scan; the first
    # BURN retained samples are discarded host-side
    total = BURN + N_SAMPLES

    def run(st, key):
        return driver.sample_chains(kernel, st, key, n_samples=total, burn_in=0)

    t0 = time.time()
    _, s_warm, _ = run(state, key_i)
    jax.block_until_ready(s_warm)
    log(f"compile+first run: {time.time()-t0:.1f}s")
    del s_warm

    t0 = time.time()
    state2, samples_all, infos = run(state, key_r)
    jax.block_until_ready(samples_all)
    tpu_run_s = time.time() - t0
    tpu_steps_per_s = N_CHAINS * total / tpu_run_s
    samples = samples_all[BURN:]
    accept = float(np.asarray(infos.accepted)[BURN:].mean())

    ess = np.asarray(diagnostics.ess_per_param(samples))
    min_ess = float(ess.min())
    ess_per_step_chain = min_ess / (N_CHAINS * N_SAMPLES)
    # steady-state throughput: attribute only the sampling window's share of
    # the wall clock to the retained samples
    sampling_s = tpu_run_s * N_SAMPLES / total
    tpu_ess_per_s = min_ess / sampling_s
    log(
        f"TPU: {tpu_run_s:.2f}s for {N_CHAINS}x{total} steps "
        f"({tpu_steps_per_s:,.0f} steps/s), accept={accept:.3f}, "
        f"min ESS={min_ess:,.0f} -> {tpu_ess_per_s:,.1f} ESS/s"
    )

    # ---- oracle side (reference-equivalent loop, single chain) ----------
    # short timed run; statistical efficiency per step taken from the TPU
    # measurement (identical kernel)
    n_oracle = 300
    rng_o = np.random.default_rng(1)
    t0 = time.time()
    _, oracle_accept = oracle.run_pcn(y, NOISE, BETA, n_oracle, rng_o)
    oracle_s = time.time() - t0
    oracle_steps_per_s = n_oracle / oracle_s
    oracle_ess_per_s = ess_per_step_chain * oracle_steps_per_s
    log(
        f"oracle: {oracle_s:.2f}s for {n_oracle} steps "
        f"({oracle_steps_per_s:,.1f} steps/s), accept={oracle_accept:.3f} "
        f"-> {oracle_ess_per_s:.3f} ESS/s"
    )

    ratio = tpu_ess_per_s / oracle_ess_per_s
    print(
        json.dumps(
            {
                "metric": "ESS/sec/chip, Darcy pCN 64-dim KL 4096 chains",
                "value": round(tpu_ess_per_s, 2),
                "unit": "effective samples/sec",
                "vs_baseline": round(ratio, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
