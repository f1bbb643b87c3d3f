"""Headline-config preconditioner probe (round-2 VERDICT item 4: move the
perf frontier on a SHIPPING Darcy config, with MFU accounting).

FLOP accounting for the warm-DST-16 fused pCN kernel (n=16, K=64 KL modes,
6 PCG iterations, per chain-step):

- dense Kronecker DST apply = 4 MXU matmuls with (256, 256) bf16 factors
  = 4·2·256² = 524 kFLOP; 7 applies (init + 6 iters) = 3.67 MFLOP — THE
  dominant term (everything else — basis matmul 33k, stencil+CG vector ops
  ~40k, RNG — is ~100 kFLOP).
- At the round-2 headline 18.9M steps/s that is ~69 TFLOP/s of bf16 MXU
  work ≈ 35% of v5e peak (197 TFLOP/s): the kernel is MXU-bound on the
  PRECONDITIONER, so the lever is cheaper preconditioner MACs, not fusion.

The truncated two-level DST (already shipping for n >= 32) costs
O(K_modes·n²) per apply instead of O(n⁴): at n=16 with 64 modes that is
4·2·64·256 = 131 kFLOP/apply — 4x fewer MACs at (per round-1 measurements)
similar per-mode quality on the low modes, leaving high modes to Jacobi.

This probe measures steps/s + acceptance + cold-start solution error for
dense-DST-6 (shipping), dst_trunc-{64,96,128}x{4,6}, jacobi-16 on the real
chip. Acceptance parity with dense-DST-6 gates any swap of the headline
config. Writes benchmarks/darcy16_precond.json.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="benchmarks/darcy16_precond.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ip_mcmc_tpu import distributions
    from ip_mcmc_tpu.models import darcy
    from ip_mcmc_tpu.ops import fused_pcn_chain_warm

    BETA, NOISE = 0.08, 0.002
    N_CHAINS = 1024 if args.quick else 4096
    BLOCK = 512
    BURN = 200 if args.quick else 300
    N_TIME = 200 if args.quick else 500

    fwd, aux = darcy.make_darcy_forward(n_grid=16, n_modes_per_dim=8)
    rng = np.random.default_rng(7)
    u_true = rng.standard_normal(64)
    from benchmarks.oracle_darcy import OracleDarcyPCN

    oracle = OracleDarcyPCN()
    y = oracle.forward(u_true) + NOISE * rng.standard_normal(len(oracle.obs))

    prior = distributions.DiagGaussian(mean=jnp.zeros(64), scale=jnp.ones(64))
    pm, ps = np.zeros(64), np.ones(64)
    pos0 = prior.sample(jax.random.key(0), (N_CHAINS,))

    # reference solution for the cold-start error check (dense solve)
    phi_exact, _ = darcy.make_batched_misfit_warm(
        aux, jnp.asarray(y, jnp.float32), NOISE, cg_iters=48, precond="jacobi"
    )
    U_probe = np.asarray(prior.sample(jax.random.key(9), (BLOCK,))).T
    x_ref = np.asarray(
        phi_exact(jnp.asarray(U_probe), jnp.zeros((256, BLOCK), jnp.float32))[1]
    )

    variants = [("dst", 6, 0), ("dst", 4, 0)]
    for modes in (64, 96, 128):
        for iters in (4, 6):
            variants.append(("dst_trunc", iters, modes))
    variants.append(("jacobi", 16, 0))

    rows = []
    for precond, iters, modes in variants:
        kw = dict(cg_iters=iters, precond=precond)
        if precond == "dst_trunc":
            kw["precond_modes"] = modes
        phi_warm, aux_dim = darcy.make_batched_misfit_warm(
            aux, jnp.asarray(y, jnp.float32), NOISE, **kw
        )
        label = f"{precond}-{iters}" + (f" K={modes}" if modes else "")

        # cold-start solution error (one batched apply from zero)
        x_cold = np.asarray(
            phi_warm(jnp.asarray(U_probe),
                     jnp.zeros((256, BLOCK), jnp.float32))[1]
        )
        rel = float(
            np.linalg.norm(x_cold - x_ref) / np.linalg.norm(x_ref)
        )

        def launch(pos, seed, n):
            return fused_pcn_chain_warm(
                phi_warm, pos, prior_mean=pm, prior_scale=ps, beta=BETA,
                seed=seed, n_steps=n, aux_dim=aux_dim, block_chains=BLOCK,
            )

        out = launch(pos0, 1, BURN)
        np.asarray(out[1])
        pos = out[0]
        reps = []
        for rep in range(3):
            t0 = time.perf_counter()
            out = launch(pos, 100 + rep, N_TIME)
            np.asarray(out[1])  # transfer barrier (see burgers_da.py)
            dt = time.perf_counter() - t0
            if N_CHAINS * N_TIME / dt > 1e9:
                log(f"  [{label}] absurd rep discarded: {dt*1e3:.2f} ms")
                continue
            reps.append(dt)
        dt = float(np.median(reps))
        row = {
            "label": label,
            "steps_per_s": N_CHAINS * N_TIME / dt,
            "accept": float(np.asarray(out[1]).mean()),
            "cold_rel_err": rel,
        }
        rows.append(row)
        log(f"{label:22s} {row['steps_per_s']:12,.0f} steps/s  accept "
            f"{row['accept']:.4f}  cold err {rel:.2e}")

    base = next(r for r in rows if r["label"] == "dst-6")
    for r in rows:
        r["speedup_vs_shipping"] = r["steps_per_s"] / base["steps_per_s"]
    with open(args.out, "w") as fh:
        json.dump({"n_chains": N_CHAINS, "rows": rows}, fh, indent=1)
    log("written:", args.out)


if __name__ == "__main__":
    main()
