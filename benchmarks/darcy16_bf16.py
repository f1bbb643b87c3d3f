"""Round-4 VERDICT item 5: one measured perf lever on the VPU-bound warm
darcy16 kernel (post-dst_trunc-swap the preconditioner MACs are gone and
BASELINE.md's accounting puts the kernel at ~11% MFU, vector-bound).

Candidate measured here — **bf16 mixed precision** in the warm misfit
(darcy.make_batched_misfit_warm(mixed_precision=...)):

  recon     KL reconstruction matmul with bf16 inputs / f32 accumulation
            (MXU 2x rate; exp and everything downstream f32)
  recon+op  additionally the CG operator apply (transmissibilities +
            stencil fluxes) in bf16, CG vectors/reductions/updates f32 —
            halves the VMEM traffic of the dominant VPU loop at the cost
            of a perturbed (bf16-rounded) operator

Gates (the round-3 swap discipline): chain acceptance parity, warm-path
phi relative error from a converged start, cold-start solution error, and
steps/s; ship only on >=10% steps/s at parity.

Candidate NOT measured, documented-rejected: antithetic/shared draws
across chain blocks. Sharing (or negating) proposal noise across chains
keeps each chain's MARGINAL transition kernel exact, but makes chains
mutually dependent — and the multi-chain Geyer/Vehtari ESS estimator used
for every honest-ESS number in this repo assumes independent chains
(between-chain variance enters split-R-hat and var+). Coupled chains
shrink the between-chain variance estimate, so measured "ESS/s gains"
would be estimator artifacts, not sampling efficiency — the same class of
error round 2 purged from the CountedAccepter. A correct evaluation needs
a replicated-ensemble ESS estimator; until one exists the lever is
unmeasurable honestly, hence rejected.

Run: python -m benchmarks.darcy16_bf16 [--quick] (~5 min on the chip).
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
    ap.add_argument("--out", default="benchmarks/darcy16_bf16.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from benchmarks.oracle_darcy import OracleDarcyPCN
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
    oracle = OracleDarcyPCN()
    y = oracle.forward(u_true) + NOISE * rng.standard_normal(len(oracle.obs))
    yj = jnp.asarray(y, jnp.float32)

    prior = distributions.DiagGaussian(mean=jnp.zeros(64), scale=jnp.ones(64))
    pm, ps = np.zeros(64), np.ones(64)
    pos0 = prior.sample(jax.random.key(0), (N_CHAINS,))
    U_probe = jnp.asarray(np.asarray(prior.sample(jax.random.key(9), (BLOCK,))).T)
    z0 = jnp.zeros((256, BLOCK), jnp.float32)

    # deep-solve reference for phi/solution parity
    ref, _ = darcy.make_batched_misfit_warm(
        aux, yj, NOISE, cg_iters=200, precond="dst_trunc", precond_modes=128)
    p_ref, x_ref = ref(U_probe, z0)
    p_ref, x_ref = np.asarray(p_ref), np.asarray(x_ref)

    # shipping darcy16 warm config: dst_trunc-4 K=64 (round-3 swap)
    variants = [("f32 (shipping)", "none"),
                ("bf16 recon", "recon"),
                ("bf16 recon+op", "recon+op")]
    rows = []
    for label, mp in variants:
        phi_warm, aux_dim = darcy.make_batched_misfit_warm(
            aux, yj, NOISE, cg_iters=4, precond="dst_trunc",
            precond_modes=64, mixed_precision=mp)

        # cold-start solution + phi error vs deep reference
        p_c, x_c = phi_warm(U_probe, z0)
        cold_rel = float(np.linalg.norm(np.asarray(x_c) - x_ref)
                         / np.linalg.norm(x_ref))
        # warm-path phi error from a converged start (the bias that enters
        # the MH ratio mid-run)
        p_w, _ = phi_warm(U_probe, jnp.asarray(x_ref))
        phi_rel = float(np.max(np.abs(np.asarray(p_w) - p_ref)
                               / (1.0 + np.abs(p_ref))))

        def launch(pos, seed, n, _phi=phi_warm, _ad=aux_dim):
            return fused_pcn_chain_warm(
                _phi, pos, prior_mean=pm, prior_scale=ps, beta=BETA,
                seed=seed, n_steps=n, aux_dim=_ad, block_chains=BLOCK,
            )

        out = launch(pos0, 1, BURN)
        np.asarray(out[1])
        pos = out[0]
        reps = []
        for rep in range(3):
            t0 = time.perf_counter()
            out = launch(pos, 100 + rep, N_TIME)
            np.asarray(out[1])  # transfer barrier
            dt = time.perf_counter() - t0
            if N_CHAINS * N_TIME / dt > 1e9:
                log(f"  [{label}] absurd rep discarded: {dt*1e3:.2f} ms")
                continue
            reps.append(dt)
        dt = float(np.median(reps))
        row = {
            "label": label,
            "mixed_precision": mp,
            "steps_per_s": N_CHAINS * N_TIME / dt,
            "accept": float(np.asarray(out[1]).mean()),
            "cold_rel_err": cold_rel,
            "warm_phi_rel_err": phi_rel,
        }
        rows.append(row)
        log(f"{label:18s} {row['steps_per_s']:12,.0f} steps/s  accept "
            f"{row['accept']:.4f}  warm_phi {phi_rel:.2e}  cold {cold_rel:.2e}")

    base = rows[0]
    for r in rows:
        r["speedup_vs_f32"] = r["steps_per_s"] / base["steps_per_s"]
    with open(args.out, "w") as fh:
        json.dump({"n_chains": N_CHAINS, "rows": rows}, fh, indent=1)
    log("written:", args.out)


if __name__ == "__main__":
    main()
