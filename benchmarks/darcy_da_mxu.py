"""MXU-vs-VPU lever probe for the fused DA-pCN headline kernel (round-5,
VERDICT round-4 item 2).

The FLOP account (BASELINE.md round-5 MFU section) puts the darcy_da_fused
outer step at ~1.5 MFLOP/chain, ~2/3 of it f32 VPU vector work: the
surrogate stage is 48x (8 Jacobi-CG iterations on the 8x8 grid) and the
exact correction is a 48-iteration Jacobi-CG on 16x16. The account suggests
moving solve work onto the MXU:

1. SURROGATE: at n=8 the full DST basis is a (64,64) dense factor — the
   "dst_trunc" preconditioner with precond_modes=64 is a DIRECT spectral
   solve of the constant-coefficient part (two small MXU matmuls per
   apply), so 2-4 preconditioned iterations should replace 8 Jacobi ones
   (the VERDICT's "dense/direct solve on the MXU" candidate, in the form
   the existing machinery already supports).
2. EXACT: the cold CG-48 Jacobi correction can run dst_trunc-128 at ~1/3
   the iterations — same lever the warm pCN kernel shipped in round 3.

Each variant's surrogate is RE-CALIBRATED with its own deployed solver
(configs._darcy_coarse_surrogate round-5 behavior), and exactness is
gated: DA corrects any surrogate, so the only parity that matters is the
exact potential's definition — for exact-solver swaps the gate is
posterior moments within the shipping kernel's seed-to-seed MC spread.

Writes benchmarks/darcy_da_mxu.json.
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
    from ip_mcmc_tpu import diagnostics, distributions
    from ip_mcmc_tpu.configs import _darcy_coarse_surrogate
    from ip_mcmc_tpu.models import darcy
    from ip_mcmc_tpu.ops import fused_da_pcn_chain, fused_da_pcn_chain_recorded

    NOISE = 0.002
    N_CHAINS = 4096
    BLOCK = 512
    DA_K, DA_BETA = 48, 0.35

    log(f"device: {jax.devices()[0]}")

    oracle = OracleDarcyPCN()
    rng = np.random.default_rng(7)
    u_true = rng.standard_normal(oracle.K)
    y = oracle.forward(u_true) + NOISE * rng.standard_normal(len(oracle.obs))
    yj = jnp.asarray(y, jnp.float32)

    fwd, aux = darcy.make_darcy_forward(n_grid=16, n_modes_per_dim=8)
    prior = distributions.DiagGaussian(mean=jnp.zeros(64), scale=jnp.ones(64))
    pm, ps = np.zeros(64), np.ones(64)

    exact_variants = {
        "jac48": darcy.make_batched_misfit(aux, yj, NOISE),
        "dst16": darcy.make_batched_misfit(
            aux, yj, NOISE, cg_iters=16, precond="dst_trunc",
            precond_modes=128),
        "dst12": darcy.make_batched_misfit(
            aux, yj, NOISE, cg_iters=12, precond="dst_trunc",
            precond_modes=128),
    }
    surr_variants = {
        "jac8": _darcy_coarse_surrogate(prior, yj),
        "dst4": _darcy_coarse_surrogate(prior, yj, cg_iters=4,
                                        precond="dst_trunc"),
        "dst3": _darcy_coarse_surrogate(prior, yj, cg_iters=3,
                                        precond="dst_trunc"),
        "dst2": _darcy_coarse_surrogate(prior, yj, cg_iters=2,
                                        precond="dst_trunc"),
    }

    combos = [
        ("jac8", "jac48"),   # shipping
        ("dst4", "jac48"),
        ("dst3", "jac48"),
        ("dst2", "jac48"),
        ("dst3", "dst16"),
        ("dst3", "dst12"),
    ]

    pos0 = prior.sample(jax.random.key(3), (N_CHAINS,))
    rows = []
    for s_name, e_name in combos:
        phi_e, surr = exact_variants[e_name], surr_variants[s_name]

        def da(pos, seed, n_steps):
            return fused_da_pcn_chain(
                phi_e, surr, pos, pm, ps, DA_BETA, seed,
                n_steps=n_steps, subchain_len=DA_K, block_chains=BLOCK)

        t0 = time.time()
        pos, _, _ = da(pos0, 11, 40)  # burn + compile
        np.asarray(pos)
        compile_s = time.time() - t0

        reps = []
        for rep in range(4):
            t0 = time.time()
            p = pos
            for j in range(3):
                p, acc, in_acc = da(p, 30 + rep * 3 + j, 100)
            np.asarray(p)
            if rep:
                reps.append(time.time() - t0)
        outer_rate = N_CHAINS * 100 / (min(reps) / 3)

        # ESS/outer-step + posterior moments from a recorded series
        p, _, series = fused_da_pcn_chain_recorded(
            phi_e, surr, pos, pm, ps, DA_BETA, 900, n_steps=200, thin=1,
            subchain_len=DA_K, block_chains=BLOCK)
        ess = float(np.asarray(diagnostics.ess_per_param(series)).min())
        flat = np.asarray(series).reshape(-1, 64)
        row = {
            "surrogate": s_name,
            "exact": e_name,
            "compile_s": round(compile_s, 1),
            "outer_steps_per_s": round(outer_rate),
            "outer_accept": round(float(np.asarray(acc).mean()), 4),
            "inner_accept": round(float(np.asarray(in_acc).mean()), 4),
            "ess_per_outer_step_chain": round(ess / (N_CHAINS * 200), 5),
            "ess_per_s": round(ess / (N_CHAINS * 200) * outer_rate, 1),
            "post_mean": flat.mean(axis=0).tolist(),
            "post_std": flat.std(axis=0).tolist(),
        }
        rows.append(row)
        log(json.dumps({k: v for k, v in row.items()
                        if k not in ("post_mean", "post_std")}))

    # parity vs shipping: max |Δmean| / |Δstd| across the 64 coordinates
    base = rows[0]
    for r in rows[1:]:
        r["max_dmean_vs_ship"] = round(float(np.abs(
            np.asarray(r["post_mean"]) - np.asarray(base["post_mean"])
        ).max()), 4)
        r["max_dstd_vs_ship"] = round(float(np.abs(
            np.asarray(r["post_std"]) - np.asarray(base["post_std"])
        ).max()), 4)
        r["speedup_ess_vs_ship"] = round(r["ess_per_s"] / base["ess_per_s"], 3)
        log(f"{r['surrogate']}+{r['exact']}: {r['speedup_ess_vs_ship']}x "
            f"ESS/s, dmean {r['max_dmean_vs_ship']}, dstd "
            f"{r['max_dstd_vs_ship']}")
    for r in rows:
        del r["post_mean"], r["post_std"]
    with open("benchmarks/darcy_da_mxu.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
