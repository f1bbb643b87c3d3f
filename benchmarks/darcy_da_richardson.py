"""Richardson-vs-CG surrogate solver for the fused DA headline kernel
(round-5 follow-up to the VPU-issue split).

MEASURED VERDICT: NEGATIVE — CG stays the shipped surrogate solver.
rich3@w0.9 delivered the split's predicted rate win (+30%: 3.29M vs
2.53M outer steps/s) but ESS/outer collapsed 0.180 → 0.029 at HIGHER
outer acceptance (0.672 vs 0.642) → 0.21× ESS/s; rich4@w0.8 0.45×.
Mechanism (verified on CPU, 2048 prior draws): the fixed-coefficient
iteration's per-state potential error is ~3× the median of CG-3's
(3.11 vs 1.05 nats) and state-dependent — quenched noise in the
surrogate landscape that traps the subchain, so accepted outer moves
shorten while the acceptance rate itself stays healthy. The same
design rule as the dst-2 boundary, reached through the error-magnitude
channel: per-chain solver ADAPTIVITY, not just average accuracy, is
load-bearing for DA surrogates.

benchmarks/da_vpu_split.py measured the 48-eval surrogate stage at 51.3%
of the shipped outer step, and its CG body carries per-iteration costs a
fixed-coefficient iteration does not: two (n², block)→(block,) sublane
dot-product reductions, the α/β guard algebra, and their lane broadcasts.
``darcy.make_batched_misfit(..., solver="richardson")`` replaces the CG
body with x ← x + ω·M⁻¹(b − A x) — per iteration ONE stencil apply + ONE
preconditioner apply + axpy, and the first iteration's apply is free
(x₀ = 0). CPU accuracy sweep (same misfit, 64-chain batch, vs a CG-96
reference): richardson-3 @ ω=0.9 ≈ CG-3 (rel err 0.016 vs 0.013);
richardson-4 @ ω=0.8 beats CG-3 (0.0036) with still no reductions.

Each variant's surrogate is RE-CALIBRATED with its own deployed solver
(solver/omega plumbed through configs._darcy_coarse_surrogate — the
round-5 ADVICE rule). Parity gates as in darcy_da_mxu.py: DA corrects
any surrogate, so the gate is posterior moments vs the shipping kernel
within its seed-to-seed MC spread (0.042).

Writes benchmarks/darcy_da_richardson.json.
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

    _, aux = darcy.make_darcy_forward(n_grid=16, n_modes_per_dim=8)
    prior = distributions.DiagGaussian(mean=jnp.zeros(64), scale=jnp.ones(64))
    pm, ps = np.zeros(64), np.ones(64)

    phi_exact = darcy.make_batched_misfit(
        aux, yj, NOISE, cg_iters=12, precond="dst_trunc", precond_modes=128)

    surr_variants = {
        "cg3 (ship)": _darcy_coarse_surrogate(
            prior, yj, cg_iters=3, precond="dst_trunc"),
        "rich3_w0.9": _darcy_coarse_surrogate(
            prior, yj, cg_iters=3, precond="dst_trunc",
            solver="richardson", omega=0.9),
        "rich4_w0.8": _darcy_coarse_surrogate(
            prior, yj, cg_iters=4, precond="dst_trunc",
            solver="richardson", omega=0.8),
        "rich2_w0.9": _darcy_coarse_surrogate(
            prior, yj, cg_iters=2, precond="dst_trunc",
            solver="richardson", omega=0.9),
    }

    pos0 = prior.sample(jax.random.key(3), (N_CHAINS,))
    rows = []
    for s_name, surr in surr_variants.items():
        def da(pos, seed, n_steps):
            return fused_da_pcn_chain(
                phi_exact, surr, pos, pm, ps, DA_BETA, seed,
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

        p, _, series = fused_da_pcn_chain_recorded(
            phi_exact, surr, pos, pm, ps, DA_BETA, 900, n_steps=200, thin=1,
            subchain_len=DA_K, block_chains=BLOCK)
        ess = float(np.asarray(diagnostics.ess_per_param(series)).min())
        flat = np.asarray(series).reshape(-1, 64)
        row = {
            "surrogate": s_name,
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

    base = rows[0]
    for r in rows[1:]:
        r["max_dmean_vs_ship"] = round(float(np.abs(
            np.asarray(r["post_mean"]) - np.asarray(base["post_mean"])
        ).max()), 4)
        r["max_dstd_vs_ship"] = round(float(np.abs(
            np.asarray(r["post_std"]) - np.asarray(base["post_std"])
        ).max()), 4)
        r["speedup_ess_vs_ship"] = round(r["ess_per_s"] / base["ess_per_s"], 3)
        log(f"{r['surrogate']}: {r['speedup_ess_vs_ship']}x ESS/s, "
            f"dmean {r['max_dmean_vs_ship']}, dstd {r['max_dstd_vs_ship']}")
    for r in rows:
        del r["post_mean"], r["post_std"]
    with open("benchmarks/darcy_da_richardson.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
