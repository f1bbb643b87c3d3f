"""Round-5 iteration-count sweep for the LARGE-GRID DA kernel
(`darcy64_da_fused`), following the darcy_da_mxu.py playbook: the FLOP
account says the kernel is VPU-bound on CG stencil iterations, so fewer
preconditioned iterations (surrogate dst_trunc-128 @ 32²; exact
dst_trunc-256 @ 64²) are the lever — down to the measured boundary where
solver error starts acting as surrogate error (darcy_da_mxu found that
boundary at dst-2 on the 8×8 surrogate).

Each surrogate variant is RE-CALIBRATED with its own deployed iteration
count. Parity gate: posterior moments vs the shipping kernel within its
MC spread. Writes benchmarks/darcy64_da_mxu.json.
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

    from ip_mcmc_tpu import diagnostics, distributions as dist
    from ip_mcmc_tpu.models import darcy
    from ip_mcmc_tpu.ops import fused_da_pcn_chain, fused_da_pcn_chain_recorded

    N_CHAINS = 1024
    BLOCK = 128
    DA_K, DA_BETA = 32, 0.4

    log(f"device: {jax.devices()[0]}")

    # identical problem construction to configs.darcy64_da_fused
    fwd, aux = darcy.make_darcy_forward(
        n_grid=64, n_modes_per_dim=12, alpha=2.0, field_scale=10.0,
        cg_iters=24, precond="dst",
    )
    K = 144
    prior = dist.DiagGaussian(mean=jnp.zeros(K), scale=jnp.ones(K))
    u_true = prior.sample(jax.random.key(500))
    m = 16
    noise = dist.DiagGaussian(mean=jnp.zeros(m), scale=0.002 * jnp.ones(m))
    y = fwd(u_true) + noise.sample(jax.random.key(501))
    pm, ps = np.zeros(K), np.ones(K)

    n_coarse = 32
    obs_f = np.asarray(aux["obs_indices"])
    i_f, j_f = obs_f // 64, obs_f % 64

    def _to_coarse(i):
        return np.clip(
            np.round((i + 0.5) * n_coarse / 64 - 0.5).astype(int),
            0, n_coarse - 1,
        )

    obs_c = _to_coarse(i_f) * n_coarse + _to_coarse(j_f)

    def make_surr(cg_iters):
        """Calibrated 32²-grid surrogate at the DEPLOYED iteration count."""
        fwd_c, aux_c = darcy.make_darcy_forward(
            n_grid=n_coarse, n_modes_per_dim=12, alpha=2.0, field_scale=10.0,
            obs_indices=obs_c, cg_iters=cg_iters, precond="dst",
        )
        U_cal = prior.sample(jax.random.key(402), (32,))
        d_cal = np.asarray(
            jax.vmap(fwd)(U_cal) - np.asarray(jax.vmap(fwd_c)(U_cal)))
        y_surr = np.asarray(y) - d_cal.mean(axis=0)
        scale_surr = np.sqrt(0.002**2 + d_cal.std(axis=0) ** 2).astype(
            np.float32)
        return darcy.make_batched_misfit(
            aux_c, y_surr, scale_surr, cg_iters=cg_iters, precond="dst_trunc",
            precond_modes=128,
        )

    def make_exact(cg_iters):
        return darcy.make_batched_misfit(
            aux, y, 0.002, cg_iters=cg_iters, precond="dst_trunc",
            precond_modes=256,
        )

    # (surr_iters, exact_iters); first = shipping baseline. Pass combos as
    # "s,e" argv pairs to run a chunk (remote Mosaic compiles are ~65 s per
    # program and the persistent cache misses for these kernels, so a full
    # sweep overruns one timeout window); the baseline row (with posterior
    # stats for the parity gate) persists in darcy64_da_mxu_base.json.
    import os

    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    else:
        combos = [(12, 16), (8, 16), (6, 16)]
    BASE = "benchmarks/darcy64_da_mxu_base.json"
    rows = []
    if os.path.exists(BASE):
        with open(BASE) as f:
            rows.append(json.load(f))
        log(f"loaded baseline from {BASE}")
    else:
        combos = [(12, 24)] + combos
    surr_cache, exact_cache = {}, {}
    pos0 = prior.sample(jax.random.key(3), (N_CHAINS,))
    for s_it, e_it in combos:
        surr = surr_cache.setdefault(s_it, make_surr(s_it))
        phi_e = exact_cache.setdefault(e_it, make_exact(e_it))

        def da(pos, seed, n_steps):
            return fused_da_pcn_chain(
                phi_e, surr, pos, pm, ps, DA_BETA, seed,
                n_steps=n_steps, subchain_len=DA_K, block_chains=BLOCK)

        t0 = time.time()
        pos, _, _ = da(pos0, 11, 30)  # burn + compile
        np.asarray(pos)
        compile_s = time.time() - t0

        reps = []
        for rep in range(4):
            t0 = time.time()
            p = pos
            for j in range(3):
                p, acc, in_acc = da(p, 30 + rep * 3 + j, 50)
            np.asarray(p)
            if rep:
                reps.append(time.time() - t0)
        outer_rate = N_CHAINS * 50 / (min(reps) / 3)

        p, _, series = fused_da_pcn_chain_recorded(
            phi_e, surr, pos, pm, ps, DA_BETA, 900, n_steps=200, thin=1,
            subchain_len=DA_K, block_chains=BLOCK)
        # diagnostics on DEVICE: the 118 MB series never crosses the
        # ~20 MB/s tunnel — only the ESS/mean/std vectors do
        ess = float(np.asarray(diagnostics.ess_per_param(series)).min())
        mean_d = np.asarray(jnp.mean(series, axis=(0, 1)))
        std_d = np.asarray(jnp.std(series.reshape(-1, K), axis=0))
        row = {
            "surr_iters": s_it,
            "exact_iters": e_it,
            "compile_s": round(compile_s, 1),
            "outer_steps_per_s": round(outer_rate),
            "outer_accept": round(float(np.asarray(acc).mean()), 4),
            "inner_accept": round(float(np.asarray(in_acc).mean()), 4),
            "ess_per_outer_step_chain": round(ess / (N_CHAINS * 200), 5),
            "ess_per_s": round(ess / (N_CHAINS * 200) * outer_rate, 1),
            "post_mean": mean_d.tolist(),
            "post_std": std_d.tolist(),
        }
        rows.append(row)
        log(json.dumps({k: v for k, v in row.items()
                        if k not in ("post_mean", "post_std")}))
        if (s_it, e_it) == (12, 24) and not os.path.exists(BASE):
            with open(BASE, "w") as f:
                json.dump(row, f)

    base = rows[0]
    for r in rows[1:]:
        r["max_dmean_vs_ship"] = round(float(np.abs(
            np.asarray(r["post_mean"]) - np.asarray(base["post_mean"])
        ).max()), 4)
        r["max_dstd_vs_ship"] = round(float(np.abs(
            np.asarray(r["post_std"]) - np.asarray(base["post_std"])
        ).max()), 4)
        r["speedup_ess_vs_ship"] = round(r["ess_per_s"] / base["ess_per_s"], 3)
        log(f"s{r['surr_iters']}+e{r['exact_iters']}: "
            f"{r['speedup_ess_vs_ship']}x ESS/s, dmean "
            f"{r['max_dmean_vs_ship']}, dstd {r['max_dstd_vs_ship']}")
    for r in rows:
        del r["post_mean"], r["post_std"]
    with open("benchmarks/darcy64_da_mxu.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
