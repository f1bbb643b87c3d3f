"""Round-4 frontier: 2-level delayed acceptance on the LARGE-GRID Darcy
config (64² cells, 144-dim KL — `darcy64_pcn_warm`'s problem).

The darcy16 result (benchmarks/darcy_da_fused.py: 8.75× the warm kernel,
exact posterior) should transfer here with a LARGER cost ratio: the fine
model is a 4096-cell dst_trunc-PCG solve, while a calibrated 32²-grid
surrogate costs ~1/5 per stencil pass and a 16²-grid one ~1/20. Rows:

  - warm dst_trunc-4 @64² (shipping darcy64_pcn_warm kernel) — the bar
  - fused 2-level DA: calibrated {32², 16²} surrogate × (k, β)

All DA rows sample the exact cold dst_trunc-24 posterior. ESS protocol
identical to benchmarks/burgers_da.py. VMEM pressure: the DA kernel holds
BOTH grids' solves per block — block_chains at the Pallas lane minimum
(128; smaller blocks fail mosaic's (8, 128) tiling requirement).

Usage: python -m benchmarks.darcy64_da [--quick] [--out f]
"""

import argparse
import json
import sys

import numpy as np

from benchmarks.burgers_da import log, measure


def build_surrogate(prior, y, n_coarse, cg_iters, precond, modes):
    """Calibrated coarse-grid batched misfit vs the 64² fine model (same
    144-mode whitened KL space; obs mapped to nearest coarse cells)."""
    import jax
    import jax.numpy as jnp

    from ip_mcmc_tpu.models import darcy

    n_fine = 64
    fwd_f, aux_f = darcy.make_darcy_forward(
        n_grid=n_fine, n_modes_per_dim=12, alpha=2.0, field_scale=10.0,
        cg_iters=24, precond="dst",
    )
    obs_f = np.asarray(aux_f["obs_indices"])
    i_f, j_f = obs_f // n_fine, obs_f % n_fine

    def to_coarse(i):
        return np.clip(
            np.round((i + 0.5) * n_coarse / n_fine - 0.5).astype(int),
            0, n_coarse - 1,
        )

    obs_c = to_coarse(i_f) * n_coarse + to_coarse(j_f)
    fwd_c, aux_c = darcy.make_darcy_forward(
        n_grid=n_coarse, n_modes_per_dim=12, alpha=2.0, field_scale=10.0,
        obs_indices=obs_c, cg_iters=60, precond="dst",
    )
    U_cal = prior.sample(jax.random.key(402), (32,))
    d = np.asarray(jax.vmap(fwd_f)(U_cal) - np.asarray(jax.vmap(fwd_c)(U_cal)))
    y_surr = np.asarray(y) - d.mean(axis=0)
    scale = np.sqrt(0.002**2 + d.std(axis=0) ** 2).astype(np.float32)
    phi_c = darcy.make_batched_misfit(
        aux_c, y_surr, scale, cg_iters=cg_iters, precond=precond,
        precond_modes=modes,
    )
    cost = (n_coarse**2 * cg_iters) / (64**2 * 24)
    return phi_c, cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="benchmarks/darcy64_da.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ip_mcmc_tpu import configs, ops
    from ip_mcmc_tpu.models import darcy

    p = configs.build("darcy64_pcn_warm")
    NOISE, BETA0 = 0.002, 0.06
    n_chains = 256 if args.quick else 1024
    n_time = 100 if args.quick else 200
    n_rec = 100 if args.quick else 300
    block = 128
    pm, ps = np.zeros(144), np.ones(144)
    yj = jnp.asarray(p.data, jnp.float32)

    _, aux64 = darcy.make_darcy_forward(
        n_grid=64, n_modes_per_dim=12, alpha=2.0, field_scale=10.0,
        cg_iters=24, precond="dst",
    )
    phi_warm, aux_dim = darcy.make_batched_misfit_warm(
        aux64, yj, NOISE, cg_iters=4, precond="dst_trunc",
        precond_modes=256)
    phi_exact = darcy.make_batched_misfit(
        aux64, yj, NOISE, cg_iters=24, precond="dst_trunc",
        precond_modes=256)

    positions = p.init_positions(jax.random.key(0), n_chains)
    rows = []

    def warm_launch(pos, seed, n):
        return ops.fused_pcn_chain_warm(
            phi_warm, pos, prior_mean=pm, prior_scale=ps, beta=BETA0,
            seed=seed, n_steps=n, aux_dim=aux_dim, block_chains=block)

    def warm_rec(pos, seed, n):
        return ops.fused_pcn_chain_warm_recorded(
            phi_warm, pos, prior_mean=pm, prior_scale=ps, beta=BETA0,
            seed=seed, n_steps=n, thin=1, aux_dim=aux_dim,
            block_chains=block)

    rows.append(measure(warm_launch, warm_rec, positions, n_time, n_rec,
                        "warm dst_trunc-4 @64c (headline)", n_launches=6))

    surr = {}
    for n_c, iters, precond, modes in ((32, 12, "dst_trunc", 128),
                                       (16, 10, "dst_trunc", 64)):
        surr[n_c] = build_surrogate(p.prior, p.data, n_c, iters, precond,
                                    modes)

    # pass-2: 32c rows rose monotonically to (24, 0.3) = 9.52x with outer
    # acceptance still 0.835 — extend k/beta; 16c measured too crude
    # (outer accept ~0.5 but the accepted endpoints cluster near the
    # start: ESS collapses — same selection pathology as the darcy16
    # DA3 middle probes).
    grid = [(32, 8, 0.15), (32, 16, 0.25), (32, 24, 0.3),
            (16, 16, 0.25), (16, 32, 0.3),
            (32, 32, 0.3), (32, 48, 0.35), (32, 32, 0.4)]
    if args.quick:
        grid = [(32, 8, 0.15)]
    for n_c, k, beta in grid:
        s_c, cost = surr[n_c]

        def da_launch(pos, seed, n, _k=k, _b=beta, _s=s_c):
            return ops.fused_da_pcn_chain(
                phi_exact, _s, pos, pm, ps, _b, seed, n_steps=n,
                subchain_len=_k, block_chains=block)

        def da_rec(pos, seed, n, _k=k, _b=beta, _s=s_c):
            return ops.fused_da_pcn_chain_recorded(
                phi_exact, _s, pos, pm, ps, _b, seed, n_steps=n,
                thin=1, subchain_len=_k, block_chains=block)

        row = measure(da_launch, da_rec, positions,
                      max(n_time // max(k // 2, 1), 20), n_rec,
                      f"DA k={k} b={beta} surr {n_c}c", n_launches=2)
        row["surrogate_cost_ratio"] = cost
        row.update(subchain_len=k, beta=beta, surr_cells=n_c)
        rows.append(row)

    bar = rows[0]["ess_per_s"]
    for r in rows:
        r["ess_speedup_vs_warm_headline"] = r["ess_per_s"] / bar
    with open(args.out, "w") as fh:
        json.dump({"n_chains": n_chains, "rows": rows}, fh, indent=1)
    log("written:", args.out)
    best = max(rows[1:], key=lambda r: r["ess_per_s"])
    log(f"best DA: {best['label']} -> "
        f"{best['ess_speedup_vs_warm_headline']:.2f}x the warm headline")


if __name__ == "__main__":
    main()
