"""Burgers warm path: fused delayed-acceptance pCN vs fused plain pCN
(round-2 VERDICT missing #5 — give the reference's headline problem class
the warm-path treatment; target >=3x ESS/s over the cold fused kernel).

Both sides sample the IDENTICAL posterior (the DA exact correction makes
the surrogate-invariant); both ESS estimates use the same multi-chain Geyer
estimator on a recorded series from the same kernel that is timed.

Usage: python benchmarks/burgers_da.py [--quick] [--out f]
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(launch, launch_rec, positions, n_time, n_rec, label):
    """(steps/s from a long timed launch, ESS/step from a recorded one).

    Sync via a device->host transfer of the tiny acceptance row (8 KB), not
    just block_until_ready: one tunneled-backend run measured a 500-step FV
    launch at 0.286 ms (3.6e9 steps/s — physically impossible), i.e. a
    block that returned early. The transfer is an unambiguous barrier; its
    ~1 ms cost is noise on the >=0.5 s timed windows. Median of 3 reps, and
    an absurdity guard re-measures if a rep still implies >1e9 steps/s."""
    import jax

    from ip_mcmc_tpu import diagnostics

    n = positions.shape[0]
    out = launch(positions, 1, n_time)  # compile + burn
    pos = out[0]
    np.asarray(out[1])
    reps = []
    for rep in range(3):
        t0 = time.perf_counter()
        out = launch(pos, 100 + rep, n_time)
        np.asarray(out[1])  # transfer barrier
        dt = time.perf_counter() - t0
        if n * n_time / dt > 1e9:  # tunnel hiccup; re-measure
            log(f"  [{label}] absurd rep discarded: {dt*1e3:.2f} ms")
            continue
        reps.append(dt)
    dt = float(np.median(reps))
    steps_per_s = n * n_time / dt

    rec = launch_rec(pos, 3, n_rec)
    series = rec[-1]
    jax.block_until_ready(series)
    ess = float(np.asarray(diagnostics.ess_per_param(series)).min())
    ess_per_step_chain = ess / (n * n_rec)
    ess_per_s = ess_per_step_chain * steps_per_s
    extra = {}
    if len(out) > 2:
        extra["inner_accept"] = float(np.asarray(out[2]).mean())
    row = {
        "label": label,
        "steps_per_s": steps_per_s,
        "accept": float(np.asarray(out[1]).mean()),
        "min_ess_series": ess,
        "ess_per_s": ess_per_s,
        **extra,
    }
    log(f"{label:28s} {steps_per_s:12,.0f} steps/s  accept "
        f"{row['accept']:.3f}  ESS/s {ess_per_s:10,.1f}"
        + (f"  inner {extra.get('inner_accept', float('nan')):.3f}"
           if extra else ""))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="benchmarks/burgers_da.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from ip_mcmc_tpu import configs, ops

    p = configs.build("burgers_da_pcn")
    n_chains = 512 if args.quick else 2048
    n_time = 200 if args.quick else 2000
    n_rec = 200 if args.quick else 400
    block = 512
    pm, ps = np.asarray(p.prior.mean), np.asarray(p.prior.scale)
    phi, surr = p.batched_potential_fn, p.batched_surrogate_fn
    positions = p.init_positions(jax.random.key(0), n_chains)
    beta = p.kernel_params["beta"]

    rows = []

    def pcn_launch(pos, seed, n):
        return ops.fused_pcn_chain(
            phi, pos, pm, ps, beta, seed, n_steps=n, block_chains=block)

    def pcn_rec(pos, seed, n):
        return ops.fused_pcn_chain_recorded(
            phi, pos, pm, ps, beta, seed, n_steps=n, thin=1,
            block_chains=block)

    rows.append(measure(pcn_launch, pcn_rec, positions, n_time, n_rec,
                        "fused pCN (cold reference)"))

    for k in (4, 6, 8):
        def da_launch(pos, seed, n, _k=k):
            return ops.fused_da_pcn_chain(
                phi, surr, pos, pm, ps, beta, seed, n_steps=n,
                subchain_len=_k, block_chains=block)

        def da_rec(pos, seed, n, _k=k):
            return ops.fused_da_pcn_chain_recorded(
                phi, surr, pos, pm, ps, beta, seed, n_steps=n, thin=1,
                subchain_len=_k, block_chains=block)

        rows.append(measure(da_launch, da_rec, positions,
                            max(n_time // 2, 100), n_rec,
                            f"fused DA-pCN k={k} (coarse 32)"))

    base = rows[0]["ess_per_s"]
    for r in rows:
        r["ess_speedup_vs_cold"] = r["ess_per_s"] / base
    with open(args.out, "w") as fh:
        json.dump({"n_chains": n_chains, "rows": rows}, fh, indent=1)
    log("written:", args.out)
    best = max(rows[1:], key=lambda r: r["ess_per_s"])
    log(f"best DA: {best['label']} -> {best['ess_speedup_vs_cold']:.2f}x "
        f"cold ESS/s")


if __name__ == "__main__":
    main()
