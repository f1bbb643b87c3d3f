"""VPU-issue split for the shipped DA headline kernel (round-5 MFU
follow-up).

BASELINE.md's round-5 MFU account ends with a CLAIM: after the MXU
preconditioner swap, "the next binding resource is VPU vector issue on
the RNG + proposal + 3-iteration stencil algebra". This probe turns the
claim into measured numbers by ablation, with NO product changes — the
fused DA entry point takes arbitrary (d, block) -> (block,) potentials,
so swapping in near-free ones isolates each cost:

  row `ship`      : dst-3 surrogate / dst_trunc-128-12 exact (the
                    shipping darcy_da_fused kernel, k=48 beta=0.35)
  row `free_surr` : same exact stage, surrogate = a near-free quadratic
                    (one (8,64) matvec + reduce; a plain sum-of-squares
                    hits an unimplemented Mosaic "Sublane broadcast"
                    lowering when used as the EXACT potential, so both
                    free rows use the matvec form, ~1 kFLOP ≈ 2% of the
                    dst-3 surrogate's cost) -> the 48-eval surrogate
                    stage cost is ship - free_surr
  row `free_both` : both potentials near-free -> what remains is the
                    DA scaffolding itself: 48x (Box-Muller normal draw +
                    pCN proposal + MH compare/select) + loop overhead
  row `cheapnoise_free_both`: TIMING-ONLY (the chain it runs is NOT a
                    pCN chain — the noise is uniform-shaped, not
                    Gaussian): free_both with xi = sqrt(12)*(u-0.5),
                    same hash count as Box-Muller but zero
                    transcendentals. free_both - cheapnoise isolates
                    the (log,sqrt,cos,sin) share of the scaffold — the
                    ceiling on ANY exact-Gaussian-generator lever.
  row `erfinv_ship`: the shipped potentials with the normals drawn via
                    xi = sqrt(2)*erfinv(2u-1) instead of Box-Muller —
                    still exactly N(0,1) (both are exact float
                    transforms of the same uniform generator), one
                    transcendental per normal instead of the shared
                    (log,sqrt,cos,sin) quadruple per pair. Measures
                    whether Mosaic's erf_inv lowering beats two
                    polynomial transcendentals + sqrt per pair.

The chain statistics of the `free_*` rows are meaningless (the MH logic
runs against garbage potentials) but every op still executes — selects
are branchless — so the RATES are the real per-component costs.

Writes benchmarks/da_vpu_split.json with the derived per-outer-step
cost decomposition in microseconds per chain-outer-step.
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
    from ip_mcmc_tpu import distributions
    from ip_mcmc_tpu.configs import _darcy_coarse_surrogate
    from ip_mcmc_tpu.models import darcy
    from ip_mcmc_tpu.ops import fused_da_pcn_chain
    from ip_mcmc_tpu.ops import fused_mcmc as fm

    NOISE = 0.002
    N_CHAINS = 4096
    BLOCK = 512
    DA_K, DA_BETA = 48, 0.35
    N_STEPS = 100

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
    surr_dst3 = _darcy_coarse_surrogate(prior, yj, cg_iters=3,
                                        precond="dst_trunc")

    # A bare 0.5*sum(x*x, axis=0) fails to compile when used as the EXACT
    # potential (Mosaic: "Not implemented: Sublane broadcast"); routing it
    # through a tiny (8,64) matvec — the same shape class as the real
    # misfits' observation operator — avoids the degenerate lowering at
    # ~1 kFLOP. Two distinct weight matrices so the two traced potentials
    # can't CSE into one.
    W_a = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 64)), jnp.float32) * 0.1
    W_b = W_a * 1.0001

    def free_pot_a(x):
        y = W_a @ x
        return 0.5 * jnp.sum(y * y, axis=0)

    def free_pot_b(x):
        y = W_b @ x
        return 0.5 * jnp.sum(y * y, axis=0)

    def altnoise_da_builder(subchain_len, noise):
        """Probe-local copy of the DA step logic with the noise draw
        swapped; rand_n (Box-Muller) is ignored. noise="erfinv": exactly
        N(0,1) via sqrt(2)*erfinv(2u-1). noise="cheap": uniform-shaped
        (TIMING ONLY — not a valid pCN chain), same hash count, zero
        transcendentals. Only the generator differs from
        ops.fused_mcmc._make_da_pcn_step_builder."""
        k = int(subchain_len)

        def builder(pots, beta, mean, scale):
            pot_exact, pot_surr = pots
            contraction = jnp.sqrt(1.0 - beta * beta)
            sqrt2 = jnp.float32(np.sqrt(2.0))

            if noise == "erfinv":
                def draw_noise(rand_u, shape, tag):
                    u = rand_u(shape, tag)
                    return sqrt2 * jax.lax.erf_inv(2.0 * u - 1.0)
            else:  # "cheap": uniform-shaped, TIMING ONLY (not Gaussian)
                sqrt12 = jnp.float32(np.sqrt(12.0))

                def draw_noise(rand_u, shape, tag):
                    return sqrt12 * (rand_u(shape, tag) - 0.5)

            def init(pos):
                block = pos.shape[1]
                return (pos, pot_exact(pos), pot_surr(pos),
                        jnp.zeros((1, block), jnp.float32),
                        jnp.float32(0.0))

            def step(carry, rand_n, rand_u):
                pos0, phi0, surr0, in_acc, cnt = carry
                m = mean[:, None]
                s = scale[:, None]
                pos, surr = pos0, surr0
                for j in range(k):
                    xi = s * draw_noise(rand_u, pos.shape, 4 * j)
                    prop = m + contraction * (pos - m) + beta * xi
                    surr_prop = pot_surr(prop)
                    log_u = jnp.log(
                        rand_u((1, pos.shape[1]), 4 * j + 2))[0]
                    take = log_u < (surr - surr_prop)
                    in_acc = in_acc + take[None, :].astype(jnp.float32)
                    pos = jnp.where(take[None, :], prop, pos)
                    surr = jnp.where(take, surr_prop, surr)
                phi_end = pot_exact(pos)
                log_ratio = (phi0 - phi_end) - (surr0 - surr)
                log_ratio = jnp.where(
                    jnp.isnan(log_ratio), -jnp.inf, log_ratio)
                log_u = jnp.log(rand_u((1, pos.shape[1]), 4 * k + 2))[0]
                accept = log_u < log_ratio
                acc2 = accept[None, :]
                return (jnp.where(acc2, pos, pos0),
                        jnp.where(accept, phi_end, phi0),
                        jnp.where(accept, surr, surr0),
                        in_acc, cnt + 1.0), acc2

            return init, step

        builder.extra_out = lambda carry: carry[3] / jnp.maximum(
            carry[4] * k, 1.0)
        return builder

    params = [jnp.float32(DA_BETA), jnp.asarray(pm, jnp.float32),
              jnp.asarray(ps, jnp.float32)]

    def make_altnoise_fn(pots, noise):
        # jit-wrapped like the library entry points — a bare _run_fused
        # call re-traces per launch (~seconds), which a first version of
        # this probe mistook for kernel cost
        import functools

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def f(pos, seed, n_steps):
            return fm._run_fused(
                altnoise_da_builder(DA_K, noise), pots, pos, params, seed,
                n_steps, BLOCK)

        return f

    alt_cheap = make_altnoise_fn((free_pot_a, free_pot_b), "cheap")
    alt_erfinv = make_altnoise_fn((phi_exact, surr_dst3), "erfinv")

    variants = {
        "ship": lambda pos, seed, n: fused_da_pcn_chain(
            phi_exact, surr_dst3, pos, pm, ps, DA_BETA, seed,
            n_steps=n, subchain_len=DA_K, block_chains=BLOCK),
        "free_surr": lambda pos, seed, n: fused_da_pcn_chain(
            phi_exact, free_pot_b, pos, pm, ps, DA_BETA, seed,
            n_steps=n, subchain_len=DA_K, block_chains=BLOCK),
        "free_both": lambda pos, seed, n: fused_da_pcn_chain(
            free_pot_a, free_pot_b, pos, pm, ps, DA_BETA, seed,
            n_steps=n, subchain_len=DA_K, block_chains=BLOCK),
        "cheapnoise_free_both": lambda pos, seed, n: alt_cheap(
            pos, seed, n_steps=n),
        "erfinv_ship": lambda pos, seed, n: alt_erfinv(
            pos, seed, n_steps=n),
    }

    pos0 = prior.sample(jax.random.key(3), (N_CHAINS,))
    rows = {}
    for name, fn in variants.items():
        try:
            t0 = time.time()
            pos, acc, in_acc = fn(pos0, 11, 20)
            np.asarray(pos)
            compile_s = time.time() - t0
        except Exception as e:  # Mosaic may lack erf_inv
            log(f"{name}: SKIPPED ({type(e).__name__}: {e})")
            rows[name] = {"skipped": str(e)[:200]}
            continue
        reps = []
        for rep in range(4):
            t0 = time.time()
            p = pos
            for j in range(3):
                p, acc, in_acc = fn(p, 30 + rep * 3 + j, N_STEPS)
            np.asarray(p)
            if rep:
                reps.append(time.time() - t0)
        outer_rate = N_CHAINS * N_STEPS / (min(reps) / 3)
        us = 1e6 / outer_rate  # us per chain-outer-step
        rows[name] = {
            "outer_steps_per_s": round(outer_rate),
            "us_per_chain_outer_step": round(us, 4),
            "outer_accept": round(float(np.asarray(acc).mean()), 4),
            "inner_accept": round(float(np.asarray(in_acc).mean()), 4),
            "compile_s": round(compile_s, 1),
        }
        log(f"{name}: {outer_rate:,.0f} outer steps/s "
            f"({us:.4f} us/chain-step)  acc {rows[name]['outer_accept']}")

    out = {"rows": rows}
    if all(k in rows and "skipped" not in rows[k]
           for k in ("ship", "free_surr", "free_both")):
        t_ship = rows["ship"]["us_per_chain_outer_step"]
        t_fs = rows["free_surr"]["us_per_chain_outer_step"]
        t_fb = rows["free_both"]["us_per_chain_outer_step"]
        out["split_us_per_chain_outer_step"] = {
            "surrogate_stage_48_evals": round(t_ship - t_fs, 4),
            "exact_eval": round(t_fs - t_fb, 4),
            "rng_proposal_mh_scaffold": round(t_fb, 4),
            "total": round(t_ship, 4),
        }
        out["split_fraction"] = {
            "surrogate_stage": round((t_ship - t_fs) / t_ship, 3),
            "exact_eval": round((t_fs - t_fb) / t_ship, 3),
            "rng_proposal_mh_scaffold": round(t_fb / t_ship, 3),
        }
        log("split (us/chain-outer-step): "
            + json.dumps(out["split_us_per_chain_outer_step"]))
        log("fractions: " + json.dumps(out["split_fraction"]))
    if ("cheapnoise_free_both" in rows and "skipped" not in
            rows["cheapnoise_free_both"] and "free_both" in rows
            and "skipped" not in rows["free_both"]):
        dt = (rows["free_both"]["us_per_chain_outer_step"]
              - rows["cheapnoise_free_both"]["us_per_chain_outer_step"])
        out["boxmuller_transcendentals_us"] = round(dt, 4)
        out["boxmuller_transcendentals_fraction_of_ship"] = round(
            dt / rows["ship"]["us_per_chain_outer_step"], 3)
        out["exact_gaussian_lever_ceiling_x"] = round(
            rows["ship"]["us_per_chain_outer_step"]
            / (rows["ship"]["us_per_chain_outer_step"] - dt), 3)
        log(f"Box-Muller transcendental share: {dt:.4f} us "
            f"({out['boxmuller_transcendentals_fraction_of_ship']:.1%} of "
            f"ship) -> any exact-Gaussian lever ceiling "
            f"{out['exact_gaussian_lever_ceiling_x']}x")
    if "erfinv_ship" in rows and "skipped" not in rows["erfinv_ship"]:
        out["erfinv_vs_boxmuller_ship"] = round(
            rows["ship"]["us_per_chain_outer_step"]
            / rows["erfinv_ship"]["us_per_chain_outer_step"], 3)
        log(f"erfinv ship speedup: {out['erfinv_vs_boxmuller_ship']}x")
    with open("benchmarks/da_vpu_split.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
