"""Whitened-proposal specialization probe for the fused DA kernel.

The flagship DA configs run in WHITENED coordinates (prior mean 0,
scale 1 — configs pass literal zeros/ones), but the fused step builder
loads mean/scale from VMEM refs and spends per-inner-step VPU ops on
`s * xi` and `m + contraction*(pos - m)` that are identities there.
Mosaic cannot fold them (runtime refs). This probe times a probe-local
builder with the identities elided — algebraically AND bitwise identical
when mean=0/scale=1 (x-0 == x, 1*x == x, 0+x == x in IEEE f32 for
finite x) — against the shipped kernel, real potentials, same protocol
as benchmarks/da_vpu_split.py. If the win clears ~5% the `whitened`
static flag is worth its product-surface cost; below that, document and
skip.

Writes benchmarks/da_whitened_probe.json.
"""

from __future__ import annotations

import functools
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
    surr = _darcy_coarse_surrogate(prior, yj, cg_iters=3,
                                   precond="dst_trunc")

    def whitened_da_builder(subchain_len):
        """ops.fused_mcmc._make_da_pcn_step_builder with the mean/scale
        identities elided (valid only for mean=0, scale=1 — bitwise-equal
        there; the probe asserts it)."""
        k = int(subchain_len)

        def builder(pots, beta, mean, scale):
            pot_exact, pot_surr = pots
            contraction = jnp.sqrt(1.0 - beta * beta)

            def init(pos):
                block = pos.shape[1]
                return (pos, pot_exact(pos), pot_surr(pos),
                        jnp.zeros((1, block), jnp.float32),
                        jnp.float32(0.0))

            def step(carry, rand_n, rand_u):
                pos0, phi0, surr0, in_acc, cnt = carry
                pos, surr = pos0, surr0
                for j in range(k):
                    xi = rand_n(pos.shape, 4 * j)
                    prop = contraction * pos + beta * xi
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

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def da_whitened(pos, seed, n_steps):
        return fm._run_fused(
            whitened_da_builder(DA_K), (phi_exact, surr), pos, params,
            seed, n_steps, BLOCK)

    variants = {
        "ship": lambda pos, seed, n: fused_da_pcn_chain(
            phi_exact, surr, pos, pm, ps, DA_BETA, seed,
            n_steps=n, subchain_len=DA_K, block_chains=BLOCK),
        "whitened": lambda pos, seed, n: da_whitened(pos, seed, n_steps=n),
    }

    pos0 = prior.sample(jax.random.key(3), (N_CHAINS,))
    rows = {}
    finals = {}
    for name, fn in variants.items():
        t0 = time.time()
        pos, acc, in_acc = fn(pos0, 11, 40)
        np.asarray(pos)
        compile_s = time.time() - t0
        finals[name] = np.asarray(pos)
        reps = []
        for rep in range(4):
            t0 = time.time()
            p = pos
            for j in range(3):
                p, acc, in_acc = fn(p, 30 + rep * 3 + j, 100)
            np.asarray(p)
            if rep:
                reps.append(time.time() - t0)
        outer_rate = N_CHAINS * 100 / (min(reps) / 3)
        rows[name] = {
            "outer_steps_per_s": round(outer_rate),
            "us_per_chain_outer_step": round(1e6 / outer_rate, 4),
            "outer_accept": round(float(np.asarray(acc).mean()), 4),
            "compile_s": round(compile_s, 1),
        }
        log(f"{name}: {outer_rate:,.0f} outer steps/s  "
            f"acc {rows[name]['outer_accept']}")

    bitwise = bool(np.array_equal(finals["ship"], finals["whitened"]))
    speedup = (rows["ship"]["us_per_chain_outer_step"]
               / rows["whitened"]["us_per_chain_outer_step"])
    out = {"rows": rows, "bitwise_equal_at_40_steps": bitwise,
           "whitened_speedup": round(speedup, 4)}
    log(f"bitwise equal: {bitwise}; speedup {speedup:.3f}x")
    with open("benchmarks/da_whitened_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
