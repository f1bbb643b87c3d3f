"""Kernel benchmark matrix: every fused Pallas kernel on the SAME Darcy
posterior (BASELINE config 4 geometry), one chip.

Prints one JSON line per kernel: steps/s, ESS/s (multi-chain Geyer on a
recorded series from the same kernel), acceptance. The apples-to-apples
view of what each sampler buys: pCN (cold vs warm-started CG), MALA
(adjoint gradients in-kernel), elliptical slice (tuning-free).

Run: python benchmarks/kernel_matrix.py [--n-chains 4096] [--steps 400]
"""

import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chains", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")

    from ip_mcmc_tpu import diagnostics, distributions, ops
    from ip_mcmc_tpu.models import darcy

    NOISE, K = 0.002, 64
    fwd, aux = darcy.make_darcy_forward(n_grid=16, n_modes_per_dim=8)
    noise = distributions.DiagGaussian(
        mean=jnp.zeros(16), scale=NOISE * jnp.ones(16)
    )
    u_true = jax.random.normal(jax.random.key(300), (K,))
    y = fwd(u_true) + noise.sample(jax.random.key(301))

    phi_cold = darcy.make_batched_misfit(aux, y, NOISE)
    phi_diff = darcy.make_batched_misfit(aux, y, NOISE, differentiable=True)
    phi_warm, aux_dim = darcy.make_batched_misfit_warm(
        aux, y, NOISE, cg_iters=6, precond="dst"  # the headline configuration
    )
    pag, mala_aux = darcy.make_batched_misfit_mala_warm(
        aux, y, NOISE, cg_iters=6, precond="dst"
    )
    phi_post = lambda U: phi_diff(U) + 0.5 * jnp.sum(U * U, axis=0)

    pm, ps = np.zeros(K), np.ones(K)
    n, steps, block = args.n_chains, args.steps, args.block
    pos0 = jax.random.normal(jax.random.key(1), (n, K)) * 0.3

    def prior_kw(d):
        d.update(prior_mean=pm, prior_scale=ps)
        return d

    kernels = {
        "pcn_cold48": (ops.fused_pcn_chain, ops.fused_pcn_chain_recorded,
                       phi_cold, prior_kw(dict(beta=0.08))),
        "pcn_warm_dst6": (ops.fused_pcn_chain_warm, ops.fused_pcn_chain_warm_recorded,
                          phi_warm, prior_kw(dict(beta=0.08, aux_dim=aux_dim))),
        "mala_adjoint": (ops.fused_mala_chain, ops.fused_mala_chain_recorded,
                         phi_post, dict(step_size=0.012)),
        "mala_warm_dst6": (ops.fused_mala_chain_warm,
                           ops.fused_mala_chain_warm_recorded, pag,
                           prior_kw(dict(step_size=0.012, aux_dim=mala_aux))),
        "ess_slice": (ops.fused_ess_chain, ops.fused_ess_chain_recorded,
                      phi_cold, prior_kw(dict(max_shrink=6))),
    }

    for name, (chain, chain_rec, phi, kw) in kernels.items():
        # burn-in AND warm the exact timed program (n_steps is a static arg —
        # a different value would recompile inside the timing window)
        pos, _ = chain(phi, pos0, seed=1, n_steps=steps, block_chains=block, **kw)
        jax.block_until_ready(pos)
        t0 = time.time()
        out, acc = chain(phi, pos, seed=2, n_steps=steps, block_chains=block, **kw)
        jax.block_until_ready(out)
        dt = time.time() - t0
        steps_per_s = n * steps / dt

        _, _, series = chain_rec(
            phi, pos, seed=3, n_steps=steps, thin=1, block_chains=block, **kw
        )
        jax.block_until_ready(series)
        ess = float(np.asarray(diagnostics.ess_per_param(series)).min())
        ess_per_step_chain = ess / (n * steps)
        print(json.dumps({
            "kernel": name,
            "steps_per_s": round(steps_per_s),
            "min_ess_per_1k_steps": round(1000 * ess_per_step_chain / n, 6),
            "ess_per_s": round(ess_per_step_chain * steps_per_s, 1),
            "accept": round(float(np.asarray(acc).mean()), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
