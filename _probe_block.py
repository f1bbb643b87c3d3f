"""Does a larger chain block buy throughput for the fused warm kernels?

ROADMAP P1: before building HBM-resident CG state with double-buffered DMA
to unlock block 256 at n=64, measure whether block >128 pays at all where
it DOES compile (n=16: blocks 256/512/1024; n=32: blocks 64/128/256).
If the curve is flat past 128-256, the darcy64 VMEM lever is moot.
"""
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from ip_mcmc_tpu import distributions
from ip_mcmc_tpu.models import darcy
from ip_mcmc_tpu.ops import fused_pcn_chain_warm

def bench(n, nm, kw, blocks, nch=4096, nsteps=400, beta=0.08):
    K = nm * nm
    fwd, aux = darcy.make_darcy_forward(n_grid=n, n_modes_per_dim=nm,
                                        alpha=2.0, field_scale=10.0)
    u_true = jax.random.normal(jax.random.key(310), (K,))
    y = fwd(u_true) + 0.002 * jax.random.normal(jax.random.key(311), (16,))
    warm, aux_dim = darcy.make_batched_misfit_warm(aux, y, 0.002, **kw)
    pos = jax.random.normal(jax.random.key(5), (nch, K)) * 0.3
    for block in blocks:
        def run(steps, seed=7):
            return fused_pcn_chain_warm(
                warm, pos, prior_mean=np.zeros(K), prior_scale=np.ones(K),
                beta=beta, seed=seed, n_steps=steps, aux_dim=aux_dim,
                block_chains=block)
        try:
            f, a = run(4); jax.block_until_ready(f)
            times = []
            for rep in range(3):
                t0 = time.perf_counter()
                f, a = run(nsteps, seed=7 + rep)
                jax.block_until_ready(f)
                times.append(time.perf_counter() - t0)
            rate = nch * nsteps / min(times)
            print(f"n={n} block={block:5d}: {rate:,.0f} steps/s "
                  f"(x3: {['%.2f' % t for t in times]})", flush=True)
        except Exception as e:
            print(f"n={n} block={block:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

bench(16, 8, dict(cg_iters=4, precond="dst_trunc", precond_modes=64),
      [256, 512, 1024])
bench(32, 8, dict(cg_iters=6, precond="dst_trunc", precond_modes=128),
      [64, 128, 256])
bench(64, 12, dict(cg_iters=8, precond="dst_trunc", precond_modes=256),
      [128, 256], nch=2048, beta=0.06)
