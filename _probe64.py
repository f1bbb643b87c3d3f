import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.ipx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from ip_mcmc_tpu.models import darcy
from ip_mcmc_tpu.ops import fused_pcn_chain_warm
n, nm = 64, 12
K = nm*nm
fwd, aux = darcy.make_darcy_forward(n_grid=n, n_modes_per_dim=nm, alpha=2.0, field_scale=10.0)
u_true = jax.random.normal(jax.random.key(310), (K,))
y = fwd(u_true) + 0.002*jax.random.normal(jax.random.key(311), (16,))
cases = [
    ("base",        dict(cg_iters=8, precond='dst_trunc', precond_modes=256), 128),
    ("block256",    dict(cg_iters=8, precond='dst_trunc', precond_modes=256), 256),
    ("block512",    dict(cg_iters=8, precond='dst_trunc', precond_modes=256), 512),
    ("modes128",    dict(cg_iters=8, precond='dst_trunc', precond_modes=128), 128),
    ("iters4",      dict(cg_iters=4, precond='dst_trunc', precond_modes=256), 128),
    ("jacobi8",     dict(cg_iters=8), 128),
    ("jacobi32",    dict(cg_iters=32), 128),
]
for label, kw, block in cases:
    warm, aux_dim = darcy.make_batched_misfit_warm(aux, y, 0.002, **kw)
    nch = max(1024, block*4)
    pos = jax.random.normal(jax.random.key(5), (nch, K))*0.3
    try:
        f, a = fused_pcn_chain_warm(warm, pos, prior_mean=np.zeros(K), prior_scale=np.ones(K), beta=0.06, seed=7, n_steps=4, aux_dim=aux_dim, block_chains=block)
        jax.block_until_ready(f)
        t0=time.perf_counter()
        f, a = fused_pcn_chain_warm(warm, pos, prior_mean=np.zeros(K), prior_scale=np.ones(K), beta=0.06, seed=7, n_steps=400, aux_dim=aux_dim, block_chains=block)
        jax.block_until_ready(f); dt=time.perf_counter()-t0
        print(f"{label}: block {block} {kw}: {nch*400/dt:,.0f} steps/s  acc {np.asarray(a).mean():.3f}", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
