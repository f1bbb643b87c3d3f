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
for block, iters, modes in [(64, 8, 256), (128, 8, 256), (256, 8, 256), (128, 8, 128), (128, 4, 256)]:
    warm, aux_dim = darcy.make_batched_misfit_warm(aux, y, 0.002, cg_iters=iters, precond='dst_trunc', precond_modes=modes)
    pos = jax.random.normal(jax.random.key(5), (1024, K))*0.3
    f, a = fused_pcn_chain_warm(warm, pos, prior_mean=np.zeros(K), prior_scale=np.ones(K), beta=0.06, seed=7, n_steps=4, aux_dim=aux_dim, block_chains=block)
    jax.block_until_ready(f)
    t0=time.perf_counter()
    f, a = fused_pcn_chain_warm(warm, pos, prior_mean=np.zeros(K), prior_scale=np.ones(K), beta=0.06, seed=7, n_steps=400, aux_dim=aux_dim, block_chains=block)
    jax.block_until_ready(f); dt=time.perf_counter()-t0
    print(f"block {block} iters {iters} modes {modes}: {1024*400/dt:,.0f} steps/s", flush=True)
