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
    ("dst8x256",  dict(cg_iters=8, precond='dst_trunc', precond_modes=256), 128),
    ("dst8x128",  dict(cg_iters=8, precond='dst_trunc', precond_modes=128), 128),
    ("dst4x256",  dict(cg_iters=4, precond='dst_trunc', precond_modes=256), 128),
    ("jacobi8",   dict(cg_iters=8), 128),
    ("jacobi16",  dict(cg_iters=16), 128),
]
nch, nsteps = 1024, 400
pos = jax.random.normal(jax.random.key(5), (nch, K))*0.3
# deep-solve reference misfit for warm-state quality
ref, _ = darcy.make_batched_misfit_warm(aux, y, 0.002, cg_iters=200, precond='dst_trunc', precond_modes=256)
for label, kw, block in cases:
    warm, aux_dim = darcy.make_batched_misfit_warm(aux, y, 0.002, **kw)
    def run(steps, seed=7):
        return fused_pcn_chain_warm(warm, pos, prior_mean=np.zeros(K), prior_scale=np.ones(K), beta=0.06, seed=seed, n_steps=steps, aux_dim=aux_dim, block_chains=block)
    try:
        f, a = run(4); jax.block_until_ready(f)
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            f, a = run(nsteps, seed=7+rep)
            jax.block_until_ready(f); times.append(time.perf_counter()-t0)
        rate = nch*nsteps/min(times)
        # warm-state quality: evaluate phi at final positions starting from a
        # 1-step-warm x vs a deep solve; relative phi error is the operative
        # bias entering the MH ratio during the run
        Ub = jnp.asarray(np.asarray(f[:block]).T, jnp.float32)
        x0 = jnp.zeros((n*n, block), jnp.float32)
        _, x_deep = ref(Ub, x0)
        p_w, _ = warm(Ub, x_deep)     # warm config starting from converged x
        p_r, _ = ref(Ub, x_deep)
        err = float(jnp.max(jnp.abs(p_w - p_r) / (1.0 + jnp.abs(p_r))))
        print(f"{label}: {rate:,.0f} steps/s (x{len(times)}: {['%.2f'%t for t in times]})  acc {np.asarray(a).mean():.3f}  warm_phi_rel_err {err:.2e}", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
