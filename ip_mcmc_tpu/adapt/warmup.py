"""Warmup drivers: per-kernel adaptation loops, frozen after warmup.

BASELINE.json: "step-size/covariance adaptation ... via cross-host
collectives". Design (SURVEY.md §7.2 step 7, §7.3 item 4):

- the acceptance signal and the proposal covariance / mass matrix are pooled
  ACROSS CHAINS each step — plain jnp reductions over the (sharded) chain
  axis, which XLA lowers to psum/all-gather over ICI/DCN;
- kernel hyper-parameters live in the scan carry; the kernel is re-built
  inside the scan body closure over traced values (cheap — it's just a
  closure), so the whole warmup is ONE compiled program;
- adaptation is frozen after warmup to preserve detailed balance — the
  returned hyper-parameters are constants for the sampling phase.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ip_mcmc_tpu.adapt import dual_averaging as da
from ip_mcmc_tpu.driver import chain_keys
from ip_mcmc_tpu.kernels import hmc, mala, nuts, pcn, rwm


def _pooled_cov(positions, jitter=1e-6):
    """Cross-chain empirical covariance (the cross-section estimator —
    thousands of chains make time-averaging unnecessary)."""
    mean = jnp.mean(positions, axis=0)
    centered = positions - mean
    cov = centered.T @ centered / (positions.shape[0] - 1)
    return cov + jitter * jnp.eye(cov.shape[0], dtype=cov.dtype)


@partial(jax.jit, static_argnames=("log_density_fn", "num_steps", "adapt_cov"))
def warmup_rwm(
    log_density_fn,
    state,
    base_key,
    num_steps=500,
    initial_step_size=0.5,
    target_accept=0.234,
    adapt_cov=True,
):
    """Adapt RWM step size (dual averaging on pooled acceptance) and dense
    proposal covariance (cross-chain). Returns (state, step_size, chol)."""
    n_chains, dim = state.position.shape

    def body(carry, step_idx):
        st, das, chol = carry
        kernel = rwm.build_kernel(
            log_density_fn, step_size=da.current(das), scale=chol
        )
        keys = chain_keys(base_key, step_idx, n_chains)
        st, info = jax.vmap(kernel)(keys, st)
        das = da.update(das, jnp.mean(info.accept_prob), target=target_accept)
        if adapt_cov:
            chol = jnp.linalg.cholesky(_pooled_cov(st.position))
        return (st, das, chol), None

    chol0 = jnp.eye(dim, dtype=state.position.dtype)
    (state, das, chol), _ = jax.lax.scan(
        body, (state, da.init(initial_step_size), chol0), jnp.arange(num_steps)
    )
    return state, da.final(das), chol


@partial(jax.jit, static_argnames=("potential_fn", "num_steps"))
def warmup_pcn(
    potential_fn,
    prior,
    state,
    base_key,
    num_steps=500,
    initial_beta=0.2,
    target_accept=0.234,
):
    """Adapt pCN β on pooled acceptance. β = sigmoid(z) stays in (0, 1)."""
    n_chains = state.position.shape[0]
    z0 = jnp.log(initial_beta / (1.0 - initial_beta))

    def body(carry, step_idx):
        st, das = carry
        beta = jax.nn.sigmoid(das.log_x)  # reuse DA state in logit space
        kernel = pcn.build_kernel(potential_fn, prior, beta=beta)
        keys = chain_keys(base_key, step_idx, n_chains)
        st, info = jax.vmap(kernel)(keys, st)
        das = da.update(das, jnp.mean(info.accept_prob), target=target_accept)
        return (st, das), None

    das0 = da.init(1.0)
    das0 = da.DAState(
        log_x=z0, log_x_avg=z0, h_avg=das0.h_avg, t=das0.t, mu=z0
    )
    (state, das), _ = jax.lax.scan(
        body, (state, das0), jnp.arange(num_steps)
    )
    return state, jax.nn.sigmoid(das.log_x_avg)


def _variance_inv_mass(positions, jitter=1e-6):
    return 1.0 / (jnp.var(positions, axis=0) + jitter)


@partial(jax.jit, static_argnames=("log_density_fn", "num_steps"))
def map_localize(log_density_fn, positions, num_steps=200, learning_rate=0.05):
    """Move each chain toward a posterior mode by vmapped Adam ascent on
    log π before MCMC warmup. For concentrated / mildly multimodal
    posteriors (sharp ODE misfits), prior-initialized chains otherwise strand
    in bad basins and inflate R̂ (runner uses this for gradient kernels)."""
    import optax

    opt = optax.adam(learning_rate)

    def ascend(p0):
        os0 = opt.init(p0)

        def body(carry, _):
            p, os = carry
            g = jax.grad(log_density_fn)(p)
            updates, os = opt.update(jax.tree_util.tree_map(jnp.negative, g), os)
            return (optax.apply_updates(p, updates), os), None

        (p, _), _ = jax.lax.scan(body, (p0, os0), None, length=num_steps)
        return p

    return jax.vmap(ascend)(positions)


@partial(jax.jit, static_argnames=("log_density_fn", "num_steps"))
def warmup_mala(
    log_density_fn,
    state,
    base_key,
    num_steps=500,
    initial_step_size=0.05,
    target_accept=0.574,
):
    """Adapt MALA step size (dual averaging) + DENSE preconditioner Σ = LLᵀ
    from the cross-chain covariance. Returns (state, step_size, chol)."""
    n_chains, dim = state.position.shape

    def body(carry, step_idx):
        st, das, chol = carry
        kernel = mala.build_kernel(
            log_density_fn, step_size=da.current(das), precond=chol
        )
        keys = chain_keys(base_key, step_idx, n_chains)
        st, info = jax.vmap(kernel)(keys, st)
        das = da.update(das, jnp.mean(info.accept_prob), target=target_accept)
        chol = jnp.linalg.cholesky(_pooled_cov(st.position))
        return (st, das, chol), None

    (state, das, chol), _ = jax.lax.scan(
        body,
        (state, da.init(initial_step_size), jnp.eye(dim, dtype=state.position.dtype)),
        jnp.arange(num_steps),
    )
    return state, da.final(das), chol


@partial(
    jax.jit,
    static_argnames=("log_density_fn", "num_steps", "num_integration_steps"),
)
def warmup_hmc(
    log_density_fn,
    state,
    base_key,
    num_steps=300,
    num_integration_steps=8,
    initial_step_size=0.1,
    target_accept=0.8,
):
    """Adapt HMC step size + diagonal mass from cross-chain variances.
    Returns (state, step_size, inv_mass)."""
    n_chains, dim = state.position.shape

    def body(carry, step_idx):
        st, das, inv_mass = carry
        kernel = hmc.build_kernel(
            log_density_fn,
            step_size=da.current(das),
            num_integration_steps=num_integration_steps,
            inv_mass=inv_mass,
        )
        keys = chain_keys(base_key, step_idx, n_chains)
        st, info = jax.vmap(kernel)(keys, st)
        das = da.update(das, jnp.mean(info.accept_prob), target=target_accept)
        inv_mass = _variance_inv_mass(st.position)
        return (st, das, inv_mass), None

    (state, das, inv_mass), _ = jax.lax.scan(
        body,
        (state, da.init(initial_step_size), jnp.ones(dim, state.position.dtype)),
        jnp.arange(num_steps),
    )
    return state, da.final(das), inv_mass


@partial(jax.jit, static_argnames=("log_density_fn", "num_steps", "max_depth"))
def warmup_nuts(
    log_density_fn,
    state,
    base_key,
    num_steps=300,
    max_depth=8,
    initial_step_size=0.1,
    target_accept=0.8,
):
    """Adapt NUTS step size + diagonal mass. Returns (state, eps, inv_mass)."""
    n_chains, dim = state.position.shape

    def body(carry, step_idx):
        st, das, inv_mass = carry
        kernel = nuts.build_kernel(
            log_density_fn,
            step_size=da.current(das),
            max_depth=max_depth,
            inv_mass=inv_mass,
        )
        keys = chain_keys(base_key, step_idx, n_chains)
        st, info = jax.vmap(kernel)(keys, st)
        das = da.update(das, jnp.mean(info.accept_prob), target=target_accept)
        inv_mass = _variance_inv_mass(st.position)
        return (st, das, inv_mass), None

    (state, das, inv_mass), _ = jax.lax.scan(
        body,
        (state, da.init(initial_step_size), jnp.ones(dim, state.position.dtype)),
        jnp.arange(num_steps),
    )
    return state, da.final(das), inv_mass
