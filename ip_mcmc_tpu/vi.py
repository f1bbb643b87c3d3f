"""Variational inference backend: ADVI (mean-field and full-rank).

Beyond-reference capability (BASELINE.json lists "VI ... backends"). Cheap
once potentials are grad-capable (SURVEY.md §7.2 step 9): maximize the ELBO

    L(λ) = E_{q_λ}[ log π(u) − log q_λ(u) ]

with the reparameterization trick (u = μ + Lz, z ~ N(0, I)), optax Adam, and
the Monte-Carlo gradient batched over samples AND sharded like chains. The
result doubles as an MCMC warm-start / preconditioner source (the full-rank
L is a ready-made RWM/MALA proposal factor).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ip_mcmc_tpu.utils.struct import pytree_dataclass

# plain float, NOT jnp: a module-level jnp op would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize for any
# process that imports the package before calling it (multi-host CLI)
_LOG_2PI = math.log(2.0 * math.pi)


@pytree_dataclass
class MeanFieldParams:
    mu: jnp.ndarray  # (d,)
    log_sigma: jnp.ndarray  # (d,)


@pytree_dataclass
class FullRankParams:
    mu: jnp.ndarray  # (d,)
    chol_flat: jnp.ndarray  # (d(d+1)/2,) packed lower triangle, diag in log


def _unpack_chol(chol_flat, d):
    L = jnp.zeros((d, d), chol_flat.dtype)
    idx = jnp.tril_indices(d)
    L = L.at[idx].set(chol_flat)
    # exponentiate the diagonal for positivity
    diag = jnp.exp(jnp.diagonal(L))
    return L - jnp.diag(jnp.diagonal(L)) + jnp.diag(diag)


def _sample_and_logq_meanfield(params, key, n_samples):
    d = params.mu.shape[0]
    z = jax.random.normal(key, (n_samples, d), dtype=params.mu.dtype)
    sigma = jnp.exp(params.log_sigma)
    u = params.mu + sigma * z
    log_q = jnp.sum(
        -0.5 * z * z - params.log_sigma - 0.5 * _LOG_2PI, axis=-1
    )
    return u, log_q


def _sample_and_logq_fullrank(params, key, n_samples):
    d = params.mu.shape[0]
    L = _unpack_chol(params.chol_flat, d)
    z = jax.random.normal(key, (n_samples, d), dtype=params.mu.dtype)
    u = params.mu + z @ L.T
    log_det = jnp.sum(jnp.log(jnp.diagonal(L)))
    log_q = jnp.sum(-0.5 * z * z, axis=-1) - log_det - 0.5 * d * _LOG_2PI
    return u, log_q


@partial(
    jax.jit,
    static_argnames=("log_density_fn", "dim", "num_steps", "n_samples", "full_rank"),
)
def fit(
    log_density_fn,
    dim,
    key,
    *,
    num_steps=2000,
    n_samples=64,
    learning_rate=5e-2,
    full_rank=False,
    init_mu=None,
):
    """Run ADVI. Returns (params, elbo_trace).

    ``log_density_fn``: unnormalized log posterior for a single u (vmapped
    internally over the Monte-Carlo batch).
    """
    dtype = jnp.result_type(float)
    mu0 = jnp.zeros(dim, dtype) if init_mu is None else jnp.asarray(init_mu)
    if full_rank:
        d = int(dim)
        flat0 = jnp.zeros(d * (d + 1) // 2, dtype)  # L = I (log-diag 0)
        params = FullRankParams(mu=mu0, chol_flat=flat0)
        sampler = _sample_and_logq_fullrank
    else:
        params = MeanFieldParams(mu=mu0, log_sigma=jnp.zeros(dim, dtype))
        sampler = _sample_and_logq_meanfield

    # cosine-decayed Adam: the decay kills the stochastic-gradient wander so
    # the final iterate (not an average) is usable directly
    opt = optax.adam(optax.cosine_decay_schedule(learning_rate, num_steps))
    opt_state = opt.init(params)

    def neg_elbo(p, step_key):
        u, log_q = sampler(p, step_key, n_samples)
        log_p = jax.vmap(log_density_fn)(u)
        return -jnp.mean(log_p - log_q)

    def body(carry, step_idx):
        p, os = carry
        step_key = jax.random.fold_in(key, step_idx)
        loss, grads = jax.value_and_grad(neg_elbo)(p, step_key)
        updates, os = opt.update(grads, os)
        p = optax.apply_updates(p, updates)
        return (p, os), -loss

    (params, _), elbo_trace = jax.lax.scan(
        body, (params, opt_state), jnp.arange(num_steps)
    )
    return params, elbo_trace


def posterior_moments(params):
    """(mean, covariance) implied by the fitted variational family."""
    if isinstance(params, MeanFieldParams):
        sigma = jnp.exp(params.log_sigma)
        return params.mu, jnp.diag(sigma * sigma)
    L = _unpack_chol(params.chol_flat, params.mu.shape[0])
    return params.mu, L @ L.T


def sample(params, key, n_samples):
    if isinstance(params, MeanFieldParams):
        u, _ = _sample_and_logq_meanfield(params, key, n_samples)
    else:
        u, _ = _sample_and_logq_fullrank(params, key, n_samples)
    return u


def warm_start(params, key, n_chains):
    """Chain initial positions from the fitted variational posterior — the
    VI→MCMC warm-start path (cuts burn-in for concentrated posteriors).
    The fitted covariance factor (``posterior_moments``) doubles as an RWM/
    MALA proposal preconditioner."""
    return sample(params, key, n_chains)
