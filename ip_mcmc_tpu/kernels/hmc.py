"""Hamiltonian Monte Carlo with a fixed number of leapfrog steps.

Beyond-reference capability (BASELINE.json config 3). Fixed trajectory length
keeps the compiled program static-shaped (leapfrog via ``lax.scan``) and
vmaps perfectly over chains; NUTS (ip_mcmc_tpu.kernels.nuts) adds dynamic
trajectory selection with a masked fixed budget.

Diagonal mass matrix M: momenta p ~ N(0, M); kinetic energy ½ pᵀM⁻¹p.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ip_mcmc_tpu.kernels.base import MHInfo, mh_select
from ip_mcmc_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class HMCState:
    position: jnp.ndarray
    log_density: jnp.ndarray
    grad: jnp.ndarray


def init(position, log_density_fn):
    position = jnp.asarray(position)
    ld, g = jax.value_and_grad(log_density_fn)(position)
    return HMCState(position=position, log_density=ld, grad=g)


def leapfrog(value_and_grad, position, momentum, grad, step_size, num_steps, inv_mass):
    """``num_steps`` leapfrog steps via lax.scan; returns final (q, p, ld, g)."""

    def one_step(carry, _):
        q, p, g = carry
        p_half = p + 0.5 * step_size * g
        q_new = q + step_size * inv_mass * p_half
        ld_new, g_new = value_and_grad(q_new)
        p_new = p_half + 0.5 * step_size * g_new
        return (q_new, p_new, g_new), ld_new

    (q, p, g), lds = jax.lax.scan(
        one_step, (position, momentum, grad), None, length=num_steps
    )
    return q, p, lds[-1], g


def build_kernel(log_density_fn, step_size, num_integration_steps, inv_mass=None):
    value_and_grad = jax.value_and_grad(log_density_fn)

    def kernel(key, state):
        key_mom, key_acc = jax.random.split(key)
        im = (
            jnp.ones_like(state.position) if inv_mass is None else inv_mass
        )
        # p ~ N(0, M); draw via M^{1/2} z = z / sqrt(inv_mass)
        z = jax.random.normal(
            key_mom, state.position.shape, dtype=state.position.dtype
        )
        momentum = z / jnp.sqrt(im)

        def kinetic(p):
            return 0.5 * jnp.sum(im * p * p)

        q, p, ld_new, g_new = leapfrog(
            value_and_grad,
            state.position,
            momentum,
            state.grad,
            step_size,
            num_integration_steps,
            im,
        )
        h_init = -state.log_density + kinetic(momentum)
        h_final = -ld_new + kinetic(p)
        new_state, accepted, accept_prob = mh_select(
            key_acc,
            h_init - h_final,
            state,
            HMCState(position=q, log_density=ld_new, grad=g_new),
        )
        return new_state, MHInfo(
            accepted=accepted, accept_prob=accept_prob, proposal=q
        )

    return kernel
