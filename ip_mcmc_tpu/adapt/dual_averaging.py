"""Nesterov dual averaging for step-size adaptation (Hoffman & Gelman 2014,
§3.2.1, Stan defaults). Pure-functional: state is a pytree carried through
the warmup ``lax.scan``; the acceptance statistic it consumes is the
CROSS-CHAIN pooled mean (a psum over the sharded chain axis), so thousands
of chains give a near-noiseless gradient signal and adaptation converges in
tens of steps rather than thousands (the ensemble advantage the reference's
single chain can't have).
"""

from __future__ import annotations

import jax.numpy as jnp

from ip_mcmc_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class DAState:
    log_x: jnp.ndarray  # current log step size
    log_x_avg: jnp.ndarray  # averaged iterate (use after warmup)
    h_avg: jnp.ndarray  # running average of (target - accept)
    t: jnp.ndarray  # iteration counter
    mu: jnp.ndarray  # shrinkage point log(10 * x0)


def init(initial_value):
    log_x0 = jnp.log(jnp.asarray(initial_value, dtype=jnp.float32))
    return DAState(
        log_x=log_x0,
        log_x_avg=log_x0,
        h_avg=jnp.zeros((), jnp.float32),
        t=jnp.zeros((), jnp.float32),
        mu=jnp.log(10.0) + log_x0,
    )


def update(state, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
    t = state.t + 1.0
    eta_h = 1.0 / (t + t0)
    h_avg = (1.0 - eta_h) * state.h_avg + eta_h * (target - accept_prob)
    log_x = state.mu - jnp.sqrt(t) / gamma * h_avg
    eta_x = t ** (-kappa)
    log_x_avg = eta_x * log_x + (1.0 - eta_x) * state.log_x_avg
    return DAState(
        log_x=log_x, log_x_avg=log_x_avg, h_avg=h_avg, t=t, mu=state.mu
    )


def current(state):
    return jnp.exp(state.log_x)


def final(state):
    return jnp.exp(state.log_x_avg)
