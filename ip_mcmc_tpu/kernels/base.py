"""Shared kernel machinery.

Design (SURVEY.md §3.5): a kernel is a pure function
``step(key, state) -> (state, info)`` built by ``build_kernel(...)``. The
reference's Proposer/Accepter object pair (layer L3) collapses into this one
fused function — proposal draw, potential evaluation, Metropolis test and
state select are one XLA program, ``vmap``-able over a chain axis and
``lax.scan``-able over steps. The reference's ``CountedAccepter`` becomes the
``MHInfo`` record reduced on-device by the driver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ip_mcmc_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class MHInfo:
    """Per-step Metropolis–Hastings info (the ``CountedAccepter`` equivalent,
    kept on-device and reducible with psum/mean across chains)."""

    accepted: jnp.ndarray  # bool
    accept_prob: jnp.ndarray  # float in [0, 1]
    proposal: jnp.ndarray  # proposed position (diagnostic)


def mh_select(key, log_accept_ratio, current, proposal):
    """Metropolis accept/reject: returns (new, accepted, accept_prob).

    ``current``/``proposal`` are pytrees with identical structure. The accept
    decision is a single uniform draw + ``tree_map`` of ``jnp.where`` — no
    branches, so it fuses cleanly under vmap.
    """
    # NaN ratio (inf−inf energies from a diverged proposal) must REJECT, not
    # poison downstream statistics (DA adaptation averages accept_prob).
    log_accept_ratio = jnp.where(
        jnp.isnan(log_accept_ratio), -jnp.inf, log_accept_ratio
    )
    log_ratio = jnp.minimum(log_accept_ratio, 0.0)
    accept_prob = jnp.exp(log_ratio)
    log_u = jnp.log(jax.random.uniform(key, (), dtype=log_ratio.dtype))
    accepted = log_u < log_ratio
    new = jax.tree_util.tree_map(
        lambda p, c: jnp.where(accepted, p, c), proposal, current
    )
    return new, accepted, accept_prob
