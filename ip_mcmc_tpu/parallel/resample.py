"""Explicit distributed systematic resampling (SURVEY.md §7.3 hard part #1).

The global-view path in ip_mcmc_tpu.smc lets XLA choose the collectives.
This module is the EXPLICIT shard_map formulation for when the schedule
matters (pod-scale runs, ICI/DCN cost control):

1. ``all_gather`` the per-shard log-weights over the 'chains' axis —
   O(N) floats, cheap at particle counts that fit MCMC (≤10⁶);
2. every device deterministically computes the SAME global ancestor vector
   (systematic resampling is a pure function of (key, weights));
3. each device gathers ITS slice of the new particle set from the globally
   gathered particle table (one more all_gather of particles — the v1
   trade documented in SURVEY.md: accept the all-gather cost at ≤64-dim ×
   4096 particles ≈ 1 MB, far below ICI bandwidth).

Tested against the serial oracle in tests/test_distributed_resample.py
(bitwise agreement on any mesh shape).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from ip_mcmc_tpu.parallel.mesh import CHAIN_AXIS
from ip_mcmc_tpu.smc import systematic_resample


def distributed_systematic_resample(key, log_weights, particles, mesh):
    """Resample sharded ``particles`` (n, d) by sharded ``log_weights`` (n,).

    Returns resampled particles with the SAME sharding. Every device
    computes identical global ancestry (deterministic in (key, weights)),
    then slices its local shard out of the all-gathered table.
    """
    n = log_weights.shape[0]
    n_dev = mesh.devices.size
    if n % n_dev:
        raise ValueError(f"n particles {n} not divisible by {n_dev} devices")
    shard = n // n_dev

    def body(lw_local, p_local):
        # (1) weight table: all_gather over the chain axis
        lw_global = jax.lax.all_gather(
            lw_local, CHAIN_AXIS, axis=0, tiled=True
        )  # (n,)
        # (2) identical global ancestry on every device
        ancestors = systematic_resample(key, lw_global)  # (n,)
        # (3) particle table + local slice of the new generation
        p_global = jax.lax.all_gather(p_local, CHAIN_AXIS, axis=0, tiled=True)
        my = jax.lax.axis_index(CHAIN_AXIS)
        local_anc = jax.lax.dynamic_slice_in_dim(ancestors, my * shard, shard)
        return p_global[local_anc]

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS)),
        out_specs=P(CHAIN_AXIS),
    )(log_weights, particles)
