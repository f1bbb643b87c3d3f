"""Ensemble-sharded FES (ROADMAP P2: "ensemble-sharded gather across
hosts"): the functional ensemble sampler of ``kernels/ensemble.py`` with the
WALKER axis sharded over the 'chains' mesh axis.

The affine stretch move is the only cross-walker coupling in FES, and it
touches partners ONLY through their first ``n_low_modes`` whitened
coordinates (kernels/ensemble.py half_stretch: ``w_p[:, :M]``). So the
sharded kernel all_gathers just that (H, M) low-mode block of the opposite
half-ensemble — M is 2-16 in practice while d is 64+ — and every other
operation (potential evaluations, pCN on the complement, accept logic) stays
walker-local. Cross-device traffic per step is 2·H·M floats instead of the
naive 2·H·d full-state gather; on a pod the gather rides ICI and the
per-host walker blocks never move.

Key discipline matches parallel/composed.py: every draw derives from
(step, GLOBAL walker id), so trajectories are mesh-shape invariant — the
1-device mesh run through this code IS the reference (tested in
tests/test_fes_shard.py, plus a distributional anchor on a known Gaussian
posterior).

Red-black ordering matches the unsharded kernel: half A proposes against
pre-step B, then half B proposes against post-step A, then pCN updates the
complement of both halves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ip_mcmc_tpu.parallel.mesh import CHAIN_AXIS


def sample_fes_sharded(
    potential_fn,
    prior,
    *,
    mesh,
    u0,
    base_key,
    n_low_modes,
    n_samples,
    burn_in=0,
    thin=1,
    stretch_a=2.0,
    pcn_beta=0.2,
):
    """FES over a 1-D ('chains',) mesh with the walker ensemble sharded.

    u0: (L, d) walkers, L even, with the half-ensemble size L/2 divisible
    by the mesh size (each device holds equal blocks of BOTH
    half-ensembles, so the red-black update is load-balanced). ``prior``
    is the diagonal whitening prior
    (mean/scale broadcastable over d) as in ``kernels/ensemble.py``.

    Returns (samples (n_samples, L, d), info dict of scalar means:
    stretch_accept, pcn_accept)."""
    L, d = u0.shape
    if L % 2:
        raise ValueError(f"need an even walker count, got {L}")
    H = L // 2
    n_dev = int(np.prod(mesh.devices.shape))
    if H % n_dev:
        raise ValueError(
            f"half-ensemble size {H} must be divisible by the mesh size {n_dev}"
        )
    M = int(n_low_modes)
    if not 0 < M <= d:
        raise ValueError(f"n_low_modes must be in (0, {d}], got {M}")
    a = float(stretch_a)
    beta = jnp.float32(pcn_beta)
    contraction = jnp.sqrt(1.0 - beta * beta)
    total_steps = burn_in + n_samples * thin
    mean = jnp.asarray(prior.mean, jnp.float32)
    scale = jnp.asarray(prior.scale, jnp.float32)

    pos_a0 = jnp.asarray(u0[:H], jnp.float32)
    pos_b0 = jnp.asarray(u0[H:], jnp.float32)

    def body(pa, pb):
        h_loc = pa.shape[0]
        cidx = jax.lax.axis_index(CHAIN_AXIS)
        gid_a = cidx * h_loc + jnp.arange(h_loc)  # global ids 0..H-1
        gid_b = H + gid_a  # H..2H-1 (disjoint streams for half B)

        def whiten(u):
            return (u - mean) / scale

        def unwhiten(w):
            return mean + scale * w

        def phi_of(v):
            return jax.vmap(potential_fn)(v)

        def walker_keys(t, gids):
            return jax.vmap(
                lambda g: jax.random.fold_in(jax.random.fold_in(base_key, t), g)
            )(gids)

        def half_stretch(t, movers, movers_phi, anchors_low_loc, gids):
            # the ONLY collective of the move: (H, M) low-mode block
            anchors_low = jax.lax.all_gather(
                anchors_low_loc, CHAIN_AXIS
            ).reshape(H, M)
            keys = walker_keys(t, gids)
            pick = jax.vmap(
                lambda k: jax.random.randint(jax.random.fold_in(k, 0), (), 0, H)
            )(keys)
            uz = jax.vmap(
                lambda k: jax.random.uniform(jax.random.fold_in(k, 1))
            )(keys)
            z = jnp.square((a - 1.0) * uz + 1.0) / a  # g(z) ∝ 1/√z on [1/a,a]
            log_u = jnp.log(jax.vmap(
                lambda k: jax.random.uniform(jax.random.fold_in(k, 2))
            )(keys))
            w_m = whiten(movers)
            w_p_low = anchors_low[pick]
            v_low = w_p_low + z[:, None] * (w_m[:, :M] - w_p_low)
            v = unwhiten(jnp.concatenate([v_low, w_m[:, M:]], axis=1))
            phi_v = phi_of(v)
            d_prior = 0.5 * (
                jnp.sum(jnp.square(v_low), axis=1)
                - jnp.sum(jnp.square(w_m[:, :M]), axis=1)
            )
            log_ratio = (M - 1) * jnp.log(z) - (phi_v - movers_phi) - d_prior
            log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
            acc = log_u < log_ratio
            return (
                jnp.where(acc[:, None], v, movers),
                jnp.where(acc, phi_v, movers_phi),
                acc,
            )

        def pcn_complement(t, pos, phi, gids):
            keys = walker_keys(t, gids)
            xi = jax.vmap(
                lambda k: jax.random.normal(jax.random.fold_in(k, 3), (d,))
            )(keys)
            log_u = jnp.log(jax.vmap(
                lambda k: jax.random.uniform(jax.random.fold_in(k, 4))
            )(keys))
            w = whiten(pos)
            w_prop = jnp.concatenate(
                [w[:, :M], contraction * w[:, M:] + beta * xi[:, M:]], axis=1
            )
            v = unwhiten(w_prop)
            phi_v = phi_of(v)
            log_ratio = phi - phi_v  # prior-reversible: only Φ in the ratio
            log_ratio = jnp.where(jnp.isnan(log_ratio), -jnp.inf, log_ratio)
            acc = log_u < log_ratio
            return (
                jnp.where(acc[:, None], v, pos),
                jnp.where(acc, phi_v, phi),
                acc,
            )

        def step(carry, t):
            pa, phia, pb, phib = carry
            pa, phia, sa = half_stretch(t, pa, phia, whiten(pb)[:, :M], gid_a)
            pb, phib, sb = half_stretch(t, pb, phib, whiten(pa)[:, :M], gid_b)
            pa, phia, ca = pcn_complement(t, pa, phia, gid_a)
            pb, phib, cb = pcn_complement(t, pb, phib, gid_b)
            s_acc = jnp.mean(
                jnp.concatenate([sa, sb]).astype(jnp.float32)
            )
            p_acc = jnp.mean(
                jnp.concatenate([ca, cb]).astype(jnp.float32)
            )
            return (pa, phia, pb, phib), (pa, pb, s_acc, p_acc)

        phia0, phib0 = phi_of(pa), phi_of(pb)
        _, (sas, sbs, s_accs, p_accs) = jax.lax.scan(
            step, (pa, phia0, pb, phib0), jnp.arange(total_steps)
        )
        sel = slice(burn_in + thin - 1, None, thin)
        samples_a = sas[sel][:n_samples]
        samples_b = sbs[sel][:n_samples]
        s_acc = jax.lax.pmean(jnp.mean(s_accs), CHAIN_AXIS)
        p_acc = jax.lax.pmean(jnp.mean(p_accs), CHAIN_AXIS)
        return samples_a, samples_b, s_acc, p_acc

    samples_a, samples_b, s_acc, p_acc = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(CHAIN_AXIS, None), P(CHAIN_AXIS, None)),
        out_specs=(
            P(None, CHAIN_AXIS, None),
            P(None, CHAIN_AXIS, None),
            P(),
            P(),
        ),
        check_vma=False,
    )(pos_a0, pos_b0)
    samples = jnp.concatenate([samples_a, samples_b], axis=1)
    return samples, {"stretch_accept": s_acc, "pcn_accept": p_acc}
