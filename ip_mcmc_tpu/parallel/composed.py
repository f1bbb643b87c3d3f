"""Composed ('chains', 'model') mesh: data-parallel chains OVER grid-sharded
forward solves (SURVEY.md §2.3 'model' axis + §5.7; round-1 VERDICT item 9).

The two parallelism axes the framework defines finally meet in one program:

- ``'chains'`` shards the chain batch (DP — each device group owns a chain
  block, zero cross-talk between blocks during sampling),
- ``'model'`` row-shards EACH chain's elliptic Darcy solve across its group
  (halo exchange via ``ppermute``, CG dot products via ``psum`` — the
  stencil analog of ring attention), by ``vmap``-ing the per-shard CG body
  of ``grid_shard.solve_cg_local`` over the local chain block: JAX batches
  the collectives, so one program step runs ``chains_local`` simultaneous
  distributed solves.

Keys are derived from (step, GLOBAL chain index) only, so the math is
mesh-shape invariant: a (1, 1) mesh is literally the single-device run, and
(C, M) reshapes move work without changing any chain's trajectory (up to
f32 psum reduction order in the solver — tested at tight tolerances in
tests/test_composed.py).

Every device in a 'model' group computes identical chain states (same psum
results feed the same accept decisions), so sample outputs are replicated
over 'model' by construction; ``check_vma=False`` because JAX cannot prove
that through the manual collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ip_mcmc_tpu.parallel import grid_shard
from ip_mcmc_tpu.parallel.mesh import CHAIN_AXIS

MODEL_AXIS = grid_shard.MODEL_AXIS


def make_composed_mesh(n_chain_groups: int, n_model_devices: int,
                       devices=None):
    """Mesh of shape (n_chain_groups, n_model_devices) with axes
    ('chains', 'model')."""
    if devices is None:
        devices = jax.devices()
    need = n_chain_groups * n_model_devices
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for a ({n_chain_groups}, {n_model_devices})"
            f" mesh, have {len(devices)}"
        )
    arr = np.array(devices[:need]).reshape(n_chain_groups, n_model_devices)
    return Mesh(arr, (CHAIN_AXIS, MODEL_AXIS))


def sample_composed_pcn(
    aux,
    data,
    noise_scale,
    *,
    beta,
    mesh,
    u0,
    base_key,
    n_samples,
    burn_in=0,
    thin=1,
    cg_iters=150,
    log_a_mean=0.0,
):
    """pCN on the Darcy posterior over a ('chains', 'model') mesh.

    aux: the dict from ``darcy.make_darcy_forward`` (scaled_basis,
    obs_indices, source, n_grid). u0: (n_chains, K) whitened initial
    positions (prior = N(0, I) — the same whitened parameterization as the
    darcy configs). Returns (samples (n_samples, n_chains, K), accept_rate).
    """
    n = int(aux["n_grid"])
    K = u0.shape[1]
    n_chain_groups, n_model = mesh.devices.shape
    if u0.shape[0] % n_chain_groups:
        raise ValueError("n_chains must divide the 'chains' axis")
    if n % n_model:
        raise ValueError("n_grid must divide the 'model' axis")

    basis3 = jnp.asarray(aux["scaled_basis"], jnp.float32).reshape(K, n, n)
    f2 = jnp.asarray(aux["source"], jnp.float32).reshape(n, n)
    obs_idx = np.asarray(aux["obs_indices"])
    m = len(obs_idx)
    obs_mat = np.zeros((m, n * n), np.float32)
    obs_mat[np.arange(m), obs_idx] = 1.0
    obs3 = jnp.asarray(obs_mat).reshape(m, n, n)
    y = jnp.asarray(data, jnp.float32)
    scale = jnp.float32(noise_scale)
    beta = jnp.float32(beta)
    total_steps = burn_in + n_samples * thin

    def body(u_loc, basis_loc, f_loc, obs_loc):
        c_loc = u_loc.shape[0]
        cidx = jax.lax.axis_index(CHAIN_AXIS)
        gidx = cidx * c_loc + jnp.arange(c_loc)  # global chain ids

        def misfit(ub):  # (c_loc, K) -> (c_loc,)
            log_a = jnp.einsum("ck,krn->crn", ub, basis_loc) + log_a_mean
            a = jnp.exp(log_a)
            # c_loc simultaneous distributed solves: vmap batches the
            # ppermute halo exchange and psum reductions over 'model'
            sol = jax.vmap(
                lambda al: grid_shard.solve_cg_local(al, f_loc, n, cg_iters)
            )(a)
            pred = jax.lax.psum(
                jnp.einsum("mrn,crn->cm", obs_loc, sol), MODEL_AXIS
            )
            r = (y[None, :] - pred) / scale
            return 0.5 * jnp.sum(r * r, axis=1)

        def step(carry, t):
            u, phi = carry
            # keys from (step, global chain id) ONLY — identical across the
            # 'model' group and invariant to the mesh shape
            keys = jax.vmap(
                lambda g: jax.random.fold_in(jax.random.fold_in(base_key, t), g)
            )(gidx)
            xi = jax.vmap(
                lambda k: jax.random.normal(jax.random.fold_in(k, 0), (K,))
            )(keys)
            log_u = jnp.log(
                jax.vmap(
                    lambda k: jax.random.uniform(jax.random.fold_in(k, 1))
                )(keys)
            )
            v = jnp.sqrt(1.0 - beta * beta) * u + beta * xi
            phi_v = misfit(v)
            acc = log_u < (phi - phi_v)  # pCN: min(1, exp(Φ(u) − Φ(v)))
            u = jnp.where(acc[:, None], v, u)
            phi = jnp.where(acc, phi_v, phi)
            return (u, phi), (u, acc)

        phi0 = misfit(u_loc)
        _, (us, accs) = jax.lax.scan(
            step, (u_loc, phi0), jnp.arange(total_steps)
        )
        samples = us[burn_in + thin - 1 :: thin][:n_samples]
        acc_rate = jax.lax.pmean(
            jnp.mean(accs.astype(jnp.float32)), CHAIN_AXIS
        )
        return samples, acc_rate

    samples, acc = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(CHAIN_AXIS, None),
            P(None, MODEL_AXIS, None),
            P(MODEL_AXIS, None),
            P(None, MODEL_AXIS, None),
        ),
        out_specs=(P(None, CHAIN_AXIS, None), P()),
        check_vma=False,
    )(u0, basis3, f2, obs3)
    return samples, acc
