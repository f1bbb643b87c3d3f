"""Pallas TPU kernels: fully fused MCMC chains (SURVEY.md §2.2's TPU-native
"inner loop" obligation).

For small/analytic targets the scan+vmap path is dominated by per-step
overhead that XLA cannot remove: threefry key derivation (tens of ALU ops
per random number) and HBM round-trips of the chain state between scan
iterations. These kernels run ``n_steps`` of RWM / pCN for a block of chains
entirely in VMEM, drawing randomness from the TPU's hardware PRNG
(``pltpu.prng_random_bits``, seeded per grid block so blocks are
independent), and touch HBM exactly twice: initial load and final store.

The user-supplied ``potential_fn`` is ordinary jnp code evaluated INSIDE the
kernel on a (block, d) batch; its closed-over constants are hoisted with
``jax.closure_convert`` and fed to the kernel as VMEM inputs (Pallas
requires explicit operands). Elementwise VPU ops and small matmuls are
Pallas-safe, which covers analytic targets and linear forward models.

Distributional equivalence with the scan+vmap path is tested in
tests/test_pallas_ops.py (moment match on the same targets); the PRNG
streams differ by construction.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * math.pi


def _hash_bits(key, shape):
    """Counter-based random uint32s: murmur3/splitmix finalizer over the
    element index, mixed with ``key``. ~8 vector ALU ops per draw — an
    order of magnitude cheaper than threefry2x32, fully portable (identical
    compiled and interpreted), statistically solid for Metropolis noise."""
    n = int(np.prod(shape))
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0).reshape(shape)
    x = idx * jnp.uint32(0x9E3779B9) + key
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _mix_key(seed, step, tag):
    k = seed.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
    k = k + step.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
    k = k + jnp.uint32(tag) * jnp.uint32(0x27D4EB2F)
    k = k ^ (k >> 13)
    return k * jnp.uint32(0x165667B1)


def _uniform01(key, shape):
    """U(0,1): 24-bit mantissa path (never exactly 0). The uint32→int32
    hop exists because Mosaic has no direct uint32→f32 cast; the value fits
    in 24 bits so the signed reinterpretation is lossless."""
    bits = _hash_bits(key, shape)
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24)
    ) + (0.5 / (1 << 24))


def _normal(key1, key2, shape):
    """Standard normals via Box–Muller."""
    u1 = _uniform01(key1, shape)
    u2 = _uniform01(key2, shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _pack2d(a):
    a = jnp.asarray(a)
    if a.ndim == 0:
        return a.reshape(1, 1)
    if a.ndim == 1:
        return a.reshape(1, -1)
    return a


def _run_fused(step_builder, potential_fn, positions, params, seed, n_steps, block_chains):
    """Shared driver: hoist constants, build the kernel, launch the grid.

    ``step_builder(pot, *params) -> step(pos, phi) -> (pos, phi, accepted)``.
    """
    positions = jnp.asarray(positions, jnp.float32)
    n, d = positions.shape
    if n % block_chains:
        raise ValueError(
            f"n_chains {n} must be a multiple of block_chains {block_chains}"
        )
    example = jax.ShapeDtypeStruct((block_chains, d), positions.dtype)
    # Hoist the potential's embedded constants (closed-over arrays become
    # jaxpr consts; Pallas requires them as explicit kernel operands).
    closed_pot = jax.make_jaxpr(potential_fn)(example)
    pot_consts = [jnp.asarray(c) for c in closed_pot.consts]

    def pot_conv(x, *cs):
        return jax.core.eval_jaxpr(closed_pot.jaxpr, list(cs), x)[0]

    extras = [jnp.asarray(p, jnp.float32) for p in params] + list(pot_consts)
    packed = [_pack2d(e) for e in extras]
    orig_shapes = [tuple(jnp.asarray(e).shape) for e in extras]
    # scalars travel in SMEM (Mosaic cannot materialize a scalar out of a
    # VMEM vector block); arrays in VMEM
    is_scalar = [len(s) == 0 for s in orig_shapes]
    n_params = len(params)

    def kernel(seed_ref, pos_ref, *rest):
        extra_refs = rest[: len(extras)]
        out_ref, acc_ref = rest[len(extras) :]
        vals = []
        for er, s, sc in zip(extra_refs, orig_shapes, is_scalar):
            if sc:
                vals.append(er[0, 0])
            elif tuple(er.shape) != s:
                vals.append(er[:].reshape(s))
            else:
                vals.append(er[:])
        param_vals = vals[:n_params]
        const_vals = vals[n_params:]
        pot = lambda x: pot_conv(x, *const_vals)
        step = step_builder(pot, *param_vals)

        # independent stream per grid block
        block_seed = (seed_ref[0] + pl.program_id(0) * 7919).astype(jnp.uint32)
        pos0 = pos_ref[:]
        phi0 = pot(pos0)

        def body(i, carry):
            pos, phi, acc = carry
            rand_u = lambda shape, tag: _uniform01(
                _mix_key(block_seed, i, tag), shape
            )
            rand_n = lambda shape, tag: _normal(
                _mix_key(block_seed, i, tag),
                _mix_key(block_seed, i, tag + 1),
                shape,
            )
            pos, phi, accepted = step(pos, phi, rand_n, rand_u)
            return pos, phi, acc + accepted.astype(jnp.float32)

        pos_f, _, acc = jax.lax.fori_loop(
            0, n_steps, body, (pos0, phi0, jnp.zeros(block_chains, jnp.float32))
        )
        out_ref[:] = pos_f
        acc_ref[:] = (acc / n_steps)[:, None]

    grid = (n // block_chains,)
    extra_specs = [
        pl.BlockSpec(
            p.shape,
            (lambda i, _nd=p.ndim: (0,) * _nd),
            memory_space=pltpu.SMEM if sc else pltpu.VMEM,
        )
        for p, sc in zip(packed, is_scalar)
    ]
    interpret = jax.default_backend() != "tpu"
    final, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(
                (block_chains, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            *extra_specs,
        ],
        out_specs=(
            pl.BlockSpec(
                (block_chains, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_chains, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), positions.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), positions, *packed)
    return final, acc[:, 0]


def _rwm_step_builder(pot, step_size):
    def step(pos, phi, rand_n, rand_u):
        xi = rand_n(pos.shape, 0)
        prop = pos + step_size * xi
        phi_prop = pot(prop)
        log_u = jnp.log(rand_u((pos.shape[0], 1), 2))[:, 0]
        accept = log_u < (phi - phi_prop)
        return (
            jnp.where(accept[:, None], prop, pos),
            jnp.where(accept, phi_prop, phi),
            accept,
        )

    return step


def _pcn_step_builder(pot, beta, mean, scale):
    contraction = jnp.sqrt(1.0 - beta * beta)
    mean = mean[None, :]
    scale = scale[None, :]

    def step(pos, phi, rand_n, rand_u):
        xi = scale * rand_n(pos.shape, 0)
        prop = mean + contraction * (pos - mean) + beta * xi
        phi_prop = pot(prop)
        log_u = jnp.log(rand_u((pos.shape[0], 1), 2))[:, 0]
        accept = log_u < (phi - phi_prop)
        return (
            jnp.where(accept[:, None], prop, pos),
            jnp.where(accept, phi_prop, phi),
            accept,
        )

    return step


@functools.partial(
    jax.jit, static_argnames=("potential_fn", "n_steps", "block_chains")
)
def fused_rwm_chain(
    potential_fn, positions, step_size, seed, n_steps=100, block_chains=256
):
    """``n_steps`` of random-walk Metropolis on exp(−potential), fused in
    VMEM. ``potential_fn``: (block, d) -> (block,) jnp code (Pallas-safe).
    Returns (final_positions, acceptance_rate_per_chain)."""
    return _run_fused(
        _rwm_step_builder,
        potential_fn,
        positions,
        [jnp.float32(step_size)],
        seed,
        n_steps,
        block_chains,
    )


@functools.partial(
    jax.jit, static_argnames=("potential_fn", "n_steps", "block_chains")
)
def fused_pcn_chain(
    potential_fn,
    positions,
    prior_mean,
    prior_scale,
    beta,
    seed,
    n_steps=100,
    block_chains=256,
):
    """``n_steps`` of pCN with a diagonal (KL-coordinate) Gaussian prior,
    fused in VMEM. Returns (final_positions, acceptance_rate_per_chain)."""
    return _run_fused(
        _pcn_step_builder,
        potential_fn,
        positions,
        [
            jnp.float32(beta),
            jnp.asarray(prior_mean, jnp.float32),
            jnp.asarray(prior_scale, jnp.float32),
        ],
        seed,
        n_steps,
        block_chains,
    )
