"""Fused Pallas MCMC kernels: distributional equivalence with the scan path
(streams differ; posteriors must match) — interpret mode on CPU, compiled on
TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu.ops import fused_pcn_chain, fused_rwm_chain


def gaussian_potential(x):
    # N(mean, diag(var)) potential, batched: (block, d) -> (block,)
    mean = jnp.array([1.0, -0.5])
    var = jnp.array([2.0, 0.5])
    return 0.5 * jnp.sum((x - mean) ** 2 / var, axis=-1)


def test_fused_rwm_targets_gaussian():
    n, d = 512, 2
    pos = jnp.zeros((n, d), jnp.float32)
    # burn-in then sample: run twice, second call continues from output
    pos, _ = fused_rwm_chain(
        gaussian_potential, pos, step_size=0.9, seed=0, n_steps=500,
        block_chains=128,
    )
    pos, acc = fused_rwm_chain(
        gaussian_potential, pos, step_size=0.9, seed=1, n_steps=500,
        block_chains=128,
    )
    p = np.asarray(pos)
    np.testing.assert_allclose(p.mean(axis=0), [1.0, -0.5], atol=0.2)
    np.testing.assert_allclose(p.var(axis=0), [2.0, 0.5], rtol=0.35)
    assert 0.05 < float(np.asarray(acc).mean()) < 0.9


def test_fused_rwm_chains_differ_across_blocks():
    """Each grid block must get its own PRNG stream."""
    n, d = 256, 2
    pos = jnp.zeros((n, d), jnp.float32)
    pos, _ = fused_rwm_chain(
        gaussian_potential, pos, step_size=0.5, seed=7, n_steps=50,
        block_chains=128,
    )
    p = np.asarray(pos)
    assert not np.allclose(p[:128], p[128:])


def test_fused_pcn_conjugate_posterior():
    """pCN fused kernel on the conjugate Gaussian IP: posterior N(y/2, I/2)."""
    n, d = 1024, 2
    y = jnp.array([1.0, 1.0])

    def phi(x):
        return 0.5 * jnp.sum((y - x) ** 2, axis=-1)

    pos = jnp.zeros((n, d), jnp.float32)
    pos, _ = fused_pcn_chain(
        phi, pos, prior_mean=np.zeros(2), prior_scale=np.ones(2),
        beta=0.5, seed=0, n_steps=800, block_chains=256,
    )
    pos, acc = fused_pcn_chain(
        phi, pos, prior_mean=np.zeros(2), prior_scale=np.ones(2),
        beta=0.5, seed=1, n_steps=800, block_chains=256,
    )
    p = np.asarray(pos)
    np.testing.assert_allclose(p.mean(axis=0), [0.5, 0.5], atol=0.08)
    np.testing.assert_allclose(p.var(axis=0), [0.5, 0.5], rtol=0.25)
    assert float(np.asarray(acc).mean()) > 0.2


def test_block_mismatch_raises():
    with pytest.raises(ValueError):
        fused_rwm_chain(
            gaussian_potential, jnp.zeros((100, 2)), 0.5, 0, n_steps=10,
            block_chains=64,
        )
