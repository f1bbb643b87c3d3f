"""Explicit shard_map resampling vs the serial oracle: bitwise agreement on
any mesh shape (SURVEY.md §7.3 hard part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import parallel, smc
from ip_mcmc_tpu.parallel.resample import distributed_systematic_resample

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _data(n=64, d=3, seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    lw = jax.random.normal(k1, (n,))
    particles = jax.random.normal(k2, (n, d))
    return lw, particles


def test_matches_serial_oracle():
    lw, particles = _data()
    key = jax.random.key(5)
    # serial oracle
    anc = np.asarray(smc.systematic_resample(key, lw))
    expected = np.asarray(particles)[anc]

    mesh = parallel.make_chain_mesh()
    sh = parallel.chain_sharding(mesh)
    out = distributed_systematic_resample(
        key, jax.device_put(lw, sh), jax.device_put(particles, sh), mesh
    )
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_mesh_shape_invariance():
    lw, particles = _data(seed=1)
    key = jax.random.key(9)
    outs = []
    for nd in (2, 4, 8):
        mesh = parallel.make_chain_mesh(n_devices=nd)
        sh = parallel.chain_sharding(mesh)
        out = distributed_systematic_resample(
            key, jax.device_put(lw, sh), jax.device_put(particles, sh), mesh
        )
        outs.append(np.asarray(out))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[1], outs[2])


def test_indivisible_raises():
    lw, particles = _data(n=60)
    mesh = parallel.make_chain_mesh()
    with pytest.raises(ValueError):
        distributed_systematic_resample(jax.random.key(0), lw, particles, mesh)


def test_preserves_weighted_mean():
    """Resampling is unbiased: ancestor counts track weights (statistical)."""
    n = 512
    lw, particles = _data(n=n, seed=2)
    mesh = parallel.make_chain_mesh()
    sh = parallel.chain_sharding(mesh)
    w = np.exp(np.asarray(lw))
    w /= w.sum()
    target = (w[:, None] * np.asarray(particles)).sum(axis=0)
    means = []
    for s in range(30):
        out = distributed_systematic_resample(
            jax.random.key(s), jax.device_put(lw, sh),
            jax.device_put(particles, sh), mesh,
        )
        means.append(np.asarray(out).mean(axis=0))
    np.testing.assert_allclose(np.mean(means, axis=0), target, atol=0.05)
