"""Elliptical slice sampling: tuning-free correctness on conjugate targets."""

import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu import driver
from ip_mcmc_tpu.distributions import DiagGaussian
from ip_mcmc_tpu.kernels import elliptical


def test_prior_invariance():
    """Φ ≡ 0: the chain leaves the prior invariant, every step moves."""
    prior = DiagGaussian(mean=jnp.array([1.0, -1.0]), scale=jnp.array([2.0, 0.5]))
    phi = lambda u: jnp.array(0.0)
    kernel = elliptical.build_kernel(phi, prior)
    key_i, key_r = jax.random.split(jax.random.key(0))
    state = driver.init_chains(elliptical.init, prior.sample(key_i, (256,)), phi)
    _, samples, infos = driver.sample_chains(
        kernel, state, key_r, n_samples=400, burn_in=50
    )
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [1.0, -1.0], atol=0.1)
    np.testing.assert_allclose(flat.std(axis=0), [2.0, 0.5], rtol=0.1)
    # with Φ=0 the first angle always accepts
    np.testing.assert_allclose(float(np.asarray(infos.n_evals).mean()), 1.0, atol=0.01)


def test_conjugate_posterior():
    """Gaussian likelihood ⇒ closed-form posterior N(y/2, 1/2 I)."""
    prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
    y = jnp.array([1.0, 1.0])
    phi = lambda u: 0.5 * jnp.sum((y - u) ** 2)
    kernel = elliptical.build_kernel(phi, prior)
    key_i, key_r = jax.random.split(jax.random.key(1))
    state = driver.init_chains(elliptical.init, prior.sample(key_i, (256,)), phi)
    _, samples, infos = driver.sample_chains(
        kernel, state, key_r, n_samples=600, burn_in=100
    )
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), [0.5, 0.5], atol=0.05)
    np.testing.assert_allclose(np.cov(flat.T), 0.5 * np.eye(2), atol=0.08)
    # typical evaluation count per step is small
    assert float(np.asarray(infos.n_evals).mean()) < 6.0


def test_cached_potential_consistent():
    prior = DiagGaussian(mean=jnp.zeros(3), scale=jnp.ones(3))
    phi = lambda u: 0.5 * jnp.sum(u**2)
    kernel = elliptical.build_kernel(phi, prior)
    state = elliptical.init(jnp.ones(3), phi)
    for i in range(20):
        state, _ = kernel(jax.random.key(i), state)
    np.testing.assert_allclose(
        float(state.potential), float(phi(state.position)), rtol=1e-5
    )
