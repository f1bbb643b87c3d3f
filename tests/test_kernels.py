"""Exact-math and distributional tests for the MCMC kernels (SURVEY.md §4.2
items 1–2): acceptance formulae against hand-computed oracles, and chains on
analytic targets matched to closed-form moments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import diagnostics, driver
from ip_mcmc_tpu.distributions import DiagGaussian, Gaussian
from ip_mcmc_tpu.kernels import hmc, mala, nuts, pcn, rwm
from ip_mcmc_tpu.potentials import analytic_potential

COV = np.array([[2.0, 0.8], [0.8, 1.0]])
MEAN = np.array([1.0, -0.5])


def target_log_density(x):
    d = Gaussian.from_covariance(jnp.array(MEAN), jnp.array(COV))
    return d.log_prob(x)


def run_sampler(kernel, init_fn, key, n_chains=64, n_samples=400, burn_in=200, thin=1, dim=2):
    key_init, key_run = jax.random.split(jax.random.key(key))
    positions = jax.random.normal(key_init, (n_chains, dim))
    state = driver.init_chains(init_fn, positions)
    _, samples, infos = driver.sample_chains(
        kernel, state, key_run, n_samples=n_samples, burn_in=burn_in, thin=thin
    )
    return np.asarray(samples), infos


def check_moments(samples, atol_mean=0.12, atol_cov=0.3):
    flat = samples.reshape(-1, samples.shape[-1])
    np.testing.assert_allclose(flat.mean(axis=0), MEAN, atol=atol_mean)
    np.testing.assert_allclose(np.cov(flat.T), COV, atol=atol_cov)


class TestRWM:
    def test_accept_always_when_uphill(self):
        # Moving to the mode from far away must (almost) always accept.
        kernel = rwm.build_kernel(target_log_density, step_size=1e-6)
        state = rwm.init(jnp.array(MEAN) + 5.0, target_log_density)
        # tiny step size: accept prob ~= 1 regardless of key
        _, info = kernel(jax.random.key(0), state)
        assert float(info.accept_prob) > 0.99

    def test_cached_log_density_consistent(self):
        kernel = rwm.build_kernel(target_log_density, step_size=0.5)
        state = rwm.init(jnp.zeros(2), target_log_density)
        for i in range(10):
            state, _ = kernel(jax.random.key(i), state)
        np.testing.assert_allclose(
            float(state.log_density), float(target_log_density(state.position)), rtol=1e-5
        )

    def test_posterior_moments(self):
        kernel = rwm.build_kernel(target_log_density, step_size=0.8)
        samples, infos = run_sampler(
            kernel, lambda p: rwm.init(p, target_log_density), key=1,
            n_samples=600, burn_in=300,
        )
        check_moments(samples)
        rate = np.asarray(infos.accepted).mean()
        assert 0.1 < rate < 0.8


class TestPCN:
    def test_invariance_on_prior(self):
        """With Φ ≡ 0 the pCN chain leaves the prior invariant and accepts
        every proposal (the defining property of pCN)."""
        prior = Gaussian.from_covariance(jnp.array(MEAN), jnp.array(COV))
        kernel = pcn.build_kernel(lambda u: jnp.array(0.0), prior, beta=0.7)
        key_init, key_run = jax.random.split(jax.random.key(2))
        positions = prior.sample(key_init, (256,))
        state = driver.init_chains(pcn.init, positions, lambda u: jnp.array(0.0))
        _, samples, infos = driver.sample_chains(
            kernel, state, key_run, n_samples=300, burn_in=50
        )
        assert np.asarray(infos.accepted).mean() > 0.999
        flat = np.asarray(samples).reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), MEAN, atol=0.1)
        np.testing.assert_allclose(np.cov(flat.T), COV, atol=0.25)

    def test_posterior_moments_analytic(self):
        """pCN targeting exp(-Φ) dμ0: prior N(0, I), potential from a Gaussian
        likelihood ⇒ closed-form Gaussian posterior."""
        prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
        # likelihood: y = u + noise, y=(1,1), noise std 1 → posterior N(y/2, I/2)
        y = jnp.array([1.0, 1.0])
        phi = lambda u: 0.5 * jnp.sum((y - u) ** 2)
        kernel = pcn.build_kernel(phi, prior, beta=0.5)
        key_init, key_run = jax.random.split(jax.random.key(3))
        positions = prior.sample(key_init, (128,))
        state = driver.init_chains(pcn.init, positions, phi)
        _, samples, _ = driver.sample_chains(
            kernel, state, key_run, n_samples=500, burn_in=300
        )
        flat = np.asarray(samples).reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), [0.5, 0.5], atol=0.06)
        np.testing.assert_allclose(np.cov(flat.T), 0.5 * np.eye(2), atol=0.12)


class TestMALA:
    def test_grad_cached(self):
        kernel = mala.build_kernel(target_log_density, step_size=0.3)
        state = mala.init(jnp.zeros(2), target_log_density)
        for i in range(5):
            state, _ = kernel(jax.random.key(i), state)
        expected = jax.grad(target_log_density)(state.position)
        np.testing.assert_allclose(
            np.asarray(state.grad), np.asarray(expected), rtol=1e-4, atol=1e-5
        )

    def test_posterior_moments(self):
        kernel = mala.build_kernel(target_log_density, step_size=0.6)
        samples, infos = run_sampler(
            kernel, lambda p: mala.init(p, target_log_density), key=4,
            n_samples=600, burn_in=300,
        )
        check_moments(samples)
        assert np.asarray(infos.accepted).mean() > 0.3


class TestHMC:
    def test_energy_conservation_small_step(self):
        kernel = hmc.build_kernel(
            target_log_density, step_size=0.01, num_integration_steps=5
        )
        state = hmc.init(jnp.zeros(2), target_log_density)
        _, info = kernel(jax.random.key(0), state)
        assert float(info.accept_prob) > 0.999

    def test_posterior_moments(self):
        kernel = hmc.build_kernel(
            target_log_density, step_size=0.4, num_integration_steps=8
        )
        samples, infos = run_sampler(
            kernel, lambda p: hmc.init(p, target_log_density), key=5,
            n_samples=400, burn_in=200,
        )
        check_moments(samples)
        assert np.asarray(infos.accepted).mean() > 0.6


class TestNUTS:
    def test_posterior_moments(self):
        kernel = nuts.build_kernel(target_log_density, step_size=0.5, max_depth=6)
        key_init, key_run = jax.random.split(jax.random.key(6))
        positions = jax.random.normal(key_init, (32, 2))
        state = driver.init_chains(nuts.init, positions, target_log_density)
        _, samples, infos = driver.sample_chains(
            kernel, state, key_run, n_samples=400, burn_in=200
        )
        check_moments(np.asarray(samples))
        assert np.asarray(infos.divergent).mean() < 0.01
        # trees should actually grow
        assert np.asarray(infos.depth).mean() > 1.0

    def test_divergence_flag_on_huge_step(self):
        kernel = nuts.build_kernel(target_log_density, step_size=50.0, max_depth=5)
        state = nuts.init(jnp.zeros(2), target_log_density)
        _, info = kernel(jax.random.key(1), state)
        assert bool(info.divergent) or float(info.accept_prob) < 0.1
