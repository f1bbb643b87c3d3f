import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import driver
from ip_mcmc_tpu.adapt import dual_averaging as da
from ip_mcmc_tpu.adapt import warmup_hmc, warmup_nuts, warmup_pcn, warmup_rwm
from ip_mcmc_tpu.distributions import DiagGaussian, Gaussian
from ip_mcmc_tpu.kernels import hmc, nuts, pcn, rwm

COV = np.array([[4.0, 1.5], [1.5, 1.0]])
MEAN = np.array([0.5, -0.5])


def logpi(x):
    return Gaussian.from_covariance(jnp.array(MEAN), jnp.array(COV)).log_prob(x)


class TestDualAveraging:
    def test_low_acceptance_shrinks_step(self):
        s = da.init(1.0)
        for _ in range(50):
            s = da.update(s, jnp.array(0.0), target=0.8)
        assert float(da.current(s)) < 0.1

    def test_high_acceptance_grows_step(self):
        s = da.init(0.1)
        for _ in range(50):
            s = da.update(s, jnp.array(1.0), target=0.5)
        assert float(da.current(s)) > 0.2

    def test_equilibrium_stays_at_shrinkage_point(self):
        """accept ≡ target ⇒ zero gradient ⇒ iterate sits at μ = 10·x0."""
        s = da.init(0.5)
        for _ in range(100):
            s = da.update(s, jnp.array(0.8), target=0.8)
        np.testing.assert_allclose(float(da.current(s)), 5.0, rtol=1e-5)


def _rwm_accept_rate(step_size, chol, state, n_steps=100):
    kernel = rwm.build_kernel(logpi, step_size=step_size, scale=chol)
    _, _, infos = driver.sample_chains(
        kernel, state, jax.random.key(99), n_samples=n_steps, burn_in=0
    )
    return float(np.asarray(infos.accepted).mean())


class TestWarmupRWM:
    def test_hits_target_acceptance_and_learns_cov(self):
        key_i, key_w = jax.random.split(jax.random.key(0))
        positions = jax.random.normal(key_i, (256, 2)) * jnp.array([2.0, 1.0])
        state = driver.init_chains(rwm.init, positions, logpi)
        state, step_size, chol = warmup_rwm(
            logpi, state, key_w, num_steps=400, target_accept=0.3
        )
        learned_cov = np.asarray(chol @ chol.T)
        # pooled covariance should approximate the target covariance
        np.testing.assert_allclose(learned_cov, COV, rtol=0.35, atol=0.35)
        rate = _rwm_accept_rate(step_size, chol, state)
        assert 0.15 < rate < 0.5


class TestWarmupPCN:
    def test_beta_in_range_and_acceptance_near_target(self):
        prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
        y = jnp.array([2.0, -1.0])
        phi = lambda u: 0.5 * jnp.sum((y - u) ** 2) / 0.25  # sharp likelihood
        key_i, key_w = jax.random.split(jax.random.key(1))
        state = driver.init_chains(pcn.init, prior.sample(key_i, (256,)), phi)
        state, beta = warmup_pcn(
            phi, prior, state, key_w, num_steps=400, target_accept=0.3
        )
        assert 0.0 < float(beta) < 1.0
        kernel = pcn.build_kernel(phi, prior, beta=beta)
        _, _, infos = driver.sample_chains(
            kernel, state, jax.random.key(98), n_samples=100, burn_in=0
        )
        rate = float(np.asarray(infos.accepted).mean())
        assert 0.15 < rate < 0.5


class TestWarmupHMC:
    def test_acceptance_near_target(self):
        key_i, key_w = jax.random.split(jax.random.key(2))
        positions = jax.random.normal(key_i, (128, 2))
        state = driver.init_chains(hmc.init, positions, logpi)
        state, eps, inv_mass = warmup_hmc(
            logpi, state, key_w, num_steps=300, num_integration_steps=8
        )
        kernel = hmc.build_kernel(
            logpi, step_size=eps, num_integration_steps=8, inv_mass=inv_mass
        )
        _, _, infos = driver.sample_chains(
            kernel, state, jax.random.key(97), n_samples=100, burn_in=0
        )
        rate = float(np.asarray(infos.accepted).mean())
        assert 0.6 < rate <= 1.0
        # mass matrix learned the marginal variances
        np.testing.assert_allclose(
            1.0 / np.asarray(inv_mass), np.diag(COV), rtol=0.5
        )


class TestWarmupNUTS:
    def test_acceptance_near_target(self):
        key_i, key_w = jax.random.split(jax.random.key(3))
        positions = jax.random.normal(key_i, (64, 2))
        state = driver.init_chains(nuts.init, positions, logpi)
        state, eps, inv_mass = warmup_nuts(
            logpi, state, key_w, num_steps=200, max_depth=6
        )
        kernel = nuts.build_kernel(
            logpi, step_size=eps, max_depth=6, inv_mass=inv_mass
        )
        _, _, infos = driver.sample_chains(
            kernel, state, jax.random.key(96), n_samples=100, burn_in=0
        )
        ap = float(np.asarray(infos.accept_prob).mean())
        assert 0.5 < ap <= 1.0
