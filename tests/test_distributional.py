"""Distributional rigor (SURVEY.md §4.2 item 2): Kolmogorov–Smirnov tests of
sampler output against exact marginals, and a banana-target moment test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from ip_mcmc_tpu import driver
from ip_mcmc_tpu.distributions import DiagGaussian, Gaussian
from ip_mcmc_tpu.kernels import hmc, pcn, rwm


def _ks_marginal(samples_1d, cdf, thin=7):
    """KS test on a thinned subset (reduces autocorrelation so the KS null
    roughly holds); requires p > 1e-4 — catches gross distribution errors."""
    sub = np.asarray(samples_1d)[::thin]
    stat, p = st.kstest(sub, cdf)
    return stat, p


def test_rwm_ks_gaussian_marginals():
    mean = np.array([1.0, -0.5])
    cov = np.array([[2.0, 0.8], [0.8, 1.0]])
    target = Gaussian.from_covariance(jnp.asarray(mean), jnp.asarray(cov))
    kernel = rwm.build_kernel(target.log_prob, step_size=1.0)
    key_i, key_r = jax.random.split(jax.random.key(0))
    state = driver.init_chains(
        rwm.init, target.sample(key_i, (64,)), target.log_prob
    )
    _, samples, _ = driver.sample_chains(
        kernel, state, key_r, n_samples=800, burn_in=300
    )
    flat = np.asarray(samples).reshape(-1, 2)
    for d in range(2):
        stat, p = _ks_marginal(
            flat[:, d], st.norm(mean[d], np.sqrt(cov[d, d])).cdf
        )
        assert p > 1e-4, f"dim {d}: KS stat {stat}, p {p}"


def test_pcn_ks_conjugate_marginals():
    prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
    y = jnp.array([1.0, 1.0])
    phi = lambda u: 0.5 * jnp.sum((y - u) ** 2)
    kernel = pcn.build_kernel(phi, prior, beta=0.6)
    key_i, key_r = jax.random.split(jax.random.key(1))
    state = driver.init_chains(pcn.init, prior.sample(key_i, (64,)), phi)
    _, samples, _ = driver.sample_chains(
        kernel, state, key_r, n_samples=800, burn_in=300
    )
    flat = np.asarray(samples).reshape(-1, 2)
    for d in range(2):
        stat, p = _ks_marginal(flat[:, d], st.norm(0.5, np.sqrt(0.5)).cdf)
        assert p > 1e-4, f"dim {d}: KS stat {stat}, p {p}"


def _banana_log_density(x):
    """Rosenbrock-like banana: x2 | x1 ~ N(x1²/4, 1), x1 ~ N(0, 4)."""
    return -0.5 * (x[0] ** 2 / 4.0) - 0.5 * (x[1] - x[0] ** 2 / 4.0) ** 2


def test_hmc_banana_moments():
    """Non-Gaussian curved target: E[x1]=0, E[x2]=E[x1²]/4=1, Var[x1]=4."""
    kernel = hmc.build_kernel(
        _banana_log_density, step_size=0.25, num_integration_steps=12
    )
    key_i, key_r = jax.random.split(jax.random.key(2))
    positions = jax.random.normal(key_i, (128, 2)) * jnp.array([2.0, 1.0])
    state = driver.init_chains(hmc.init, positions, _banana_log_density)
    _, samples, infos = driver.sample_chains(
        kernel, state, key_r, n_samples=1500, burn_in=500
    )
    flat = np.asarray(samples).reshape(-1, 2)
    assert np.asarray(infos.accepted).mean() > 0.5
    np.testing.assert_allclose(flat[:, 0].mean(), 0.0, atol=0.15)
    np.testing.assert_allclose(flat[:, 0].var(), 4.0, rtol=0.15)
    np.testing.assert_allclose(flat[:, 1].mean(), 1.0, atol=0.15)
