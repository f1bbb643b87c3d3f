import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import vi
from ip_mcmc_tpu.distributions import DiagGaussian, Gaussian
from ip_mcmc_tpu.models import linear
from ip_mcmc_tpu.potentials import misfit_potential, posterior_log_density


def test_meanfield_recovers_diag_gaussian():
    target = DiagGaussian(mean=jnp.array([1.0, -2.0]), scale=jnp.array([0.5, 1.5]))
    params, elbo = vi.fit(target.log_prob, 2, jax.random.key(0), num_steps=1500)
    mean, cov = vi.posterior_moments(params)
    np.testing.assert_allclose(np.asarray(mean), [1.0, -2.0], atol=0.05)
    np.testing.assert_allclose(
        np.sqrt(np.diag(np.asarray(cov))), [0.5, 1.5], rtol=0.1
    )
    # ELBO should converge to -KL = 0 + const; at optimum for exact family,
    # ELBO → log Z = 0 for normalized target
    assert float(elbo[-100:].mean()) > -0.05


def test_fullrank_recovers_correlated_gaussian():
    cov = jnp.array([[2.0, 0.9], [0.9, 1.0]])
    target = Gaussian.from_covariance(jnp.array([0.5, -0.5]), cov)
    params, elbo = vi.fit(
        target.log_prob, 2, jax.random.key(1), num_steps=2500, full_rank=True
    )
    mean, fitted_cov = vi.posterior_moments(params)
    np.testing.assert_allclose(np.asarray(mean), [0.5, -0.5], atol=0.05)
    np.testing.assert_allclose(np.asarray(fitted_cov), np.asarray(cov), atol=0.15)


def test_meanfield_underestimates_correlated_variance():
    """Known ADVI pathology — mean-field on a correlated target matches the
    mean but not the joint covariance; document it via test."""
    cov = jnp.array([[1.0, 0.95], [0.95, 1.0]])
    target = Gaussian.from_covariance(jnp.zeros(2), cov)
    params, _ = vi.fit(target.log_prob, 2, jax.random.key(2), num_steps=1500)
    _, fitted_cov = vi.posterior_moments(params)
    assert float(fitted_cov[0, 0]) < 0.5  # conditional var = 1 - 0.95² ≈ 0.098


def test_vi_on_inverse_problem_posterior():
    """ADVI on the linear-Gaussian IP — matches the conjugate posterior."""
    A = np.array([[1.0, 0.5], [0.0, 1.0], [1.0, -1.0]])
    y = np.array([1.0, -0.5, 0.3])
    prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
    noise = DiagGaussian(mean=jnp.zeros(3), scale=0.5 * jnp.ones(3))
    phi = misfit_potential(linear.make_forward(A), jnp.asarray(y, jnp.float32), noise)
    logpi = posterior_log_density(phi, prior)
    params, _ = vi.fit(logpi, 2, jax.random.key(3), num_steps=2500, full_rank=True)
    mean, cov = vi.posterior_moments(params)
    exact_mean, exact_cov = linear.conjugate_posterior(
        A, np.zeros(2), np.eye(2), 0.25 * np.eye(3), y
    )
    np.testing.assert_allclose(np.asarray(mean), exact_mean, atol=0.05)
    np.testing.assert_allclose(np.asarray(cov), exact_cov, atol=0.05)


def test_sample_shapes():
    params, _ = vi.fit(
        lambda u: -0.5 * jnp.sum(u**2), 3, jax.random.key(4), num_steps=100
    )
    s = vi.sample(params, jax.random.key(5), 10)
    assert s.shape == (10, 3)
