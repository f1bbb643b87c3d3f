import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from ip_mcmc_tpu.distributions import (
    DiagGaussian,
    Gaussian,
    IndependentProduct,
    LogNormal,
    gaussian_kl_prior,
)


def test_diag_gaussian_log_prob_vs_scipy(key):
    mean = jnp.array([1.0, -2.0, 0.5])
    scale = jnp.array([0.5, 2.0, 1.5])
    d = DiagGaussian(mean=mean, scale=scale)
    x = np.array([0.3, -1.0, 2.0])
    expected = st.multivariate_normal(np.asarray(mean), np.diag(np.asarray(scale) ** 2)).logpdf(x)
    np.testing.assert_allclose(float(d.log_prob(jnp.array(x))), expected, rtol=1e-5)


def test_dense_gaussian_log_prob_vs_scipy(key):
    mean = np.array([1.0, -1.0])
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    d = Gaussian.from_covariance(mean, cov)
    x = np.array([0.0, 0.5])
    expected = st.multivariate_normal(mean, cov).logpdf(x)
    np.testing.assert_allclose(float(d.log_prob(jnp.array(x))), expected, rtol=1e-5)
    # potential = -log_prob up to the constant
    w = np.linalg.solve(np.linalg.cholesky(cov), x - mean)
    np.testing.assert_allclose(float(d.potential(jnp.array(x))), 0.5 * w @ w, rtol=1e-5)


def test_dense_gaussian_sample_moments(key):
    mean = np.array([1.0, -1.0])
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    d = Gaussian.from_covariance(mean, cov)
    xs = d.sample(key, (200_000,))
    emp_mean = np.mean(np.asarray(xs), axis=0)
    emp_cov = np.cov(np.asarray(xs).T)
    np.testing.assert_allclose(emp_mean, mean, atol=0.02)
    np.testing.assert_allclose(emp_cov, cov, atol=0.03)


def test_whiten_roundtrip(key):
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    d = Gaussian.from_covariance(np.zeros(2), cov)
    z = jnp.array([0.3, -1.2])
    np.testing.assert_allclose(
        np.asarray(d.whiten(d.scale_apply(z))), np.asarray(z), rtol=1e-5
    )


def test_lognormal_log_prob_vs_scipy():
    d = LogNormal(mu=jnp.array([0.2]), sigma=jnp.array([0.7]))
    x = 1.3
    expected = st.lognorm(s=0.7, scale=np.exp(0.2)).logpdf(x)
    np.testing.assert_allclose(float(d.log_prob(jnp.array([x]))), expected, rtol=1e-5)


def test_independent_product(key):
    g = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
    ln = LogNormal(mu=jnp.zeros(1), sigma=jnp.ones(1))
    p = IndependentProduct.of(g, ln)
    assert p.dim == 3
    x = jnp.array([0.1, -0.2, 1.5])
    expected = float(g.log_prob(x[:2]) + ln.log_prob(x[2:]))
    np.testing.assert_allclose(float(p.log_prob(x)), expected, rtol=1e-5)
    s = p.sample(key, (7,))
    assert s.shape == (7, 3)
    assert np.all(np.asarray(s[:, 2]) > 0)


def test_kl_prior_is_diag():
    lam = jnp.array([1.0, 0.25, 0.0625])
    prior = gaussian_kl_prior(lam)
    np.testing.assert_allclose(np.asarray(prior.scale), np.sqrt(np.asarray(lam)))


def test_distribution_is_pytree(key):
    d = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))

    @jax.jit
    def f(dist, x):
        return dist.log_prob(x)

    assert np.isfinite(float(f(d, jnp.ones(2))))
