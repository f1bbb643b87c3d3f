"""Reference-compatible API layer: the oracle's experiment scripts must run
against ip_mcmc_tpu.api with only the import (and RNG) changed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import api


def test_rwm_analytic_experiment_script():
    """SURVEY.md §3.2's sanity path, written exactly as a reference user
    would, executing on the JAX engine."""
    target = api.GaussianDistribution(
        np.array([1.0, -0.5]), np.array([[2.0, 0.8], [0.8, 1.0]])
    )
    proposer = api.StandardRWProposer(0.8, 2)
    accepter = api.CountedAccepter(
        api.AnalyticAccepter(log_density_fn=target.log_density)
    )
    sampler = api.MCMCSampler(proposer, accepter, rng=0)
    samples = sampler.run(np.zeros(2), n_samples=2000, burn_in=500)
    assert samples.shape == (2000, 2)
    np.testing.assert_allclose(samples.mean(axis=0), [1.0, -0.5], atol=0.3)
    assert 0.05 < accepter.acceptance_rate < 0.9


def test_pcn_inverse_problem_experiment_script():
    """SURVEY.md §3.3's end-to-end shape: prior + forward + noise →
    EvolutionPotential → pCN → posterior; validated on the conjugate case."""
    prior = api.GaussianDistribution(np.zeros(2), np.eye(2))
    A = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    forward = lambda u: A @ u
    noise = api.GaussianDistribution(np.zeros(3), 0.25 * np.eye(3))
    u_true = np.array([0.7, -0.3])
    y = np.asarray(A @ u_true) + 0.0  # noiseless data for determinism
    potential = api.EvolutionPotential(forward, y, noise)
    proposer = api.pCNProposer(0.3, prior)
    accepter = api.CountedAccepter(api.pCNAccepter(potential))
    sampler = api.MCMCSampler(proposer, accepter, rng=1)
    samples = sampler.run(
        np.zeros(2), n_samples=500, burn_in=300, n_chains=64
    )
    assert samples.shape == (500, 64, 2)
    from ip_mcmc_tpu.models import linear

    mean, cov = linear.conjugate_posterior(
        np.asarray(A), np.zeros(2), np.eye(2), 0.25 * np.eye(3), y
    )
    flat = samples.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.08)
    assert accepter.calls > 0


def test_standard_rw_accepter_posterior():
    prior = api.GaussianDistribution(np.zeros(2), 4.0 * np.eye(2))
    target = api.GaussianDistribution(np.array([1.0, 1.0]), 0.5 * np.eye(2))
    potential = api.AnalyticPotential(target.log_density)
    sampler = api.MCMCSampler(
        api.StandardRWProposer(0.7, 2),
        api.StandardRWAccepter(potential, prior),
        rng=2,
    )
    samples = sampler.run(np.zeros(2), n_samples=500, burn_in=200, n_chains=32)
    # posterior = product of the two Gaussians
    prec = np.eye(2) / 0.5 + np.eye(2) / 4.0
    exact_mean = np.linalg.solve(prec, np.array([1.0, 1.0]) / 0.5)
    flat = samples.reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), exact_mean, atol=0.08)


def test_independent_and_lognormal():
    d = api.IndependentDistributions(
        [
            api.GaussianDistribution(np.zeros(2), np.eye(2)),
            api.LogNormalDistribution(np.zeros(1), np.ones(1)),
        ]
    )
    assert d.dim == 3
    s = d.sample(jax.random.key(0), (100,))
    assert s.shape == (100, 3)
    assert np.all(np.asarray(s[:, 2]) > 0)
    assert np.isfinite(float(d.log_density(jnp.array([0.1, 0.2, 1.0]))))


def test_analytic_accepter_density_form():
    """Reference passes a raw density; log path must match."""
    target = api.GaussianDistribution(np.zeros(1), np.eye(1))
    a1 = api.AnalyticAccepter(density=target.density)
    a2 = api.AnalyticAccepter(log_density_fn=target.log_density)
    u, v = jnp.array([0.1]), jnp.array([0.5])
    r1, _ = a1.log_ratio(a1.init_cache(u), u, v)
    r2, _ = a2.log_ratio(a2.init_cache(u), u, v)
    np.testing.assert_allclose(float(r1), float(r2), rtol=1e-5)


def test_invalid_beta_rejected():
    prior = api.GaussianDistribution(np.zeros(2), np.eye(2))
    with pytest.raises(ValueError):
        api.pCNProposer(1.5, prior)


def test_counted_accepter_exact_vs_python_loop():
    """The CountedAccepter count must be an exact event count over EVERY
    MH step (burn-in included), not an extrapolation from retained-step
    means (round-2 VERDICT weak #3). Oracle: replay the identical kernel
    step-by-step in an eager Python loop with the driver's own per-step
    keys and count accepts directly — same ops, so bitwise-identical
    accept decisions."""
    from ip_mcmc_tpu import driver

    target = api.GaussianDistribution(
        np.array([1.0, -0.5]), np.array([[2.0, 0.8], [0.8, 1.0]])
    )
    proposer = api.StandardRWProposer(0.9, 2)
    accepter = api.CountedAccepter(
        api.AnalyticAccepter(log_density_fn=target.log_density)
    )
    n_chains, burn_in, n_samples, thin = 5, 37, 50, 3
    sampler = api.MCMCSampler(proposer, accepter, rng=7)
    u0 = jnp.zeros((n_chains, 2))
    sampler.run(u0, n_samples=n_samples, burn_in=burn_in, sample_interval=thin)

    # eager replay with the same (base_key, step, chain) key schedule
    kernel = sampler._kernel()
    init = jax.vmap(
        lambda p: api._MHState(position=p, cache=accepter.init_cache(p))
    )
    state = init(u0)
    base_key = jax.random.key(7)
    n_steps = burn_in + n_samples * thin
    count = 0
    for step_idx in range(n_steps):
        keys = driver.chain_keys(base_key, step_idx, n_chains)
        state, info = jax.vmap(kernel)(keys, state)
        count += int(np.asarray(info.accepted).sum())

    assert accepter.calls == n_steps * n_chains
    assert accepter.accepts == count
    assert 0 < count < n_steps * n_chains
