"""Functional ensemble sampler (FES): affine invariance + exactness."""

import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu.distributions import DiagGaussian
from ip_mcmc_tpu.kernels import ensemble
from ip_mcmc_tpu.models import linear
from ip_mcmc_tpu import potentials


class TestStretchDistribution:
    def test_support_and_density_shape(self):
        z = np.asarray(ensemble._sample_stretch(jax.random.key(0), 20000, 2.0))
        assert z.min() >= 0.5 - 1e-6 and z.max() <= 2.0 + 1e-6
        # g(z) ∝ 1/√z on [1/2, 2]: P(z < 1) = (1 − 1/√2)/(√2 − 1/√2) ≈ 0.414
        np.testing.assert_allclose((z < 1.0).mean(), 0.4142, atol=0.02)


class TestFESCorrectness:
    def test_gaussian_posterior_full_affine(self):
        """d = M = 2 (pure affine ensemble move + trivial complement):
        correlated Gaussian posterior matches the closed form WITHOUT any
        covariance adaptation — affine invariance does the work."""
        prior = DiagGaussian(mean=jnp.zeros(2), scale=3.0 * jnp.ones(2))
        C = np.array([[1.0, 0.95], [0.95, 1.0]])
        P = jnp.asarray(np.linalg.inv(C))
        mu = jnp.array([0.7, -0.3])
        # target ∝ exp(−Φ)dμ0 with Φ chosen to make the posterior N(mu, C)
        phi = lambda u: 0.5 * (u - mu) @ P @ (u - mu) - prior.potential(u)
        positions = prior.sample(jax.random.key(0), (256,))
        _, samples, infos = ensemble.sample_fes(
            phi, prior, positions, jax.random.key(1), n_low_modes=2,
            n_samples=600, burn_in=300,
        )
        flat = np.asarray(samples).reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), np.asarray(mu), atol=0.06)
        np.testing.assert_allclose(np.cov(flat.T), C, atol=0.15)
        assert 0.1 < float(np.asarray(infos.stretch_accept).mean()) < 0.9

    def test_lingauss_posterior_with_complement(self):
        """d = 16, M = 4: affine moves on the 4 leading modes, pCN on the
        rest; conjugate posterior as the oracle."""
        d, m = 16, 8
        lam = 1.0 / (1.0 + np.arange(d)) ** 2
        prior = DiagGaussian(mean=jnp.zeros(d), scale=jnp.sqrt(jnp.asarray(lam, jnp.float32)))
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.standard_normal((m, d)) / np.sqrt(d), jnp.float32)
        noise = DiagGaussian(mean=jnp.zeros(m), scale=0.1 * jnp.ones(m))
        y = A @ prior.sample(jax.random.key(2)) + noise.sample(jax.random.key(3))
        phi = potentials.misfit_potential(linear.make_forward(A), y, noise)
        exact_mean, exact_cov = linear.conjugate_posterior(
            np.asarray(A), np.zeros(d), lam, 0.01 * np.ones(m), np.asarray(y)
        )
        positions = prior.sample(jax.random.key(4), (512,))
        _, samples, infos = ensemble.sample_fes(
            phi, prior, positions, jax.random.key(5), n_low_modes=4,
            pcn_beta=0.3, n_samples=600, burn_in=400,
        )
        flat = np.asarray(samples).reshape(-1, d)
        err = np.abs(flat.mean(axis=0) - exact_mean).max()
        assert err < 0.05, err
        np.testing.assert_allclose(
            np.diag(np.cov(flat.T)), np.diag(exact_cov), rtol=0.3, atol=0.003
        )
        assert float(np.asarray(infos.pcn_accept).mean()) > 0.2

    def test_validation(self):
        import pytest

        prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
        with pytest.raises(ValueError):
            ensemble.build_kernel(lambda u: 0.0, prior, n_low_modes=0)


class TestRunnerConfig:
    def test_lingauss_fes_matches_exact(self):
        from ip_mcmc_tpu import configs, runner

        p = configs.build("lingauss_fes")
        m = runner.run_problem(p, key=jax.random.key(0), n_chains=512,
                               n_samples=400)
        assert m["kernel"] == "fes"
        err = np.abs(np.asarray(m["posterior_mean"]) - p.truth).max()
        assert err < 0.08, err
        assert 0.05 < m["accept_rate"] < 0.95


class TestMeshInvariance:
    def test_fes_identical_under_sharding(self):
        """Global-view semantics: the batch-level FES program (including the
        cross-walker partner gather) gives bitwise-identical results when
        the walker axis is sharded over the mesh."""
        import jax.sharding as shd
        from ip_mcmc_tpu import parallel

        prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
        phi = lambda u: 0.5 * jnp.sum((jnp.ones(2) - u) ** 2)
        positions = prior.sample(jax.random.key(0), (256,))
        _, s1, _ = ensemble.sample_fes(
            phi, prior, positions, jax.random.key(1), n_low_modes=2,
            n_samples=50, burn_in=10,
        )
        mesh = parallel.make_chain_mesh()
        sharded = jax.device_put(
            positions, shd.NamedSharding(mesh, shd.PartitionSpec("chains"))
        )
        _, s2, _ = ensemble.sample_fes(
            phi, prior, sharded, jax.random.key(1), n_low_modes=2,
            n_samples=50, burn_in=10,
        )
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


class TestChooseNLowModes:
    def test_known_spectrum(self):
        # 0.5, 0.25, 0.125, ... cumulative: .5, .75, .875, .9375 ...
        lam = 0.5 ** np.arange(1, 9)
        assert ensemble.choose_n_low_modes(lam, energy_frac=0.7) == 2
        assert ensemble.choose_n_low_modes(lam, energy_frac=0.9) == 4
        # monotone in energy_frac
        ms = [ensemble.choose_n_low_modes(lam, energy_frac=f)
              for f in (0.5, 0.7, 0.9, 0.99)]
        assert ms == sorted(ms)

    def test_sorts_defensively_and_clamps(self):
        lam = np.array([0.1, 4.0, 0.05, 2.0])
        # descending mass: 4, 2 → 6/6.15 ≈ 0.976
        assert ensemble.choose_n_low_modes(lam, energy_frac=0.95) == 2
        assert ensemble.choose_n_low_modes(lam, energy_frac=0.95,
                                           min_modes=3) == 3
        assert ensemble.choose_n_low_modes(lam, energy_frac=0.999,
                                           max_modes=2) == 2

    def test_rejects_bad_spectra(self):
        import pytest
        with pytest.raises(ValueError):
            ensemble.choose_n_low_modes(np.array([]))
        with pytest.raises(ValueError):
            ensemble.choose_n_low_modes(np.array([1.0, -0.5]))
        with pytest.raises(ValueError):
            ensemble.choose_n_low_modes(np.zeros(4))

    def test_darcy_fes_auto_resolves(self):
        """The darcy_fes_fused config's "auto" stretch dimension resolves via
        the KL spectrum (α=2 Laplacian decay → a handful of modes at 90%)."""
        from ip_mcmc_tpu import configs
        from ip_mcmc_tpu.runner import _resolve_n_low_modes

        p = configs.build("darcy_fes_fused")
        m = _resolve_n_low_modes(dict(p.kernel_params), p)
        assert isinstance(m, int)
        assert 2 <= m <= 16, m

    def test_auto_without_spectrum_raises(self):
        import pytest
        from ip_mcmc_tpu import configs
        from ip_mcmc_tpu.runner import _resolve_n_low_modes

        p = configs.build("lingauss_fes")
        with pytest.raises(ValueError, match="kl_eigenvalues"):
            _resolve_n_low_modes({"n_low_modes": "auto"}, p)
