"""ChEES-HMC: batch-level jittered HMC + cross-chain trajectory adaptation."""

import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu.kernels import chees_hmc

MEAN = np.array([1.0, -0.5])
COV = np.array([[2.0, 0.8], [0.8, 1.0]])
PREC = np.linalg.inv(COV)


def target_log_density(x):
    d = x - jnp.asarray(MEAN)
    return -0.5 * d @ jnp.asarray(PREC) @ d


class TestHalton:
    def test_low_discrepancy_in_unit_interval(self):
        vals = np.array([float(chees_hmc.halton(i)) for i in range(64)])
        assert np.all((vals > 0) & (vals < 1))
        assert len(np.unique(vals)) == 64
        # first points of the base-2 van der Corput sequence
        np.testing.assert_allclose(vals[:4], [0.5, 0.25, 0.75, 0.125])


class TestBatchStep:
    def test_energy_conservation_high_acceptance(self):
        """Small ε ⇒ near-perfect energy conservation ⇒ accept ≈ 1."""
        key = jax.random.key(0)
        positions = jax.random.normal(key, (256, 2)) + jnp.asarray(MEAN)
        state = chees_hmc.init(positions, target_log_density)
        state, info = chees_hmc.batch_step(
            target_log_density, state, jax.random.key(1),
            step_size=0.01, trajectory_length=0.5, jitter_u=jnp.float32(1.0),
        )
        assert float(info.accept_prob.mean()) > 0.99

    def test_detailed_balance_posterior_moments(self):
        """Frozen (ε, τ): jittered HMC preserves the target."""
        key = jax.random.key(2)
        positions = jax.random.multivariate_normal(
            key, jnp.asarray(MEAN), jnp.asarray(COV), (512,)
        )
        state = chees_hmc.init(positions, target_log_density)
        _, samples, infos = chees_hmc.sample_chees(
            target_log_density, state, jax.random.key(3),
            step_size=0.4, trajectory_length=1.5,
            n_samples=200, burn_in=50,
        )
        flat = np.asarray(samples).reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), MEAN, atol=0.08)
        np.testing.assert_allclose(np.cov(flat.T), COV, atol=0.2)
        assert float(np.asarray(infos.accept_prob).mean()) > 0.5


class TestWarmup:
    def test_adapts_and_samples_correct_posterior(self):
        key_i, key_w, key_s = jax.random.split(jax.random.key(4), 3)
        positions = jax.random.normal(key_i, (512, 2))
        state, eps, traj, inv_mass = chees_hmc.warmup_chees(
            target_log_density, positions, key_w, num_steps=300,
            initial_step_size=0.1, initial_trajectory=0.2,
        )
        assert np.isfinite(float(eps)) and float(eps) > 0
        assert np.isfinite(float(traj)) and float(traj) > 0
        # mass matrix learned the marginal variances
        np.testing.assert_allclose(
            np.asarray(inv_mass), np.diag(COV), rtol=0.5
        )
        _, samples, infos = chees_hmc.sample_chees(
            target_log_density, state, key_s, eps, traj, inv_mass,
            n_samples=200, burn_in=20,
        )
        flat = np.asarray(samples).reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), MEAN, atol=0.08)
        np.testing.assert_allclose(np.cov(flat.T), COV, atol=0.25)
        acc = float(np.asarray(infos.accept_prob).mean())
        assert 0.4 < acc <= 1.0  # dual averaging targeted 0.651

    def test_trajectory_grows_on_correlated_target(self):
        """ρ=0.95 Gaussian: diagonal mass can't fix the conditioning, so
        long trajectories win — ChEES must grow τ well past ε."""
        C = np.array([[1.0, 0.95], [0.95, 1.0]])
        P = jnp.asarray(np.linalg.inv(C))
        logpi = lambda x: -0.5 * x @ P @ x
        positions = jax.random.multivariate_normal(
            jax.random.key(0), jnp.zeros(2), jnp.asarray(C), (512,)
        )
        _, eps, traj, _ = chees_hmc.warmup_chees(
            logpi, positions, jax.random.key(6), num_steps=400,
            initial_step_size=0.1, initial_trajectory=0.2, adapt_mass=False,
        )
        assert float(traj) > 1.0  # grew ~10x past the 0.2 init
        assert float(traj) > 3.0 * float(eps)  # multi-step trajectories

    def test_eps_capped_on_easy_target(self):
        """Wide isotropic Gaussian: single big steps are optimal; ε must
        stay finite (capped at τ), not run away in dual averaging."""
        wide = lambda x: -0.5 * jnp.sum(x * x) / 25.0
        positions = 5.0 * jax.random.normal(jax.random.key(5), (512, 2))
        _, eps, traj, _ = chees_hmc.warmup_chees(
            wide, positions, jax.random.key(6), num_steps=300,
            initial_step_size=0.5, initial_trajectory=1.0, adapt_mass=False,
        )
        assert np.isfinite(float(eps)) and float(eps) <= float(traj) + 1e-5


class TestRunnerConfig:
    def test_ode_chees_smoke(self):
        from ip_mcmc_tpu import configs, runner

        p = configs.build("ode_chees")
        p.n_chains, p.n_samples, p.burn_in = 128, 50, 100
        m = runner.run_problem(p)
        assert m["kernel"] == "chees"
        assert m["trajectory_length"] > 0
        assert np.isfinite(m["min_ess"])
