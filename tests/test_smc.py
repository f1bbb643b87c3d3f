import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import parallel, smc
from ip_mcmc_tpu.distributions import DiagGaussian
from ip_mcmc_tpu.models import linear


class TestResampler:
    def test_uniform_weights_identity_like(self):
        n = 64
        anc = np.asarray(
            smc.systematic_resample(jax.random.key(0), jnp.zeros(n))
        )
        # uniform weights: systematic resampling returns each index once
        np.testing.assert_array_equal(np.sort(anc), np.arange(n))

    def test_counts_proportional_to_weights(self):
        w = jnp.log(jnp.array([0.5, 0.25, 0.125, 0.125]) )
        counts = np.zeros(4)
        for s in range(200):
            anc = np.asarray(smc.systematic_resample(jax.random.key(s), w * 1.0))
            counts += np.bincount(anc, minlength=4)
        frac = counts / counts.sum()
        np.testing.assert_allclose(frac, [0.5, 0.25, 0.125, 0.125], atol=0.02)

    def test_ess(self):
        np.testing.assert_allclose(
            float(smc.effective_sample_size(jnp.zeros(100))), 100.0, rtol=1e-5
        )
        # one dominant weight → ESS ~ 1
        lw = jnp.array([0.0] + [-50.0] * 99)
        assert float(smc.effective_sample_size(lw)) < 1.01


class TestAdaptiveBeta:
    def test_bisection_hits_ess_target(self):
        rng = np.random.default_rng(0)
        pots = jnp.asarray(rng.uniform(0, 30, 512), jnp.float32)
        delta = smc.find_next_beta(jnp.float32(0.0), pots, 0.5)
        ess = float(smc.effective_sample_size(-delta * pots))
        np.testing.assert_allclose(ess, 0.5 * 512, rtol=0.02)

    def test_full_step_when_easy(self):
        pots = jnp.zeros(64)  # flat likelihood: ESS always N
        delta = smc.find_next_beta(jnp.float32(0.0), pots, 0.5)
        np.testing.assert_allclose(float(delta), 1.0, rtol=1e-5)


class TestSMCEndToEnd:
    def _problem(self):
        A = np.array([[1.0, 0.5], [0.0, 1.0], [1.0, -1.0]])
        y = np.array([1.0, -0.5, 0.3])
        noise_std = 0.5
        prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
        Aj, yj = jnp.asarray(A, jnp.float32), jnp.asarray(y, jnp.float32)
        phi = lambda u: 0.5 * jnp.sum(((yj - Aj @ u) / noise_std) ** 2)
        mean, cov = linear.conjugate_posterior(
            A, np.zeros(2), np.eye(2), noise_std**2 * np.eye(3), y
        )
        # analytic evidence (up to the Γ-normalizer convention of Φ):
        S = A @ A.T + noise_std**2 * np.eye(3)
        log_z = (
            -0.5 * y @ np.linalg.solve(S, y)
            - 0.5 * np.linalg.slogdet(S)[1]
            + 0.5 * np.linalg.slogdet(noise_std**2 * np.eye(3))[1]
        )
        return phi, prior, mean, cov, log_z

    def test_posterior_and_evidence(self):
        phi, prior, mean, cov, log_z = self._problem()
        state, info = smc.run(
            phi, prior, jax.random.key(0), n_particles=4096,
            mutation_steps=10, pcn_step=0.5,
        )
        assert float(state.beta) == 1.0
        p = np.asarray(state.particles)
        np.testing.assert_allclose(p.mean(axis=0), mean, atol=0.05)
        np.testing.assert_allclose(np.cov(p.T), cov, atol=0.05)
        np.testing.assert_allclose(float(state.log_z), log_z, atol=0.1)

    def test_beta_ladder_monotone(self):
        phi, prior, *_ = self._problem()
        state, info = smc.run(
            phi, prior, jax.random.key(1), n_particles=512, mutation_steps=3
        )
        n = int(info.n_stages)
        betas = np.asarray(info.betas)[:n]
        assert np.all(np.diff(betas) > 0)
        assert betas[-1] == 1.0
        ess = np.asarray(info.ess)[: n - 1]
        np.testing.assert_allclose(ess, 0.5 * 512, rtol=0.05)

    def test_multimodal_target_balanced(self):
        """Tempered SMC populates BOTH modes of a symmetric bimodal target
        with ~equal mass — the capability single-temperature MCMC lacks."""
        sep, sig = 2.0, 0.4
        prior = DiagGaussian(mean=jnp.zeros(2), scale=3.0 * jnp.ones(2))

        def log_mix(u):
            a = -0.5 * jnp.sum((u - sep) ** 2) / sig**2
            b = -0.5 * jnp.sum((u + sep) ** 2) / sig**2
            return jnp.logaddexp(a, b)

        # exp(-Φ) dμ0 ∝ mixture  ⇒  Φ = log prior-density − log mixture
        phi = lambda u: -log_mix(u) - prior.potential(u)
        state, info = smc.run(
            phi, prior, jax.random.key(4), n_particles=2048,
            mutation_steps=10, pcn_step=0.3,
        )
        p = np.asarray(state.particles)
        frac_right = (p[:, 0] > 0).mean()
        assert 0.3 < frac_right < 0.7, f"mode occupancy {frac_right}"
        np.testing.assert_allclose(np.abs(p).mean(axis=0), sep, atol=0.4)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_matches_single_device(self):
        """Collective resampling: particle axis sharded over the mesh gives
        bitwise the same run (SURVEY.md §7.3 item 1)."""
        phi, prior, *_ = self._problem()
        s1, _ = smc.run(phi, prior, jax.random.key(2), n_particles=512)

        mesh = parallel.make_chain_mesh()
        # shard the particle axis by donating sharded init via closure:
        # run() samples internally, so instead check invariance across
        # mesh-visible jit: place inputs and run under the same program.
        with jax.sharding.set_mesh(mesh):
            s2, _ = smc.run(phi, prior, jax.random.key(2), n_particles=512)
        np.testing.assert_allclose(
            np.asarray(s1.particles), np.asarray(s2.particles), atol=1e-6
        )
        np.testing.assert_allclose(float(s1.log_z), float(s2.log_z), atol=1e-4)


class TestWasteFreeSMC:
    def test_posterior_and_evidence_match_closed_form(self):
        """Waste-free SMC (all mutation states kept as particles) targets
        the same posterior/evidence as standard SMC."""
        phi, prior, mean, cov, log_z = TestSMCEndToEnd._problem(TestSMCEndToEnd)
        state, info = smc.run(
            phi, prior, jax.random.key(0), n_particles=4096,
            mutation_steps=7, pcn_step=0.5, waste_free=True,
        )
        assert float(state.beta) == 1.0
        p = np.asarray(state.particles)
        np.testing.assert_allclose(p.mean(axis=0), mean, atol=0.05)
        np.testing.assert_allclose(np.cov(p.T), cov, atol=0.06)
        np.testing.assert_allclose(float(state.log_z), log_z, atol=0.12)
        # potentials cache stays consistent with positions through the
        # chain-unrolled cloud
        np.testing.assert_allclose(
            np.asarray(state.potentials),
            np.asarray(jax.vmap(phi)(state.particles)),
            rtol=2e-3, atol=2e-3,
        )

    def test_divisibility_enforced(self):
        phi, prior, *_ = TestSMCEndToEnd._problem(TestSMCEndToEnd)
        with pytest.raises(ValueError):
            smc.run(phi, prior, jax.random.key(0), n_particles=1000,
                    mutation_steps=5, waste_free=True)  # 1000 % 6 != 0


class TestAdaptiveMutationCounts:
    def test_esjd_target_varies_counts_and_matches_posterior(self):
        """ESJD-targeted mutation: early (easy) stages use fewer steps than
        the cap, posterior still matches the closed form."""
        phi, prior, mean, cov, log_z = TestSMCEndToEnd._problem(TestSMCEndToEnd)
        state, info = smc.run(
            phi, prior, jax.random.key(0), n_particles=4096,
            mutation_steps=20, pcn_step=0.5, esjd_target=2.0,
        )
        assert float(state.beta) == 1.0
        p = np.asarray(state.particles)
        np.testing.assert_allclose(p.mean(axis=0), mean, atol=0.05)
        np.testing.assert_allclose(float(state.log_z), log_z, atol=0.12)
        n = int(info.n_stages)
        counts = np.asarray(info.mutation_counts)[:n]
        assert np.all(counts >= 1) and np.all(counts <= 20)
        assert counts.min() < 20  # the target actually stopped some stage early

    def test_incompatible_with_waste_free(self):
        phi, prior, *_ = TestSMCEndToEnd._problem(TestSMCEndToEnd)
        with pytest.raises(ValueError):
            smc.run(phi, prior, jax.random.key(0), n_particles=1024,
                    mutation_steps=7, waste_free=True, esjd_target=1.0)


class TestThermodynamicIntegration:
    def test_ti_anchors_evidence(self):
        """TI (path sampling over the β ladder) and the SMC telescoping
        estimator agree with each other AND the closed-form evidence —
        two estimators, one run (the evidence anchor)."""
        phi, prior, mean, cov, log_z = TestSMCEndToEnd._problem(TestSMCEndToEnd)
        state, info = smc.run(
            phi, prior, jax.random.key(3), n_particles=4096,
            mutation_steps=10, pcn_step=0.5, ess_target=0.95, max_stages=200,
        )
        assert int(info.n_stages) >= 10  # fine ladder: trapezoid bias small
        ti = smc.thermodynamic_log_z(info)
        np.testing.assert_allclose(ti, log_z, atol=0.15)
        np.testing.assert_allclose(ti, float(state.log_z), atol=0.15)


class TestBatchedSMC:
    """smc.run_batched (warm/batched mutation path — VERDICT round-1 item 4):
    same algorithm as smc.run, chain-last batched potential, optional carried
    warm solves. Correctness anchor: the closed-form linear-Gaussian
    posterior/evidence, plus cross-path agreement on Darcy."""

    def test_matches_closed_form_posterior_and_evidence(self):
        phi, prior, mean, cov, log_z = TestSMCEndToEnd._problem(TestSMCEndToEnd)
        phi_b = lambda U: 0.5 * jnp.sum(
            ((jnp.asarray([1.0, -0.5, 0.3], jnp.float32)[:, None]
              - jnp.asarray([[1.0, 0.5], [0.0, 1.0], [1.0, -1.0]],
                            jnp.float32) @ U) / 0.5) ** 2, axis=0)
        # ess_target 0.8 → fine β ladder, so the TI trapezoid cross-anchor
        # is usable too (coarse ladders bias the β-integral, not the SMC
        # telescoping estimate)
        state, info = smc.run_batched(
            phi_b, np.zeros(2), np.ones(2), jax.random.key(0),
            n_particles=4096, ess_target=0.8, mutation_steps=10, pcn_step=0.5,
        )
        emp_mean = np.asarray(state.particles).mean(axis=1)
        np.testing.assert_allclose(emp_mean, mean, atol=0.05)
        np.testing.assert_allclose(float(state.log_z), log_z, atol=0.12)
        # TI cross-anchor on the same run
        np.testing.assert_allclose(
            smc.thermodynamic_log_z(info), log_z, atol=0.3
        )

    def test_warm_path_matches_cold_batched(self):
        """Carried-solve warm evaluation ≡ cold batched evaluation in
        distribution: identity 'solve' whose aux is just passed through."""
        phi, prior, mean, cov, log_z = TestSMCEndToEnd._problem(TestSMCEndToEnd)
        yj = jnp.asarray([1.0, -0.5, 0.3], jnp.float32)[:, None]
        Aj = jnp.asarray([[1.0, 0.5], [0.0, 1.0], [1.0, -1.0]], jnp.float32)
        phi_b = lambda U: 0.5 * jnp.sum(((yj - Aj @ U) / 0.5) ** 2, axis=0)
        phi2 = lambda U, X: (phi_b(U), X)
        state, _ = smc.run_batched(
            None, np.zeros(2), np.ones(2), jax.random.key(0),
            n_particles=2048, warm_potential_fn=phi2, aux_dim=3,
            ess_target=0.5, mutation_steps=10, pcn_step=0.5,
        )
        np.testing.assert_allclose(
            np.asarray(state.particles).mean(axis=1), mean, atol=0.07
        )
        np.testing.assert_allclose(float(state.log_z), log_z, atol=0.15)

    def test_darcy_smc_warm_config_agrees_with_cold(self):
        """The registered darcy_smc_warm config reproduces darcy_smc's
        log-evidence within MC error at reduced particle count (same
        posterior, same adaptive ladder)."""
        from ip_mcmc_tpu import configs, runner

        cold = configs.build("darcy_smc")
        warm = configs.build("darcy_smc_warm")
        m_cold = runner.run_problem(cold, key=jax.random.key(0), n_chains=256)
        m_warm = runner.run_problem(warm, key=jax.random.key(0), n_chains=256)
        assert m_warm["kernel"] == "smc(batched+warm)"
        assert abs(m_warm["log_evidence"] - m_cold["log_evidence"]) < 3.0
        # posterior agreement within MC error: two COLD runs at 256
        # particles differ by RMS ≈ 0.55 over the 64 (mostly prior-wide)
        # dims (measured, seeds 0 vs 7) — warm-vs-cold must sit inside that
        mc = np.asarray(m_cold["posterior_mean"])
        mw = np.asarray(m_warm["posterior_mean"])
        assert np.sqrt(((mc - mw) ** 2).mean()) < 0.8
