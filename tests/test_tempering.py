"""Parallel tempering: swap correctness and multimodal mixing that plain
pCN cannot achieve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import driver
from ip_mcmc_tpu.distributions import DiagGaussian
from ip_mcmc_tpu.kernels import pcn, tempering

SEP, SIG = 2.5, 0.3


def _bimodal_setup():
    prior = DiagGaussian(mean=jnp.zeros(1), scale=3.0 * jnp.ones(1))

    def log_mix(u):
        a = -0.5 * jnp.sum((u - SEP) ** 2) / SIG**2
        b = -0.5 * jnp.sum((u + SEP) ** 2) / SIG**2
        return jnp.logaddexp(a, b)

    phi = lambda u: -log_mix(u) - prior.potential(u)
    return prior, phi


def test_ladder_shape():
    b = tempering.geometric_ladder(6, beta_min=0.1)
    assert b.shape == (6,)
    np.testing.assert_allclose(float(b[0]), 1.0)
    np.testing.assert_allclose(float(b[-1]), 0.1, rtol=1e-5)
    assert np.all(np.diff(np.asarray(b)) < 0)


def test_swap_preserves_potential_consistency():
    prior, phi = _bimodal_setup()
    betas = tempering.geometric_ladder(4)
    kernel = tempering.build_kernel(phi, prior, betas, pcn_step=0.4)
    state = tempering.init(jnp.array([0.5]), phi, 4)
    for i in range(30):
        state, info = kernel(jax.random.key(i), state)
    # cached Φ stays consistent with the positions through swaps
    np.testing.assert_allclose(
        np.asarray(state.potentials),
        np.asarray(jax.vmap(phi)(state.positions)),
        rtol=1e-4, atol=1e-4,
    )


def test_pt_mixes_bimodal_where_pcn_fails():
    prior, phi = _bimodal_setup()
    n_chains, n_samples = 64, 800

    # plain pCN: chains started in the + mode stay there
    kernel_p = pcn.build_kernel(phi, prior, beta=0.3)
    pos0 = jnp.full((n_chains, 1), SEP)
    st = driver.init_chains(pcn.init, pos0, phi)
    _, samples_p, _ = driver.sample_chains(
        kernel_p, st, jax.random.key(0), n_samples=n_samples, burn_in=200
    )
    frac_neg_pcn = float((np.asarray(samples_p) < 0).mean())

    # PT with a 6-rung ladder from the same one-mode start
    betas = tempering.geometric_ladder(6, beta_min=0.02)
    kernel_t = tempering.build_kernel(phi, prior, betas, pcn_step=0.5)
    st = driver.init_chains(
        tempering.init, pos0, phi, 6
    )
    _, samples_t, infos = driver.sample_chains(
        kernel_t, st, jax.random.key(1), n_samples=n_samples, burn_in=200,
        record_fn=lambda s: tempering.cold_chain(s),
    )
    cold = np.asarray(samples_t)  # (n_samples, n_chains, 1)
    frac_neg_pt = float((cold < 0).mean())

    assert frac_neg_pcn < 0.02, "pCN unexpectedly crossed the barrier"
    assert 0.25 < frac_neg_pt < 0.75, f"PT failed to mix: {frac_neg_pt}"
    assert float(np.asarray(infos.swap_rate).mean()) > 0.1
    # symmetric mixture: |mean| of cold chain near SEP in magnitude-average
    np.testing.assert_allclose(np.abs(cold).mean(), SEP, atol=0.4)


class TestLadderAdaptation:
    def test_betas_from_gaps_monotone(self):
        rho = jnp.array([-1.0, 0.0, 1.0])
        b = tempering.betas_from_gaps(rho)
        assert b.shape == (4,)
        np.testing.assert_allclose(float(b[0]), 1.0)
        assert np.all(np.diff(np.asarray(b)) < 0) and float(b[-1]) > 0

    def test_betas_from_shares_pins_endpoints(self):
        rho = jnp.array([0.3, -0.2, 1.0])
        b = tempering.betas_from_shares(rho, 0.05)
        assert b.shape == (4,)
        np.testing.assert_allclose(float(b[0]), 1.0)
        np.testing.assert_allclose(float(b[-1]), 0.05, rtol=1e-5)
        assert np.all(np.diff(np.asarray(b)) < 0)
        # shift invariance: only relative shares matter
        b2 = tempering.betas_from_shares(rho + 7.0, 0.05)
        np.testing.assert_allclose(np.asarray(b), np.asarray(b2), rtol=1e-5)

    def test_adapted_ladder_equalizes_swap_rates(self):
        """After adaptation the per-ATTEMPT swap rates are equalized across
        pairs (the equi-acceptance optimum for round trips), with the
        endpoints β=1 and β=beta_min pinned."""
        prior, phi = _bimodal_setup()
        positions = prior.sample(jax.random.key(0), (256,))
        target = 0.4
        states, betas, adapt_rates = tempering.adapt_ladder(
            phi, prior, positions, jax.random.key(1),
            n_temps=6, num_steps=400, swap_center=target, pcn_step=0.4,
            beta_min=0.05,
        )
        assert adapt_rates.shape == (5,)
        assert betas.shape == (6,)
        assert np.all(np.diff(np.asarray(betas)) < 0)
        np.testing.assert_allclose(float(betas[0]), 1.0)
        np.testing.assert_allclose(float(betas[-1]), 0.05, rtol=1e-4)
        # measure realized swap probabilities with the FROZEN ladder
        kernel = tempering.build_kernel(phi, prior, betas, pcn_step=0.4)
        n = 256

        def body(sts, i):
            keys = jax.random.split(jax.random.fold_in(jax.random.key(2), i), n)
            sts, infos = jax.vmap(kernel)(keys, sts)
            prob = jnp.mean(infos.pair_swap_prob, axis=0)
            act = jnp.mean(infos.pair_active, axis=0)
            return sts, (prob, act)

        # Per-ATTEMPT rate: sum of swap probabilities over sum of attempts
        # (each pair is only attempted every other step — averaging the
        # zeros from inactive steps would halve the estimate and mask an
        # adaptation bias; advisor round-1 finding).
        _, (probs, acts) = jax.lax.scan(body, states, jnp.arange(200))
        probs, acts = np.asarray(probs), np.asarray(acts)
        pair_rates = probs[:, :5].sum(axis=0) / acts[:, :5].sum(axis=0)
        # equalized: spread far below an unadapted geometric ladder's
        # (measured: adapted ~0.004 vs geometric ~0.037 on this target)
        assert pair_rates.max() - pair_rates.min() < 0.05, pair_rates
        # and non-degenerate: every pair actually communicates
        assert np.all(pair_rates > 0.1) and np.all(pair_rates < 0.99)


class TestPTMala:
    def test_grad_cache_consistent_through_swaps(self):
        prior, phi = _bimodal_setup()
        betas = tempering.geometric_ladder(4)
        kernel = tempering.build_mala_kernel(phi, prior, betas, step_size=0.3)
        state = tempering.init_mala(jnp.array([0.5]), phi, 4)
        for i in range(30):
            state, info = kernel(jax.random.key(i), state)
        np.testing.assert_allclose(
            np.asarray(state.potentials),
            np.asarray(jax.vmap(phi)(state.positions)),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(state.phi_grads),
            np.asarray(jax.vmap(jax.grad(phi))(state.positions)),
            rtol=1e-3, atol=1e-3,
        )

    def test_adapt_ladder_composes_with_mala(self):
        """adapt_ladder(mutation='mala') adapts the ladder while running the
        MALA mutation kernel itself (ROADMAP P2): returns a PTMalaState the
        frozen-ladder MALA kernel continues from directly, with a monotone
        pinned-endpoint ladder and a consistent gradient cache."""
        prior, phi = _bimodal_setup()
        positions = prior.sample(jax.random.key(0), (128,))
        states, betas, _ = tempering.adapt_ladder(
            phi, prior, positions, jax.random.key(1),
            n_temps=5, num_steps=200, swap_center=0.4, beta_min=0.05,
            mutation="mala", step_size=0.25,
        )
        assert isinstance(states, tempering.PTMalaState)
        assert np.all(np.diff(np.asarray(betas)) < 0)
        np.testing.assert_allclose(float(betas[0]), 1.0)
        np.testing.assert_allclose(float(betas[-1]), 0.05, rtol=1e-4)
        # Φ cache consistent after 200 adaptation steps of mutate+swap
        np.testing.assert_allclose(
            np.asarray(states.potentials),
            np.asarray(jax.vmap(jax.vmap(phi))(states.positions)),
            rtol=1e-4, atol=1e-4,
        )
        # the production kernel consumes the adapted state as-is
        kernel = tempering.build_mala_kernel(phi, prior, betas, step_size=0.25)
        keys = jax.random.split(jax.random.key(2), 128)
        out, info = jax.vmap(kernel)(keys, states)
        assert out.positions.shape == states.positions.shape
        assert float(info.accept_rate.mean()) > 0.05

    def test_adapt_ladder_rejects_unknown_mutation(self):
        prior, phi = _bimodal_setup()
        positions = prior.sample(jax.random.key(0), (8,))
        with pytest.raises(ValueError, match="mutation"):
            tempering.adapt_ladder(
                phi, prior, positions, jax.random.key(1), mutation="hmc"
            )

    def test_pt_mala_mixes_bimodal(self):
        """PT with MALA mutations crosses the modes of the bimodal target
        (gradient mutations alone would stay unimodal)."""
        prior, phi = _bimodal_setup()
        betas = tempering.geometric_ladder(6, beta_min=0.02)
        kernel = tempering.build_mala_kernel(phi, prior, betas, step_size=0.25)
        n_chains = 64
        states = jax.vmap(lambda p: tempering.init_mala(p, phi, 6))(
            prior.sample(jax.random.key(0), (n_chains,))
        )

        def body(sts, i):
            keys = jax.random.split(jax.random.fold_in(jax.random.key(1), i), n_chains)
            sts, _ = jax.vmap(kernel)(keys, sts)
            return sts, sts.positions[:, 0, :]  # cold chain

        _, cold = jax.lax.scan(body, states, jnp.arange(800))
        cold = np.asarray(cold[200:]).reshape(-1)
        frac_right = (cold > 0).mean()
        assert 0.25 < frac_right < 0.75, f"mode occupancy {frac_right}"
        np.testing.assert_allclose(np.abs(cold).mean(), SEP, atol=0.4)
