import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu import diagnostics
from tests.oracle.oracle_mcmc import ess_numpy


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1000, 4))
    e = float(diagnostics.ess(jnp.array(x)))
    assert 2500 < e < 5600  # ~n*m = 4000 within estimator noise


def test_ess_ar1_reduced():
    rng = np.random.default_rng(1)
    rho = 0.9
    n, m = 2000, 4
    x = np.zeros((n, m))
    eps = rng.standard_normal((n, m))
    for t in range(1, n):
        x[t] = rho * x[t - 1] + np.sqrt(1 - rho**2) * eps[t]
    e = float(diagnostics.ess(jnp.array(x)))
    # theoretical ESS factor (1-rho)/(1+rho) ≈ 0.0526 → ~421 of 8000
    assert 150 < e < 900


def test_ess_matches_numpy_oracle():
    """Same estimator on both sides — required for honest benchmark accounting
    (SURVEY.md §7.3 item 6)."""
    rng = np.random.default_rng(2)
    x = np.cumsum(rng.standard_normal((500, 8)), axis=0) * 0.1 + rng.standard_normal((500, 8))
    np.testing.assert_allclose(
        float(diagnostics.ess(jnp.array(x, dtype=jnp.float32))),
        ess_numpy(x),
        rtol=2e-3,
    )


def test_rhat_converged_near_one():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1000, 8))
    r = float(diagnostics.split_rhat(jnp.array(x)))
    assert 0.99 < r < 1.02


def test_rhat_detects_disagreement():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((500, 4))
    x[:, 0] += 5.0  # one chain stuck elsewhere
    r = float(diagnostics.split_rhat(jnp.array(x)))
    assert r > 1.5


def test_summarize_shapes():
    rng = np.random.default_rng(5)
    s = jnp.array(rng.standard_normal((200, 4, 3)))
    out = diagnostics.summarize(s)
    assert out["mean"].shape == (3,)
    assert out["ess"].shape == (3,)
    assert out["rhat"].shape == (3,)


def test_diagnostics_jittable():
    f = jax.jit(diagnostics.ess)
    x = jnp.array(np.random.default_rng(6).standard_normal((256, 4)))
    assert np.isfinite(float(f(x)))


class TestRankNormalizedRhat:
    def test_iid_chains_near_one(self):
        x = jax.random.normal(jax.random.key(0), (400, 8))
        r = float(diagnostics.rank_normalized_rhat(x))
        assert 0.99 < r < 1.02

    def test_detects_location_shift(self):
        x = jax.random.normal(jax.random.key(1), (400, 8))
        x = x.at[:, 0].add(3.0)  # one stuck/offset chain
        assert float(diagnostics.rank_normalized_rhat(x)) > 1.1

    def test_folded_detects_scale_mismatch(self):
        """Chains agree in mean but not variance: plain split-R̂ stays ≈ 1,
        the folded rank-normalized version flags it."""
        x = jax.random.normal(jax.random.key(2), (400, 8))
        x = x.at[:, :4].multiply(3.0)
        plain = float(diagnostics.split_rhat(x))
        ranked = float(diagnostics.rank_normalized_rhat(x))
        assert plain < 1.05
        assert ranked > 1.1

    def test_robust_to_heavy_tails(self):
        """Cauchy draws: plain R̂ is erratic; rank-normalized stays ≈ 1 for
        well-mixed chains."""
        x = jax.random.cauchy(jax.random.key(3), (400, 8))
        r = float(diagnostics.rank_normalized_rhat(x))
        assert 0.99 < r < 1.05

    def test_summarize_includes_rank_rhat(self):
        s = jax.random.normal(jax.random.key(4), (100, 8, 3))
        out = diagnostics.summarize(s)
        assert float(out["max_rank_rhat"]) < 1.05


class TestPerParamMapping:
    """The per-param estimators run via lax.map over the parameter axis
    (diagnostics._per_param): the former vmap multiplied the FFT's peak
    memory by dim and OOM'd 16 GB HBM on the bench's honest-ESS series
    (round 3). These tests pin equivalence with the vmapped math."""

    def test_matches_vmap(self):
        drift = 0.1 * jnp.cumsum(
            jax.random.normal(jax.random.key(11), (300, 64, 7)), axis=0)
        x = jax.random.normal(jax.random.key(10), (300, 64, 7)) + drift
        np.testing.assert_allclose(
            diagnostics.ess_per_param(x),
            jax.vmap(diagnostics.ess, in_axes=2)(x), rtol=2e-5)
        np.testing.assert_allclose(
            diagnostics.rhat_per_param(x),
            jax.vmap(diagnostics.split_rhat, in_axes=2)(x), rtol=1e-5)
        np.testing.assert_allclose(
            diagnostics.rank_rhat_per_param(x),
            jax.vmap(diagnostics.rank_normalized_rhat, in_axes=2)(x),
            rtol=1e-5)

    def test_jits_inside_summarize(self):
        # lax.map inside the jitted summarize: one program, correct shapes
        s = jax.random.normal(jax.random.key(12), (200, 16, 5))
        out = diagnostics.summarize(s)
        assert out["ess"].shape == (5,) and out["rhat"].shape == (5,)
