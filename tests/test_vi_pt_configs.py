"""Registry/runner/CLI integration of the VI and PT backends (VERDICT
round-1 item 3: modules that no config or runner path could reach were
half-done). Each test drives the same ``runner.run_problem`` entry the CLI
uses, on a CI-sized shrink of the registered config."""

import jax
import numpy as np
import pytest

from ip_mcmc_tpu import configs, runner


def test_lingauss_advi_matches_exact_posterior():
    """Full-rank ADVI on the conjugate linear-Gaussian IP: the variational
    family contains the exact posterior, so fitted moments must converge to
    the closed form (mirror of test_lingauss_matches_exact_posterior)."""
    p = configs.build("lingauss_advi")
    m = runner.run_problem(p, key=jax.random.key(0))
    assert m["kernel"] == "vi(full_rank)"
    assert m["mean_error_vs_exact"] < 0.02
    assert m["cov_error_vs_exact"] < 0.02
    # ELBO at the optimum of an exact family = log evidence (finite, sane)
    assert np.isfinite(m["final_elbo"])


def test_darcy_advi_runs():
    p = configs.build("darcy_advi")
    p.kernel_params["num_steps"] = 200
    m = runner.run_problem(p, key=jax.random.key(0))
    assert m["kernel"] == "vi(mean_field)"
    assert np.isfinite(m["final_elbo"])
    assert len(m["posterior_mean"]) == 64


def test_darcy_advi_warmstart_cuts_initial_misfit():
    """The VI-initialized chains must start at a far lower data misfit than
    prior-initialized ones — the measurable 'burn-in saved'."""
    p = configs.build("darcy_advi_warmstart")
    p.n_chains, p.n_samples, p.burn_in = 64, 60, 40
    p.kernel_params["vi_init"]["num_steps"] = 300
    m = runner.run_problem(p, key=jax.random.key(0))
    assert m["init_potential_vi"] < 0.2 * m["init_potential_prior"]
    assert m["vi_fit_s"] > 0


def test_multimodal_pt_balances_modes():
    """PT cold chain visits both modes of the bimodal target in proportion
    — the capability plain pCN lacks at this separation (see
    test_pt_mixes_bimodal_where_pcn_fails for the negative control)."""
    p = configs.build("multimodal_pt")
    p.n_chains, p.n_samples, p.burn_in = 64, 400, 150
    m = runner.run_problem(p, key=jax.random.key(0))
    assert m["kernel"] == "pt(pcn)"
    assert 0.35 < m["mode_balance"] < 0.65
    # adapted ladder: strictly decreasing, pinned endpoints
    betas = np.asarray(m["betas"])
    assert betas[0] == 1.0 and abs(betas[-1] - 0.05) < 1e-6
    assert np.all(np.diff(betas) < 0)
    # posterior mean of the symmetric mixture is 0
    assert np.abs(np.asarray(m["posterior_mean"])).max() < 0.6


@pytest.mark.slow
def test_multimodal_pt_mala_balances_modes():
    p = configs.build("multimodal_pt_mala")
    p.n_chains, p.n_samples, p.burn_in = 64, 400, 150
    m = runner.run_problem(p, key=jax.random.key(0))
    assert m["kernel"] == "pt(mala)"
    assert 0.3 < m["mode_balance"] < 0.7


def test_cli_reaches_vi_and_pt():
    """The argparse surface accepts the new configs (the CLI builds its
    choices from the registry; this guards against registry typos)."""
    from ip_mcmc_tpu.run import main

    # --list exercises the registry docstrings for every config
    assert main(["--list"]) == 0
    for name in ("lingauss_advi", "darcy_advi", "darcy_advi_warmstart",
                 "multimodal_pt", "multimodal_pt_mala"):
        assert name in configs.REGISTRY
