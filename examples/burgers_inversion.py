"""Conservation-law initial-data inversion (the reference's headline
experiment class, SURVEY.md §3.3/§3.4): infer uncertain Burgers initial data
from noisy point observations of the evolved solution, using derivative-free
pCN (the forward map forms shocks — no gradients).

Run: python examples/burgers_inversion.py [--plot out.png]
"""

import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu import diagnostics, distributions, driver, potentials
from ip_mcmc_tpu.kernels import pcn
from ip_mcmc_tpu.models import burgers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", default=None)
    ap.add_argument("--n-chains", type=int, default=512)
    ap.add_argument("--n-samples", type=int, default=800)
    args = ap.parse_args()

    n_cells, n_modes = 128, 16
    x = (np.arange(n_cells) + 0.5) / n_cells
    fwd, aux = burgers.make_burgers_forward(
        n_cells=n_cells, n_modes=n_modes, t_final=0.2,
        mean_profile=np.sin(2 * np.pi * x),
    )
    prior = distributions.DiagGaussian(mean=jnp.zeros(n_modes), scale=jnp.ones(n_modes))
    u_true = prior.sample(jax.random.key(10))
    m = len(aux["obs_indices"])
    noise = distributions.DiagGaussian(mean=jnp.zeros(m), scale=0.02 * jnp.ones(m))
    y = fwd(u_true) + noise.sample(jax.random.key(11))
    phi = potentials.misfit_potential(fwd, y, noise)

    kernel = pcn.build_kernel(phi, prior, beta=0.15)
    key_i, key_r = jax.random.split(jax.random.key(0))
    state = driver.init_chains(pcn.init, prior.sample(key_i, (args.n_chains,)), phi)
    _, samples, infos = driver.sample_chains(
        kernel, state, key_r, n_samples=args.n_samples, burn_in=800
    )
    coeffs = np.asarray(samples).reshape(-1, n_modes)
    print(f"accept rate: {np.asarray(infos.accepted).mean():.3f}")
    print(f"min ESS    : {float(diagnostics.ess_per_param(samples).min()):.0f}")

    # reconstruct posterior-mean initial data vs truth
    basis = np.asarray(aux["scaled_basis"])
    mean_profile = np.asarray(aux["mean"])
    u0_post = mean_profile + coeffs.mean(axis=0) @ basis
    u0_true = mean_profile + np.asarray(u_true) @ basis
    u0_std = (coeffs @ basis).std(axis=0)
    rel_err = np.abs(u0_post - u0_true).max() / np.abs(u0_true).max()
    print(f"initial-data max rel error of posterior mean: {rel_err:.3f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(x, u0_true, "k-", label="true initial data")
        ax.plot(x, u0_post, "r--", label="posterior mean")
        ax.fill_between(
            x, u0_post - 2 * u0_std, u0_post + 2 * u0_std, alpha=0.25,
            label="±2σ",
        )
        ax.legend()
        ax.set_title("Burgers initial-data inversion (pCN)")
        fig.savefig(args.plot, dpi=100, bbox_inches="tight")
        print(f"plot saved to {args.plot}")


if __name__ == "__main__":
    main()
