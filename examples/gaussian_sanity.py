"""Sanity experiment (reference examples/ parity, SURVEY.md §3.2): RWM on an
analytic 2-D Gaussian target, validated against the closed form, with the
posterior histogram plot the reference produces.

Run: python examples/gaussian_sanity.py [--plot out.png]
"""

import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu import diagnostics, driver
from ip_mcmc_tpu.distributions import Gaussian
from ip_mcmc_tpu.kernels import rwm

MEAN = np.array([1.0, -0.5])
COV = np.array([[2.0, 0.8], [0.8, 1.0]])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", default=None, help="save posterior plot to file")
    ap.add_argument("--n-chains", type=int, default=256)
    ap.add_argument("--n-samples", type=int, default=1000)
    args = ap.parse_args()

    target = Gaussian.from_covariance(jnp.asarray(MEAN), jnp.asarray(COV))
    kernel = rwm.build_kernel(target.log_prob, step_size=0.8)
    key_i, key_r = jax.random.split(jax.random.key(0))
    state = driver.init_chains(
        rwm.init, jax.random.normal(key_i, (args.n_chains, 2)), target.log_prob
    )
    _, samples, infos = driver.sample_chains(
        kernel, state, key_r, n_samples=args.n_samples, burn_in=500
    )
    flat = np.asarray(samples).reshape(-1, 2)
    summ = diagnostics.summarize(samples)

    print(f"accept rate : {np.asarray(infos.accepted).mean():.3f}")
    print(f"mean        : {flat.mean(axis=0)}  (exact {MEAN})")
    print(f"cov         :\n{np.cov(flat.T)}\n(exact)\n{COV}")
    print(f"min ESS     : {float(summ['min_ess']):.0f}")
    print(f"max R-hat   : {float(summ['max_rhat']):.4f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].hist2d(flat[:, 0], flat[:, 1], bins=60)
        axes[0].plot(*MEAN, "r+", markersize=12)
        axes[0].set_title("posterior samples")
        for i, ax in enumerate([axes[1]]):
            ax.hist(flat[:, 0], bins=80, density=True, alpha=0.6, label="samples")
            g = np.linspace(flat[:, 0].min(), flat[:, 0].max(), 200)
            ax.plot(
                g,
                np.exp(-0.5 * (g - MEAN[0]) ** 2 / COV[0, 0])
                / np.sqrt(2 * np.pi * COV[0, 0]),
                "r-",
                label="exact marginal",
            )
            ax.legend()
        fig.savefig(args.plot, dpi=100, bbox_inches="tight")
        print(f"plot saved to {args.plot}")


if __name__ == "__main__":
    main()
