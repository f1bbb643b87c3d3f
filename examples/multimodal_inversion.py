"""Multimodal posterior: what breaks single-temperature MCMC, and the two
cures this framework ships — parallel tempering (with swap-rate-adapted
ladder) and tempered SMC.

Target: symmetric bimodal mixture under a wide Gaussian prior. Plain pCN
gets stuck in whichever mode it starts near; PT's hot replicas cross the
barrier and swaps transport states to the cold chain; SMC anneals from the
prior so the particle cloud never has to tunnel at all.

Run: python examples/multimodal_inversion.py [--plot out.png]
"""

import argparse

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu import driver, smc
from ip_mcmc_tpu.distributions import DiagGaussian
from ip_mcmc_tpu.kernels import pcn, tempering

SEP, SIG = 2.5, 0.35


def build_problem():
    prior = DiagGaussian(mean=jnp.zeros(1), scale=3.0 * jnp.ones(1))

    def log_mix(u):
        a = -0.5 * jnp.sum((u - SEP) ** 2) / SIG**2
        b = -0.5 * jnp.sum((u + SEP) ** 2) / SIG**2
        return jnp.logaddexp(a, b)

    phi = lambda u: -log_mix(u) - prior.potential(u)
    return prior, phi


def occupancy(x):
    """Fraction of samples in the right mode (0.5 = correct)."""
    return float((np.asarray(x).reshape(-1) > 0).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plot", default=None)
    ap.add_argument("--n-chains", type=int, default=256)
    args = ap.parse_args()
    prior, phi = build_problem()
    n = args.n_chains

    # --- 1. plain pCN: stuck (each chain stays in its starting mode) ------
    kernel = pcn.build_kernel(phi, prior, beta=0.3)
    # start ALL chains in the left mode to make the failure visible
    positions = -SEP + 0.1 * jax.random.normal(jax.random.key(0), (n, 1))
    state = driver.init_chains(pcn.init, positions, phi)
    _, s_pcn, _ = driver.sample_chains(
        kernel, state, jax.random.key(1), n_samples=500, burn_in=200
    )
    print(f"plain pCN   : right-mode occupancy {occupancy(s_pcn):.3f} "
          "(should be 0.5; stuck near 0.0)")

    # --- 2. PT with a swap-rate-adapted ladder ----------------------------
    pt_states, betas, _ = tempering.adapt_ladder(
        phi, prior, positions, jax.random.key(2),
        n_temps=6, num_steps=300, swap_center=0.4, pcn_step=0.4,
    )
    pt_kernel = tempering.build_kernel(phi, prior, betas, pcn_step=0.4)
    _, s_pt, info = driver.sample_chains(
        pt_kernel, pt_states, jax.random.key(3), n_samples=500, burn_in=100,
        record_fn=lambda st: st.positions[..., 0, :],  # cold chain
    )
    print(f"PT (adapted ladder {np.round(np.asarray(betas), 3)}): "
          f"right-mode occupancy {occupancy(s_pt):.3f}")

    # --- 3. tempered SMC ---------------------------------------------------
    final, sinfo = smc.run(
        phi, prior, jax.random.key(4), n_particles=4 * n,
        mutation_steps=10, pcn_step=0.3,
    )
    print(f"SMC ({int(sinfo.n_stages)} stages): right-mode occupancy "
          f"{occupancy(final.particles):.3f}, log Z = {float(final.log_z):.3f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(12, 3), sharex=True)
        for ax, (x, title) in zip(axes, [
            (s_pcn, "plain pCN (stuck)"),
            (s_pt, "parallel tempering"),
            (final.particles, "tempered SMC"),
        ]):
            ax.hist(np.asarray(x).reshape(-1), bins=80, density=True)
            ax.set_title(title)
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
