"""NumPy oracle for the Darcy pCN benchmark: the reference-equivalent
single-process single-chain loop (SURVEY.md §6 — the reference publishes no
numbers, so the build creates the baseline by running its own
reference-equivalent implementation with identical algorithm + ESS
estimator).

Same math as ip_mcmc_tpu.models.darcy + kernels.pcn, in the reference's
idiom: Python per-step loop, NumPy dense linalg, one chain.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import scipy.linalg

from ip_mcmc_tpu.models import darcy, kl


class OracleDarcyPCN:
    def __init__(self, n_grid=16, n_modes_per_dim=8, alpha=2.0, field_scale=10.0):
        basis, ij = kl.sine_basis_2d(n_modes_per_dim, n_grid)
        lam = kl.laplacian_eigenvalues_2d(ij, alpha=alpha, scale=field_scale)
        self.scaled_basis = np.sqrt(lam)[:, None] * basis
        self.n = n_grid
        self.indices = darcy._stencil_indices(n_grid)
        self.obs = np.asarray(darcy.default_observation_indices(n_grid))
        self.f = np.ones(n_grid * n_grid)
        self.K = self.scaled_basis.shape[0]

    def assemble(self, a):
        h_left, h_right, v_top, v_bot, b_cells = self.indices
        n = self.n
        h2 = float(n * n)
        af = a.reshape(-1)
        N = n * n
        t_h = 2.0 * af[h_left] * af[h_right] / (af[h_left] + af[h_right]) * h2
        t_v = 2.0 * af[v_top] * af[v_bot] / (af[v_top] + af[v_bot]) * h2
        t_b = 2.0 * af[b_cells] * h2
        A = np.zeros((N, N))
        A[h_left, h_right] -= t_h
        A[h_right, h_left] -= t_h
        A[v_top, v_bot] -= t_v
        A[v_bot, v_top] -= t_v
        diag = np.zeros(N)
        np.add.at(diag, h_left, t_h)
        np.add.at(diag, h_right, t_h)
        np.add.at(diag, v_top, t_v)
        np.add.at(diag, v_bot, t_v)
        np.add.at(diag, b_cells, t_b)
        A[np.arange(N), np.arange(N)] += diag
        return A

    def forward(self, u):
        log_a = u @ self.scaled_basis
        a = np.exp(log_a)
        A = self.assemble(a)
        c, low = scipy.linalg.cho_factor(A, lower=True, check_finite=False)
        p = scipy.linalg.cho_solve((c, low), self.f, check_finite=False)
        return p[self.obs]

    def potential(self, u, y, noise_std):
        r = (y - self.forward(u)) / noise_std
        return 0.5 * r @ r

    def run_pcn(self, y, noise_std, beta, n_steps, rng, u0=None):
        """Reference-idiom pCN chain; returns (samples, accept_rate)."""
        u = rng.standard_normal(self.K) if u0 is None else np.array(u0)
        phi = self.potential(u, y, noise_std)
        contraction = np.sqrt(1.0 - beta**2)
        samples = np.empty((n_steps, self.K))
        accepts = 0
        for i in range(n_steps):
            xi = rng.standard_normal(self.K)
            v = contraction * u + beta * xi
            phi_v = self.potential(v, y, noise_std)
            if np.log(rng.uniform()) < phi - phi_v:
                u, phi = v, phi_v
                accepts += 1
            samples[i] = u
        return samples, accepts / n_steps
