"""Darcy-flow forward model: −∇·(a(x)∇p) = f on the unit square, p|∂Ω = 0.

BASELINE.json config 4: "pCN on elliptic-PDE (Darcy-flow) coefficient
inversion, 64-dim KL expansion, 4096 parallel chains". The unknown is the
log-permeability log a(x), a Gaussian random field truncated to a KL
coefficient vector u ∈ R^K (K = 64 = 8×8 tensor sine modes by default).

TPU-native design:
- field reconstruction log a = u·√λ @ basis — one (K)×(K, n²) matmul (MXU);
- cell-centered finite volumes, harmonic-mean face transmissibilities,
  5-point stencil assembled as a DENSE (n², n²) SPD matrix with statically
  precomputed scatter indices — dense because the batched Cholesky
  factorization of thousands of chains' matrices is exactly what the MXU
  eats (a sparse solver would serialize on-chip);
- solve via ``jnp.linalg.cholesky`` + triangular solves — differentiable
  (MALA/NUTS on Darcy work through implicit AD of the solve), and the whole
  forward vmaps over the chain axis;
- observations: static gather of pressure at observation cells.

Reference analog: the PDE evolution operators consumed by
``EvolutionPotential`` (SURVEY.md §2.1 [M]); the elliptic problem is the
smooth-PDE member of BASELINE's config set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu.models import kl


def _stencil_indices(n: int):
    """Static scatter indices for the 5-point FV stencil on an n×n grid."""
    idx = np.arange(n * n).reshape(n, n)
    # horizontal faces: between (i, j) and (i, j+1)
    h_left = idx[:, :-1].ravel()
    h_right = idx[:, 1:].ravel()
    # vertical faces: between (i, j) and (i+1, j)
    v_top = idx[:-1, :].ravel()
    v_bot = idx[1:, :].ravel()
    # boundary cells per edge (for Dirichlet ghost transmissibility)
    b_cells = np.concatenate([idx[0, :], idx[-1, :], idx[:, 0], idx[:, -1]])
    return h_left, h_right, v_top, v_bot, b_cells


def assemble_operator(a, indices, n: int):
    """Dense SPD operator A(a) for conductivity field a (n, n)."""
    h_left, h_right, v_top, v_bot, b_cells = indices
    h2 = float(n * n)  # 1/h²
    af = a.reshape(-1)
    N = n * n
    t_h = 2.0 * af[h_left] * af[h_right] / (af[h_left] + af[h_right]) * h2
    t_v = 2.0 * af[v_top] * af[v_bot] / (af[v_top] + af[v_bot]) * h2
    t_b = 2.0 * af[b_cells] * h2  # Dirichlet: half-cell distance to boundary

    A = jnp.zeros((N, N), dtype=a.dtype)
    A = A.at[h_left, h_right].add(-t_h)
    A = A.at[h_right, h_left].add(-t_h)
    A = A.at[v_top, v_bot].add(-t_v)
    A = A.at[v_bot, v_top].add(-t_v)
    diag = (
        jnp.zeros(N, dtype=a.dtype)
        .at[h_left].add(t_h)
        .at[h_right].add(t_h)
        .at[v_top].add(t_v)
        .at[v_bot].add(t_v)
        .at[b_cells].add(t_b)
    )
    return A + jnp.diag(diag)


def default_observation_indices(n: int, n_obs_per_dim: int = 4):
    """Evenly spaced interior observation cells (flattened indices)."""
    pos = np.linspace(0, n - 1, n_obs_per_dim + 2)[1:-1].round().astype(int)
    ii, jj = np.meshgrid(pos, pos, indexing="ij")
    return (ii * n + jj).ravel()


def make_darcy_forward(
    n_grid: int = 16,
    n_modes_per_dim: int = 8,
    alpha: float = 2.0,
    field_scale: float = 10.0,
    obs_indices=None,
    source=None,
    log_a_mean: float = 0.0,
):
    """Build forward(u): KL coefficients (K,) → pressure at observation cells.

    ``u`` is in WHITENED coordinates (u ~ N(0, I) under the prior); the
    spectrum √λ is folded into the reconstruction so samplers always see an
    isotropic Gaussian prior — the pCN-friendly parameterization.

    Returns (forward, aux) with aux = dict(basis, sqrt_eigenvalues,
    obs_indices, n_grid) for reuse (e.g. plotting, truth synthesis).
    """
    basis_np, ij = kl.sine_basis_2d(n_modes_per_dim, n_grid)
    lam = kl.laplacian_eigenvalues_2d(ij, alpha=alpha, scale=field_scale)
    scaled_basis = jnp.asarray(np.sqrt(lam)[:, None] * basis_np, dtype=jnp.float32)
    indices = _stencil_indices(n_grid)
    if obs_indices is None:
        obs_indices = default_observation_indices(n_grid)
    obs_indices = jnp.asarray(np.asarray(obs_indices))
    if source is None:
        f = jnp.ones(n_grid * n_grid, dtype=jnp.float32)
    else:
        f = jnp.asarray(source, dtype=jnp.float32).reshape(-1)

    def forward(u):
        log_a = log_a_mean + u @ scaled_basis  # (n²,) — MXU matmul
        a = jnp.exp(log_a).reshape(n_grid, n_grid)
        A = assemble_operator(a, indices, n_grid)
        L = jnp.linalg.cholesky(A)
        p = jax.scipy.linalg.cho_solve((L, True), f)
        return p[obs_indices]

    aux = {
        "scaled_basis": scaled_basis,
        "eigenvalues": jnp.asarray(lam),
        "obs_indices": obs_indices,
        "n_grid": n_grid,
        "stencil_indices": indices,
        "source": f,
    }
    return forward, aux


def solve_pressure(u, aux, log_a_mean: float = 0.0):
    """Full pressure field for a coefficient vector (diagnostics/plots)."""
    n = aux["n_grid"]
    log_a = log_a_mean + u @ aux["scaled_basis"]
    a = jnp.exp(log_a).reshape(n, n)
    A = assemble_operator(a, aux["stencil_indices"], n)
    L = jnp.linalg.cholesky(A)
    return jax.scipy.linalg.cho_solve((L, True), aux["source"]).reshape(n, n)
