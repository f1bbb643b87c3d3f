"""Karhunen–Loève expansion utilities for Gaussian random-field priors.

The reference represents unknown fields by truncated KL expansions of a
Gaussian prior (SURVEY.md §1.1 [H]): u(x) = Σ_k c_k √λ_k φ_k(x), with the
coefficients c ~ N(0, I) in whitened coordinates (equivalently c_k ~ N(0, λ_k)
with φ_k orthonormal). Samplers operate on the coefficient vector; the field
reconstruction is ONE matmul coeffs @ basis — exactly what the MXU wants, and
it batches over thousands of chains for free.

We use the Fourier sine/cosine eigenbasis on [0,1] (the KL basis of the
periodic / Dirichlet Laplacian-inverse-power covariance C = (−Δ)^{−α},
Stuart 2010 §2.4), with eigenvalues λ_k ∝ (πk)^{−2α}.
"""

from __future__ import annotations

import numpy as np


def sine_basis(n_modes: int, grid: np.ndarray) -> np.ndarray:
    """Orthonormal Dirichlet eigenfunctions φ_k(x)=√2 sin(kπx), k=1..n.

    Returns (n_modes, n_grid) — apply with ``coeffs @ basis``.
    """
    k = np.arange(1, n_modes + 1)[:, None]
    return np.sqrt(2.0) * np.sin(np.pi * k * grid[None, :])


def fourier_basis(n_modes: int, grid: np.ndarray) -> np.ndarray:
    """Orthonormal periodic basis: 1, √2 cos(2πx), √2 sin(2πx), ... ."""
    rows = [np.ones_like(grid)]
    j = 1
    while len(rows) < n_modes:
        rows.append(np.sqrt(2.0) * np.cos(2.0 * np.pi * j * grid))
        if len(rows) < n_modes:
            rows.append(np.sqrt(2.0) * np.sin(2.0 * np.pi * j * grid))
        j += 1
    return np.stack(rows[:n_modes])


def laplacian_eigenvalues(n_modes: int, alpha: float = 2.0, scale: float = 1.0):
    """λ_k = scale · (πk)^{−2α}: KL spectrum of C = scale·(−Δ)^{−α}."""
    k = np.arange(1, n_modes + 1)
    return scale * (np.pi * k) ** (-2.0 * alpha)


def sine_basis_2d(n_modes_per_dim: int, n_grid: int):
    """2-D tensor sine basis on the unit square, flattened.

    Returns (basis, eigen_index): basis is (K, n_grid*n_grid) with
    K = n_modes_per_dim², rows φ_{ij}(x,y) = 2 sin(iπx) sin(jπy) evaluated at
    cell centers; eigen_index is the (K, 2) array of (i, j) mode numbers for
    spectrum construction.
    """
    centers = (np.arange(n_grid) + 0.5) / n_grid
    b1 = np.sqrt(2.0) * np.sin(
        np.pi * np.arange(1, n_modes_per_dim + 1)[:, None] * centers[None, :]
    )  # (m, n)
    basis = np.einsum("ix,jy->ijxy", b1, b1).reshape(
        n_modes_per_dim * n_modes_per_dim, n_grid * n_grid
    )
    ij = np.stack(
        np.meshgrid(
            np.arange(1, n_modes_per_dim + 1),
            np.arange(1, n_modes_per_dim + 1),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 2)
    return basis, ij


def laplacian_eigenvalues_2d(eigen_index: np.ndarray, alpha: float = 2.0, scale: float = 1.0):
    """λ_{ij} = scale · (π²(i²+j²))^{−α} for the 2-D tensor modes."""
    k2 = np.pi**2 * (eigen_index[:, 0] ** 2 + eigen_index[:, 1] ** 2)
    return scale * k2 ** (-alpha)
