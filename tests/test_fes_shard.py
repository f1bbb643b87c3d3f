"""Ensemble-sharded FES (parallel/fes_shard.py): mesh-shape invariance —
the 1-device mesh run through the same code is the reference — plus a
distributional anchor on a Gaussian posterior with a known closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu.parallel import fes_shard
from ip_mcmc_tpu.parallel.mesh import make_chain_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

D, M = 16, 4


class _Prior:
    mean = 0.0
    scale = 1.0


def _target_potential(var_low, var_high):
    """Posterior = N(0, diag(var)) under prior N(0, I): Φ = ½uᵀ(Σ⁻¹−I)u."""
    inv_minus_1 = np.concatenate(
        [np.full(M, 1.0 / var_low - 1.0), np.full(D - M, 1.0 / var_high - 1.0)]
    ).astype(np.float32)
    w = jnp.asarray(inv_minus_1)

    def phi(u):
        return 0.5 * jnp.sum(w * u * u)

    return phi


def _run(n_dev, L, n_samples, burn_in, seed=0):
    phi = _target_potential(0.25, 0.5)
    mesh = make_chain_mesh(n_devices=n_dev)
    u0 = jax.random.normal(jax.random.key(seed), (L, D))
    samples, info = fes_shard.sample_fes_sharded(
        phi, _Prior(), mesh=mesh, u0=u0, base_key=jax.random.key(7),
        n_low_modes=M, n_samples=n_samples, burn_in=burn_in,
    )
    return np.asarray(samples), {k: float(v) for k, v in info.items()}


def test_mesh_shape_invariance():
    """(step, global walker id) key discipline → identical trajectories on
    1, 2 and 8 devices (the gather assembles the same global anchor block
    in the same order)."""
    ref, ref_info = _run(1, 32, 25, 10)
    for n_dev in (2, 8):
        s, info = _run(n_dev, 32, 25, 10)
        np.testing.assert_allclose(s, ref, rtol=0, atol=1e-6,
                                   err_msg=f"{n_dev} devices")
        assert info["stretch_accept"] == pytest.approx(
            ref_info["stretch_accept"], abs=1e-6
        )
        assert info["pcn_accept"] == pytest.approx(
            ref_info["pcn_accept"], abs=1e-6
        )


def test_gaussian_posterior_moments():
    """Variance recovery on BOTH blocks: the stretch move owns the first M
    coordinates (var 0.25), the pCN complement the rest (var 0.5) — a wrong
    acceptance ratio in either move shifts its block's variance."""
    samples, info = _run(8, 256, 300, 200, seed=3)
    assert 0.05 < info["stretch_accept"] < 0.95
    assert 0.05 < info["pcn_accept"] < 0.95
    flat = samples.reshape(-1, D)
    var = flat.var(axis=0)
    np.testing.assert_allclose(var[:M].mean(), 0.25, rtol=0.15)
    np.testing.assert_allclose(var[M:].mean(), 0.5, rtol=0.15)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.15)
