"""'model'-axis sharded-grid forward solve vs the single-device operator
(SURVEY.md §5.7: halo exchange via ppermute — the stencil analog of ring
attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu.models import darcy
from ip_mcmc_tpu.parallel import grid_shard

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _field(n, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.exp(scale * rng.standard_normal((n, n))), jnp.float32)


@pytest.mark.parametrize("nd", [2, 4, 8])
def test_sharded_apply_matches_local(nd):
    n = 16
    a = _field(n)
    p = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, n)), jnp.float32
    )
    expected = np.asarray(darcy.apply_operator(a, p, n))

    mesh = grid_shard.make_model_mesh(n_devices=nd)
    from jax.sharding import PartitionSpec as P

    out = jax.shard_map(
        lambda al, pl: grid_shard.sharded_apply_operator(al, pl, n),
        mesh=mesh,
        in_specs=(P(grid_shard.MODEL_AXIS), P(grid_shard.MODEL_AXIS)),
        out_specs=P(grid_shard.MODEL_AXIS),
    )(a, p)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=1e-2)


@pytest.mark.parametrize("nd", [2, 4])
def test_sharded_cg_matches_dense_solve(nd):
    n = 16
    a = _field(n, seed=2)
    f = jnp.ones(n * n, jnp.float32)
    # dense reference
    A = np.asarray(darcy.assemble_operator(a, darcy._stencil_indices(n), n))
    expected = np.linalg.solve(A, np.ones(n * n))

    mesh = grid_shard.make_model_mesh(n_devices=nd)
    p = grid_shard.sharded_solve_cg(a, f, n, mesh, n_iters=200)
    np.testing.assert_allclose(np.asarray(p), expected, rtol=5e-3, atol=1e-5)


class TestShardedForwardOption:
    def test_make_darcy_forward_sharded_matches_cg(self):
        """make_darcy_forward(method='sharded') == method='cg' on the same
        coefficients (8-device row decomposition vs single-device stencil)."""
        from ip_mcmc_tpu.models import darcy

        fwd_cg, _ = darcy.make_darcy_forward(
            n_grid=16, n_modes_per_dim=4, cg_iters=100
        )
        fwd_sh, _ = darcy.make_darcy_forward(
            n_grid=16, n_modes_per_dim=4, cg_iters=100, method="sharded"
        )
        u = jax.random.normal(jax.random.key(3), (16,)) * 0.5
        np.testing.assert_allclose(
            np.asarray(fwd_sh(u)), np.asarray(fwd_cg(u)), rtol=2e-4, atol=1e-6
        )

    def test_indivisible_grid_raises(self):
        from ip_mcmc_tpu.models import darcy

        with pytest.raises(ValueError):
            darcy.make_darcy_forward(n_grid=10, n_modes_per_dim=4,
                                     method="sharded")
