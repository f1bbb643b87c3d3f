import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import observations, potentials
from ip_mcmc_tpu.utils import debug


def test_point_observation():
    O = observations.point_observation([0, 3, 5])
    x = jnp.arange(8.0)
    np.testing.assert_array_equal(np.asarray(O(x)), [0.0, 3.0, 5.0])
    xb = jnp.stack([x, x + 10])
    assert O(xb).shape == (2, 3)


def test_time_point_observation():
    traj = jnp.arange(24.0).reshape(6, 4)  # (T, n)
    O = observations.time_point_observation([1, 3], [0, 2])
    out = np.asarray(O(traj))
    np.testing.assert_array_equal(out, [4.0, 6.0, 12.0, 14.0])


def test_linear_observation():
    W = jnp.array([[0.5, 0.5, 0.0], [0.0, 0.0, 1.0]])
    O = observations.linear_observation(W)
    np.testing.assert_allclose(
        np.asarray(O(jnp.array([2.0, 4.0, 7.0]))), [3.0, 7.0]
    )


def test_observation_composes_with_misfit():
    O = observations.point_observation([1])
    phi = potentials.misfit_potential(
        lambda u: u, jnp.array([2.0]), None, observation_fn=O
    )
    np.testing.assert_allclose(float(phi(jnp.array([9.0, 2.0]))), 0.0)
    np.testing.assert_allclose(float(phi(jnp.array([9.0, 4.0]))), 2.0)


def test_checked_potential_flags_nonfinite():
    _, run = debug.checked_potential(lambda u: jnp.log(u[0]))
    err, _ = run(jnp.array([-1.0]))
    with pytest.raises(Exception):
        err.throw()
    err, val = run(jnp.array([2.0]))
    err.throw()  # no error
    np.testing.assert_allclose(float(val), np.log(2.0), rtol=1e-6)


def test_debug_mode_restores_config():
    before = jax.config.jax_debug_nans
    with debug.debug_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before
