import jax
import jax.numpy as jnp
import numpy as np

from ip_mcmc_tpu import driver
from ip_mcmc_tpu.distributions import Gaussian
from ip_mcmc_tpu.kernels import rwm

COV = np.array([[2.0, 0.8], [0.8, 1.0]])
MEAN = np.array([1.0, -0.5])


def logdensity(x):
    return Gaussian.from_covariance(jnp.array(MEAN), jnp.array(COV)).log_prob(x)


def _setup(n_chains=8):
    kernel = rwm.build_kernel(logdensity, step_size=0.5)
    positions = jnp.zeros((n_chains, 2))
    state = driver.init_chains(rwm.init, positions, logdensity)
    return kernel, state


def test_shapes_burnin_thinning():
    kernel, state = _setup()
    _, samples, infos = driver.sample_chains(
        kernel, state, jax.random.key(0), n_samples=50, burn_in=17, thin=3
    )
    assert samples.shape == (50, 8, 2)
    assert infos.accepted.shape == (50,)


def test_deterministic_given_key():
    kernel, state = _setup()
    _, s1, _ = driver.sample_chains(
        kernel, state, jax.random.key(7), n_samples=20, burn_in=5, thin=2
    )
    _, s2, _ = driver.sample_chains(
        kernel, state, jax.random.key(7), n_samples=20, burn_in=5, thin=2
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_different_keys_differ():
    kernel, state = _setup()
    _, s1, _ = driver.sample_chains(
        kernel, state, jax.random.key(1), n_samples=10, burn_in=0
    )
    _, s2, _ = driver.sample_chains(
        kernel, state, jax.random.key(2), n_samples=10, burn_in=0
    )
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))


def test_chains_are_independent_streams():
    """Each chain must get its own key stream — no two chains identical."""
    kernel, state = _setup(n_chains=4)
    _, samples, _ = driver.sample_chains(
        kernel, state, jax.random.key(3), n_samples=20, burn_in=0
    )
    s = np.asarray(samples)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.array_equal(s[:, i], s[:, j])


def test_thinning_equals_dense_subsample():
    """thin=k must reproduce every k-th state of the thin=1 chain (same keys)."""
    kernel, state = _setup(n_chains=2)
    _, dense, _ = driver.sample_chains(
        kernel, state, jax.random.key(9), n_samples=30, burn_in=0, thin=1
    )
    _, thinned, _ = driver.sample_chains(
        kernel, state, jax.random.key(9), n_samples=10, burn_in=0, thin=3
    )
    np.testing.assert_allclose(
        np.asarray(dense)[2::3], np.asarray(thinned), rtol=1e-6
    )


def test_burn_in_continues_stream():
    """burn_in=b, n=k must equal the tail of burn_in=0, n=b+k."""
    kernel, state = _setup(n_chains=2)
    _, all_s, _ = driver.sample_chains(
        kernel, state, jax.random.key(11), n_samples=15, burn_in=0
    )
    _, tail, _ = driver.sample_chains(
        kernel, state, jax.random.key(11), n_samples=10, burn_in=5
    )
    np.testing.assert_allclose(np.asarray(all_s)[5:], np.asarray(tail), rtol=1e-6)
