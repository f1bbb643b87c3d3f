"""Checkpoint/resume (SURVEY.md §5.4) + failure recovery (§5.3): the
interrupted-and-resumed run must reproduce the uninterrupted run exactly
(counter-based keys make this bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ip_mcmc_tpu import checkpoint, driver
from ip_mcmc_tpu.kernels import rwm


def logpi(x):
    return -0.5 * jnp.sum(x * x)


def _setup(n_chains=8):
    kernel = rwm.build_kernel(logpi, step_size=0.5)
    positions = jax.random.normal(jax.random.key(0), (n_chains, 2))
    state = driver.init_chains(rwm.init, positions, logpi)
    return kernel, state


def test_save_restore_roundtrip(tmp_path):
    _, state = _setup()
    checkpoint.save(str(tmp_path / "ck"), 3, state)
    assert checkpoint.latest_step(str(tmp_path / "ck")) == 3
    step, restored = checkpoint.restore(str(tmp_path / "ck"), state)
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(restored.position), np.asarray(state.position)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.log_density), np.asarray(state.log_density)
    )


def test_resume_reproduces_uninterrupted_run(tmp_path):
    """Kill-and-restart (§5.3 fault injection, in-process): chunked run with
    a crash after chunk 1 resumes to the exact same samples."""
    kernel, state = _setup()
    key = jax.random.key(42)

    d_full = checkpoint.CheckpointingDriver(
        str(tmp_path / "full"), kernel, key, chunk_size=10
    )
    _, samples_full = d_full.run(state, n_samples=30)

    # interrupted: run only 2 chunks, "crash", then resume from disk
    d_int = checkpoint.CheckpointingDriver(
        str(tmp_path / "int"), kernel, key, chunk_size=10
    )
    _, part = d_int.run(state, n_samples=20)  # chunks 0, 1
    d_resumed = checkpoint.CheckpointingDriver(
        str(tmp_path / "int"), kernel, key, chunk_size=10
    )
    _, rest = d_resumed.resume(state, n_samples=30)  # picks up chunk 2

    np.testing.assert_array_equal(samples_full[:20], part)
    np.testing.assert_array_equal(samples_full[20:], rest)


def test_resume_from_empty_runs_everything(tmp_path):
    kernel, state = _setup()
    d = checkpoint.CheckpointingDriver(
        str(tmp_path / "e"), kernel, jax.random.key(1), chunk_size=5
    )
    _, samples = d.resume(state, n_samples=12)
    assert samples.shape[0] == 12


class TestInScanCheckpointing:
    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        """io_callback in-scan checkpoints + resume == uninterrupted run,
        bitwise (global-sample-index keying)."""
        from ip_mcmc_tpu.distributions import DiagGaussian
        from ip_mcmc_tpu.kernels import pcn
        from ip_mcmc_tpu import checkpoint, driver

        prior = DiagGaussian(mean=jnp.zeros(2), scale=jnp.ones(2))
        y = jnp.array([1.0, -0.5])
        phi = lambda u: 0.5 * jnp.sum((y - u) ** 2)
        kernel = pcn.build_kernel(phi, prior, beta=0.4)
        positions = prior.sample(jax.random.key(0), (32,))
        state0 = driver.init_chains(pcn.init, positions, phi)
        key = jax.random.key(1)
        d = str(tmp_path / "inscan")

        # uninterrupted: 40 retained samples
        _, s_full, _ = checkpoint.sample_chains_inscan(
            kernel, state0, key, n_samples=40, every=10,
            directory=str(tmp_path / "full"),
        )
        # interrupted at 20, resume from the in-scan checkpoint
        _, s_a, _ = checkpoint.sample_chains_inscan(
            kernel, state0, key, n_samples=20, every=10, directory=d,
        )
        start, state_r = checkpoint.latest_inscan(d, state0)
        assert start == 20
        _, s_b, _ = checkpoint.sample_chains_inscan(
            kernel, state_r, key, n_samples=20, every=10, directory=d,
            start_sample=start,
        )
        np.testing.assert_array_equal(
            np.asarray(s_full), np.concatenate([np.asarray(s_a), np.asarray(s_b)])
        )

    def test_no_checkpoint_returns_template(self, tmp_path):
        from ip_mcmc_tpu import checkpoint

        start, st = checkpoint.latest_inscan(str(tmp_path), {"a": jnp.ones(3)})
        assert start == 0 and float(st["a"][0]) == 1.0
