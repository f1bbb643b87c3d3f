"""Checkpoint/resume (SURVEY.md §5.4): Orbax on the sharded chain-state
pytree.

MCMC state is tiny (positions + cached potentials + adaptation state + step
counter) and the RNG is counter-based (``fold_in(base_key, step)``), so
resume is EXACT: restoring {state, step} and continuing reproduces the
uninterrupted run bit-for-bit (tested in tests/test_checkpoint.py, incl. the
§5.3 failure-recovery scenario). Reference has no checkpointing — chains
rerun from scratch.
"""

from __future__ import annotations

import jax
import numpy as np


def _manager(directory, max_to_keep=3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
    )


def save(directory, step, state, extra=None):
    """Save a chain-state pytree (+ optional metadata dict) at ``step``."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    payload = {"state": state}
    if extra is not None:
        payload["extra"] = extra
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore(directory, template_state, step=None, extra_template=None):
    """Restore (step, state[, extra]) matching the template pytree structure."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    payload = {"state": template_state}
    if extra_template is not None:
        payload["extra"] = extra_template
    out = mgr.restore(step, args=ocp.args.StandardRestore(payload))
    mgr.close()
    if extra_template is not None:
        return step, out["state"], out["extra"]
    return step, out["state"]


def latest_step(directory):
    mgr = _manager(directory)
    s = mgr.latest_step()
    mgr.close()
    return s


class CheckpointingDriver:
    """Chunked sampling with periodic ASYNC checkpoints.

    Runs ``driver.sample_chains`` in chunks of ``chunk_size`` retained
    samples, checkpointing after each chunk. One ``CheckpointManager`` stays
    open for the whole run and saves are NOT awaited per chunk — Orbax's
    async checkpointer stages the (tiny) state and writes in a background
    thread while the next chunk's sampling runs on device; the single
    ``wait_until_finished`` sits at the end of the run. ``resume()`` picks
    up from the last saved chunk and (because step keys are
    ``fold_in(base_key, global_step)``) yields exactly the samples the
    uninterrupted run would have produced.
    """

    def __init__(self, directory, kernel, base_key, *, thin=1, chunk_size=100):
        self.directory = directory
        self.kernel = kernel
        self.base_key = base_key
        self.thin = thin
        self.chunk_size = chunk_size

    def run(self, state, n_samples, start_chunk=0):
        import orbax.checkpoint as ocp

        from ip_mcmc_tpu import driver

        chunks = []
        n_chunks = -(-n_samples // self.chunk_size)
        mgr = _manager(self.directory)
        try:
            for c in range(start_chunk, n_chunks):
                take = min(self.chunk_size, n_samples - c * self.chunk_size)
                # burn through the steps this chunk owns, keyed by global index
                offset = c * self.chunk_size * self.thin
                state, samples, _ = driver.sample_chains(
                    self.kernel,
                    state,
                    jax.random.fold_in(self.base_key, offset),
                    n_samples=take,
                    burn_in=0,
                    thin=self.thin,
                )
                chunks.append(np.asarray(samples))
                # async: stages the state and returns; the write overlaps the
                # next chunk's on-device sampling
                mgr.save(c, args=ocp.args.StandardSave({"state": state}))
            mgr.wait_until_finished()
        finally:
            mgr.close()
        return state, np.concatenate(chunks, axis=0) if chunks else None

    def resume(self, template_state, n_samples):
        last = latest_step(self.directory)
        if last is None:
            return self.run(template_state, n_samples)
        _, state = restore(self.directory, template_state, step=last)
        return self.run(state, n_samples, start_chunk=last + 1)
