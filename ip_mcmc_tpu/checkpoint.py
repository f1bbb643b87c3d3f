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


def sample_chains_inscan(
    kernel, state, base_key, *, n_samples, thin=1, every=50,
    directory, start_sample=0,
):
    """Chain sampling with checkpoints INSIDE the compiled scan: every
    ``every`` retained samples an ordered ``io_callback`` ships the (tiny)
    chain-state pytree to the host, which writes
    ``{directory}/inscan_{step}.npz`` — no program exit, no chunked host
    loop (SURVEY.md §5.4's save-every-K-scan-chunks, literally in-scan).

    RNG is keyed by the GLOBAL retained-sample index (``start_sample``
    offset), so ``resume_inscan`` + this function reproduce the
    uninterrupted run exactly. Returns (state, samples, info_means) like
    ``driver.sample_chains``.
    """
    import os

    import jax.numpy as jnp
    from jax.experimental import io_callback

    os.makedirs(directory, exist_ok=True)
    n_chains = jax.tree_util.tree_leaves(state)[0].shape[0]

    def host_save(step, *leaves):
        np.savez(
            os.path.join(directory, f"inscan_{int(step):08d}.npz"),
            step=np.asarray(step),
            **{f"leaf{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )
        return np.int32(0)

    from ip_mcmc_tpu.driver import chain_keys

    def outer(st, sample_idx):
        def inner(st, step_idx):
            keys = chain_keys(base_key, step_idx, n_chains)
            st, info = jax.vmap(kernel)(keys, st)
            return st, info

        steps = sample_idx * thin + jnp.arange(thin)
        st, infos = jax.lax.scan(inner, st, steps)
        info_mean = jax.tree_util.tree_map(
            lambda x: jnp.mean(x[-1].astype(jnp.float32), axis=0), infos
        )

        def save(_):
            return io_callback(
                host_save,
                jax.ShapeDtypeStruct((), jnp.int32),
                sample_idx,
                *jax.tree_util.tree_leaves(st),
                ordered=True,
            )

        jax.lax.cond(
            (sample_idx + 1) % every == 0, save, lambda _: jnp.int32(0), None
        )
        return st, (st.position, info_mean)

    state, (samples, info_means) = jax.lax.scan(
        outer, state, start_sample + jnp.arange(n_samples)
    )
    return state, samples, info_means


def latest_inscan(directory, template_state):
    """Load the newest in-scan checkpoint: returns (next_sample_index,
    state) or (0, template_state) if none exists."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(directory, "inscan_*.npz")))
    if not files:
        return 0, template_state
    with np.load(files[-1]) as z:
        step = int(z["step"])
        leaves = [z[f"leaf{i}"] for i in range(len(z.files) - 1)]
    treedef = jax.tree_util.tree_structure(template_state)
    return step + 1, jax.tree_util.tree_unflatten(treedef, leaves)


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
