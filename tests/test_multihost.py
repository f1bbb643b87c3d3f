"""Multi-host smoke test (SURVEY.md §4.2 item 5): N local processes with
``jax.distributed.initialize`` on the CPU backend, exercising the DCN code
path (cross-process collectives) without a pod. Skips cleanly if the local
runtime lacks cross-process CPU collectives."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("PYTHONPATH", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:%(port)d",
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2
    mesh = jax.make_mesh((jax.device_count(),), ("chains",))
    # global array sharded across processes; psum via global-view reduction
    n = jax.device_count() * 4
    local = jnp.arange(n // 2, dtype=jnp.float32) + int(sys.argv[1]) * (n // 2)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("chains")), local
    )
    total = jax.jit(lambda a: jnp.sum(a))(garr)
    expected = n * (n - 1) / 2
    assert float(total) == expected, (float(total), expected)
    print("OK", int(sys.argv[1]), flush=True)
    """
)


def test_two_process_collective(tmp_path):
    port = 23467
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"port": port})
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=100)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed CPU runtime hung (no local collectives)")
        outs.append((p.returncode, out))
    if any(rc != 0 for rc, _ in outs):
        combined = "\n".join(o for _, o in outs)
        if "not implemented" in combined.lower() or "unimplemented" in combined.lower():
            pytest.skip(f"cross-process CPU collectives unavailable: {combined[-200:]}")
        raise AssertionError(combined)
    assert all("OK" in o for _, o in outs)
