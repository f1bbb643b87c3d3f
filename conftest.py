"""Root conftest: force the test suite onto a deterministic 8-device CPU mesh.

The ambient environment registers a single real TPU chip (axon PJRT plugin,
loaded from sitecustomize before we run). Tests instead run on
``--xla_force_host_platform_device_count=8`` virtual CPU devices so that the
multi-chip sharding paths (``jax.sharding.Mesh`` over a ``'chains'`` axis,
``shard_map`` + collectives) are exercised on every test run without TPU
hardware, per SURVEY.md §4.2 item 4.

This file also puts the repo root on ``sys.path`` (pytest rootdir insertion),
so ``import ip_mcmc_tpu`` works without installation.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# Backend init is lazy; this wins over JAX_PLATFORMS=axon in the environment
# as long as no device has been touched yet (sitecustomize only registers the
# plugin, it does not initialize it).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
