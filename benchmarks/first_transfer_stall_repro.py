"""Minimal reproducer: the tunneled chip stalls on the process's FIRST
device->host transfer (round-3 VERDICT weak #1, bisected round 4).

No compile, no cache, no program execution needed — a device_put followed
by a read is enough. Measured in the round-4 session: 182 s, 312 s, 865 s
and >900 s for this first read in four consecutive processes (growing over
the session), while every SUBSEQUENT read, compile (persistent-cache hit),
and dispatch completed in milliseconds. jax.block_until_ready returns
early on this backend, so the stall lands on whichever line first touches
a value — in the pre-round-4 CLI that was the lowering of a kernel whose
closure held warmup outputs, booking the stall as compile_s.

Run: python benchmarks/first_transfer_stall_repro.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
x = jax.device_put(jnp.ones((8, 8)))
jax.block_until_ready(x)
print(f"device_put + block_until_ready: {time.perf_counter() - t0:.2f}s")

t0 = time.perf_counter()
np.asarray(x)  # first device->host transfer of the process
print(f"FIRST read: {time.perf_counter() - t0:.2f}s")

t0 = time.perf_counter()
np.asarray(x + 1.0)  # compile + execute + second read
print(f"second read (incl. tiny compile): {time.perf_counter() - t0:.2f}s")
