"""Structured observability (SURVEY.md §5.5): JSON-lines metrics logging and
named profiling scopes.

The reference's one observability feature is the ``CountedAccepter``; here
every run can emit structured per-chunk metric records (acceptance, ESS,
R̂, step size, SMC temperature) to stdout or a file, and hot phases carry
``jax.named_scope`` annotations so profiler traces (§5.1) attribute cleanly.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time


class MetricsLogger:
    """JSON-lines logger: one dict per record, flushed immediately."""

    def __init__(self, stream=None, path=None):
        if path is not None:
            self._fh = open(path, "a", buffering=1)
            self._own = True
        else:
            self._fh = stream or sys.stderr
            self._own = False
        self._t0 = time.time()

    def log(self, record: dict, **kw):
        # "t": seconds since logger creation (readable deltas); "t_epoch":
        # absolute wall clock, so exporters (utils/tensorboard.py) can stamp
        # real wall_time instead of near-1970 values (ADVICE round 2).
        now = time.time()
        rec = {
            "t": round(now - self._t0, 3),
            "t_epoch": round(now, 3),
            **record,
            **kw,
        }
        self._fh.write(json.dumps(rec, default=float) + "\n")

    def close(self):
        if self._own:
            self._fh.close()


@contextlib.contextmanager
def profile_region(name: str, profile: bool = False, profile_dir: str = "/tmp/ipx_trace"):
    """jax.named_scope + optional profiler trace around a region."""
    import jax

    if profile:
        jax.profiler.start_trace(profile_dir)
    try:
        with jax.named_scope(name):
            yield
    finally:
        if profile:
            jax.profiler.stop_trace()
