"""Profiling/tracing hooks (the reference's timing-log analogue, upgraded).

The reference's only tracing is wall-clock deltas written to
``timing_and_performance.log`` (SURVEY §5).  That contract is preserved by
``run_logging``; this module adds real device-level tracing via
``jax.profiler`` for perf work:

* ``trace(dir)`` — context manager around a region; view with XProf/
  TensorBoard.
* ``maybe_trace()`` — env-driven (``CAMELS_PROFILE=<dir>``): the experiment
  runner wraps its first post-compile training epoch with this, so setting
  one env var captures a production trace with zero code changes.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def maybe_trace(env_var: str = "CAMELS_PROFILE") -> Iterator[None]:
    log_dir = os.environ.get(env_var)
    if not log_dir:
        yield
        return
    with trace(log_dir):
        yield


def annotate(name: str):
    """Named trace region (shows up in the profile timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
