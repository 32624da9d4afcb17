"""Profiling hooks (SURVEY.md §5 tracing/profiling).

Thin wrapper over ``jax.profiler``: traces land as perfetto/tensorboard
artifacts under the given directory. The roofline/bench harness is the
first-class consumer; serving code can wrap hot sections ad hoc.
"""

from __future__ import annotations

import contextlib
import logging
import pathlib

import jax

log = logging.getLogger("quant_tpu.profiling")

__all__ = ["trace"]


@contextlib.contextmanager
def trace(out_dir: str = "/tmp/quant_tpu_trace", enabled: bool = True):
    """Context manager: ``with trace("dir"): run_steps()``."""
    if not enabled:
        yield
        return
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.profiler.start_trace(out_dir)
        yield
    finally:
        try:
            jax.profiler.stop_trace()
            log.info("profile trace written to %s", out_dir)
        except Exception as e:  # relay backends may not support tracing
            log.warning("profiler stop failed: %s", e)
