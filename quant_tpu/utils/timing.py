"""Robust device timing under hostile dispatch conditions.

On this environment's axon relay, ``block_until_ready`` does not reliably
wait and every RPC carries 40-80 ms of jitter (SURVEY follow-up, session 1
measurements), so all benchmarks use DIFFERENTIAL timing: run a jitted
workload at two repetition counts with a tiny (scalar) output fetched via
``np.asarray`` — a device→host read cannot complete before execution — and
divide the time delta by the repetition delta. Fixed costs (dispatch, RPC,
transfer) cancel exactly.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["force_sync", "differential_time"]


def force_sync(x):
    """Force real completion by pulling (a tiny piece of) x to host."""
    return np.asarray(x)


def _timed(fn, args, iters):
    force_sync(fn(*args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        force_sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def differential_time(make_fn, args, n_lo: int, n_hi: int, iters: int = 4):
    """Seconds per repetition of the workload inside ``make_fn(n)``.

    ``make_fn(n)`` must return a jitted callable running the workload n
    times and returning a SCALAR. Cost model: T(n) = fixed + n * per_rep.
    """
    t_lo = _timed(make_fn(n_lo), args, iters)
    t_hi = _timed(make_fn(n_hi), args, iters)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-12)
