"""Failure detection / restart-from-checkpoint (SURVEY.md §5).

Spawns real worker processes serving a packed checkpoint, hard-kills one
mid-stream (fault injection), and asserts every request still completes and
the dead worker is restarted.
"""

import numpy as np
import pytest

from quant_tpu.checkpoint import save_checkpoint
from quant_tpu.engine.supervisor import Supervisor, WorkRequest
from quant_tpu.models import PRESETS, llama

CFG = PRESETS["test-tiny"]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("sup") / "ckpt"
    params = llama.init_params(CFG, seed=0)
    save_checkpoint(path, params, CFG)
    return path


def _reqs(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        WorkRequest(req_id=i,
                    prompt=list(map(int, rng.integers(3, 100, 4))),
                    max_new_tokens=3)
        for i in range(n)
    ]


def test_requests_complete(ckpt):
    sup = Supervisor(ckpt, n_workers=2, max_seq=32)
    sup.start()
    try:
        for r in _reqs(4):
            sup.submit(r)
        results = sup.wait_all(timeout=900)
        assert len(results) == 4
        assert all(len(v) == 3 for v in results.values())
    finally:
        sup.stop()


def test_fault_injection_worker_killed(ckpt):
    import queue as queue_mod
    import time

    sup = Supervisor(ckpt, n_workers=2, max_seq=32)
    sup.start()
    try:
        reqs = _reqs(6, seed=1)
        for r in reqs:
            sup.submit(r)
        # Deterministic fault injection: wait until a worker CLAIMS a
        # request, then hard-kill that worker while its request is in
        # flight — the supervisor must re-enqueue it and respawn.
        victim = None
        deadline = time.time() + 300
        while victim is None and time.time() < deadline:
            try:
                ev = sup.event_q.get(timeout=0.5)
            except queue_mod.Empty:
                continue
            sup._handle_event(ev)
            if ev[0] == "claim" and sup.results.get(ev[2]) is None:
                victim = ev[1]
        assert victim is not None, "no claim observed"
        sup.kill_worker(victim)
        results = sup.wait_all(timeout=900)
        assert len(results) == 6
        assert all(len(v) == 3 for v in results.values())
        sup._check_workers()  # ensure detection even if results beat it
        assert sup.restarts >= 1  # the dead worker was detected + respawned
    finally:
        sup.stop()
