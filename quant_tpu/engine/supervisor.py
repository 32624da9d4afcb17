"""Multi-worker supervisor: failure detection + restart-from-checkpoint
(SURVEY.md §5 "failure detection / elastic recovery / fault injection").

Data-parallel serving across worker PROCESSES (one per host/chip-group in
production; plain CPU processes in tests). The supervisor:

* spawns N workers, each loading the PACKED checkpoint (restart is cheap
  because weights stay entropy-packed on disk — §5 checkpoint/resume);
* feeds a shared request queue (pull-based load balancing);
* tracks per-worker heartbeats and claimed requests;
* on worker death (crash or kill): re-enqueues that worker's in-flight
  requests and restarts the worker from the checkpoint — surviving workers
  keep serving throughout (no global pause).

No training-style elastic re-sharding: workers are data-parallel replicas.
"""

from __future__ import annotations

import dataclasses
import logging
import multiprocessing as mp
import queue as queue_mod
import time
from typing import Any

log = logging.getLogger("quant_tpu.supervisor")

__all__ = ["Supervisor", "WorkRequest"]


@dataclasses.dataclass
class WorkRequest:
    req_id: int
    prompt: list
    max_new_tokens: int = 16


def _worker_main(worker_id, ckpt_dir, req_q, event_q, max_seq):
    """Worker process: load packed checkpoint, serve requests forever."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from quant_tpu.checkpoint import load_checkpoint
    from quant_tpu.engine.engine import Engine, Request

    params, cfg = load_checkpoint(ckpt_dir)
    eng = Engine(params, cfg, max_slots=2, max_seq=max_seq, eos_id=-1)
    event_q.put(("ready", worker_id, None))
    while True:
        try:
            item = req_q.get(timeout=0.2)
        except queue_mod.Empty:
            event_q.put(("hb", worker_id, time.time()))
            continue
        if item is None:  # shutdown
            return
        event_q.put(("claim", worker_id, item.req_id))
        r = Request(req_id=item.req_id, prompt=list(item.prompt),
                    max_new_tokens=item.max_new_tokens)
        eng.add_request(r)
        while eng.has_work():
            eng.step()
        event_q.put(("done", item.req_id, r.output))


class Supervisor:
    def __init__(self, ckpt_dir, n_workers: int = 2, max_seq: int = 64,
                 heartbeat_timeout: float = 60.0):
        self.ckpt_dir = str(ckpt_dir)
        self.n_workers = n_workers
        self.max_seq = max_seq
        self.heartbeat_timeout = heartbeat_timeout
        self.ctx = mp.get_context("spawn")
        self.req_q = self.ctx.Queue()
        self.event_q = self.ctx.Queue()
        self.workers: dict[int, Any] = {}
        self.last_seen: dict[int, float] = {}
        self.claimed: dict[int, WorkRequest] = {}  # req_id -> request
        self.claim_owner: dict[int, int] = {}      # req_id -> worker_id
        self.results: dict[int, list] = {}
        self._pending_ready = 0
        self.restarts = 0

    # ── lifecycle ───────────────────────────────────────────────────

    def _spawn(self, worker_id: int):
        p = self.ctx.Process(
            target=_worker_main,
            args=(worker_id, self.ckpt_dir, self.req_q, self.event_q,
                  self.max_seq),
            daemon=True,
        )
        p.start()
        self.workers[worker_id] = p
        self.last_seen[worker_id] = time.time()

    def start(self):
        for i in range(self.n_workers):
            self._spawn(i)

    def stop(self):
        for _ in self.workers:
            self.req_q.put(None)
        for p in self.workers.values():
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()

    # ── serving ─────────────────────────────────────────────────────

    def submit(self, req: WorkRequest):
        self.results.setdefault(req.req_id, None)
        self.claimed[req.req_id] = req
        self.req_q.put(req)

    def _handle_event(self, ev):
        kind, a, b = ev
        if kind == "ready":
            log.info("worker %d ready", a)
            self.last_seen[a] = time.time()
        elif kind == "hb":
            self.last_seen[a] = b
        elif kind == "claim":
            self.claim_owner[b] = a
            self.last_seen[a] = time.time()
        elif kind == "done":
            self.results[a] = b
            self.claimed.pop(a, None)
            self.claim_owner.pop(a, None)

    def _check_workers(self):
        now = time.time()
        for wid, p in list(self.workers.items()):
            dead = (not p.is_alive()) or (
                now - self.last_seen.get(wid, now) > self.heartbeat_timeout
            )
            if not dead:
                continue
            log.warning("worker %d dead — restarting from %s",
                        wid, self.ckpt_dir)
            if p.is_alive():
                p.terminate()
            # Re-enqueue this worker's in-flight request(s).
            for rid, owner in list(self.claim_owner.items()):
                if owner == wid and self.results.get(rid) is None:
                    log.warning("re-enqueue req %d from dead worker %d",
                                rid, wid)
                    self.claim_owner.pop(rid, None)
                    self.req_q.put(self.claimed[rid])
            self.restarts += 1
            self._spawn(wid)

    def wait_all(self, timeout: float = 300.0) -> dict[int, list]:
        """Drain events until all submitted requests have results."""
        deadline = time.time() + timeout
        while any(v is None for v in self.results.values()):
            if time.time() > deadline:
                raise TimeoutError(
                    f"unfinished: "
                    f"{[k for k, v in self.results.items() if v is None]}"
                )
            try:
                ev = self.event_q.get(timeout=0.5)
                self._handle_event(ev)
            except queue_mod.Empty:
                pass
            self._check_workers()
        return dict(self.results)

    def kill_worker(self, worker_id: int):
        """Fault injection: hard-kill one worker process."""
        self.workers[worker_id].kill()
