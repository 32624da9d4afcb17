"""Minimal HTTP serving frontend over the continuous-batching engine.

JSON API (stdlib http.server — zero deps, one background scheduler thread):

    POST /generate   {"prompt_ids": [...], "max_new_tokens": N,
                      "temperature": T, "top_k": K, "top_p": P}
        → {"req_id": i, "output_ids": [...]}
    POST /generate with "stream": true
        → chunked NDJSON: one {"token_ids": [...]} line per engine step
          as tokens commit, then a final {"done": true, "req_id": i,
          "output_ids": [...]} line. A client disconnect mid-stream
          cancels the request (its slot frees immediately).
    GET  /healthz    → {"ok": true, ...engine stats}
    GET  /metrics    → Prometheus text format (engine stats as
                       quant_tpu_* gauges + server request counters)

The HTTP handler enqueues into the Engine and waits on a per-request event;
the scheduler thread drives ``Engine.step()`` continuously, so concurrent
requests batch together automatically (continuous batching across the
socket boundary).
"""

from __future__ import annotations

import json
import logging
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from quant_tpu.engine.engine import Engine, QueueFullError, Request
from quant_tpu.engine.sampler import SamplingConfig

log = logging.getLogger("quant_tpu.server")

__all__ = ["serve", "EngineServer"]


class EngineServer:
    def __init__(self, engine: Engine):
        self.engine = engine
        self.lock = threading.Lock()
        self.events: dict[int, threading.Event] = {}
        # rid → (request, tokens-emitted-so-far, delta queue); the
        # scheduler thread is the only producer, the HTTP handler the
        # only consumer
        self.streams: dict[int, tuple[Request, int, queue.Queue]] = {}
        self.next_id = 0
        self.stop_flag = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self.thread.start()

    def stop(self):
        self.stop_flag.set()
        self.thread.join(timeout=10)

    def _loop(self):
        import time
        while not self.stop_flag.is_set():
            with self.lock:
                busy = self.engine.has_work()
                finished = self.engine.step() if busy else []
                self._push_stream_deltas()
            for req in finished:
                ev = self.events.pop(req.req_id, None)
                if ev:
                    ev.set()
            if not busy:
                time.sleep(0.005)

    def _push_stream_deltas(self):
        """Push newly committed tokens of streaming requests into their
        queues (called under the lock, after each engine step)."""
        done = []
        for rid, (req, emitted, q) in self.streams.items():
            n = len(req.output)
            if n > emitted:
                q.put(req.output[emitted:n])
                self.streams[rid] = (req, n, q)
            if req.finished:
                q.put(None)  # end-of-stream sentinel
                done.append(rid)
        for rid in done:
            del self.streams[rid]

    @staticmethod
    def _deadline(timeout_s):
        import time
        return time.monotonic() + timeout_s if timeout_s else None

    def submit(self, prompt_ids, max_new_tokens, sampling,
               timeout_s: float | None = None,
               stop_ids=()) -> Request:
        ev = threading.Event()
        with self.lock:
            rid = self.next_id
            self.next_id += 1
            req = Request(req_id=rid, prompt=list(prompt_ids),
                          max_new_tokens=max_new_tokens, sampling=sampling,
                          deadline=self._deadline(timeout_s),
                          stop_ids=tuple(stop_ids))
            # add_request may reject (oversized prompt) — only register the
            # event once the request is actually enqueued, or the events
            # dict leaks an entry per failed submit.
            self.engine.add_request(req)
            self.events[rid] = ev
        ev.wait()
        return req

    def submit_stream(self, prompt_ids, max_new_tokens, sampling,
                      timeout_s: float | None = None, stop_ids=()):
        """Enqueue a streaming request; returns (request, token queue).
        The queue yields lists of newly committed token ids, then None."""
        q: queue.Queue = queue.Queue()
        sampling = sampling or SamplingConfig()
        with self.lock:
            rid = self.next_id
            self.next_id += 1
            req = Request(req_id=rid, prompt=list(prompt_ids),
                          max_new_tokens=max_new_tokens, sampling=sampling,
                          deadline=self._deadline(timeout_s),
                          stop_ids=tuple(stop_ids))
            self.engine.add_request(req)
            self.streams[rid] = (req, 0, q)
        return req, q

    def cancel_stream(self, rid: int):
        with self.lock:
            self.streams.pop(rid, None)
            self.engine.cancel(rid)


def _make_handler(srv: EngineServer):
    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (the streaming path) needs HTTP/1.1; every
        # non-stream response sets Content-Length so keep-alive is safe
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):
            log.debug(fmt, *args)

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **srv.engine.stats})
            elif self.path == "/metrics":
                lines = []
                stats = dict(srv.engine.stats,
                             requests_total=srv.next_id,
                             streams_active=len(srv.streams))
                for k, v in sorted(stats.items()):
                    if isinstance(v, bool) or not isinstance(
                            v, (int, float)):
                        continue
                    lines.append(f"# TYPE quant_tpu_{k} gauge")
                    lines.append(f"quant_tpu_{k} {v}")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "not found"})

        def _stream(self, body, sampling, timeout_s=None, stop_ids=()):
            req, q = srv.submit_stream(
                body["prompt_ids"],
                int(body.get("max_new_tokens", 32)),
                sampling,
                timeout_s,
                stop_ids,
            )
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(obj):
                data = json.dumps(obj).encode() + b"\n"
                self.wfile.write(f"{len(data):x}\r\n".encode()
                                 + data + b"\r\n")
                self.wfile.flush()

            try:
                while True:
                    toks = q.get()
                    if toks is None:
                        done = {"done": True, "req_id": req.req_id,
                                "output_ids": req.output,
                                "timed_out": req.timed_out}
                        if body.get("logprobs"):
                            done["logprobs"] = req.logprobs
                        chunk(done)
                        self.wfile.write(b"0\r\n\r\n")
                        return
                    chunk({"token_ids": toks})
            except OSError:
                # any socket failure (reset, abort, timeout, half-close)
                # means the client is gone — release the slot/pages
                srv.cancel_stream(req.req_id)
                log.info("stream client gone; cancelled req=%d",
                         req.req_id)

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n))
                sampling = SamplingConfig(
                    temperature=float(body.get("temperature", 0.0)),
                    top_k=int(body.get("top_k", 0)),
                    top_p=float(body.get("top_p", 1.0)),
                )
                timeout_s = body.get("timeout_s")
                if timeout_s is not None:
                    timeout_s = float(timeout_s)  # ValueError/TypeError→400
                stop_ids = [int(t) for t in body.get("stop_ids", [])]
                if body.get("stream"):
                    self._stream(body, sampling, timeout_s, stop_ids)
                    return
                req = srv.submit(
                    body["prompt_ids"],
                    int(body.get("max_new_tokens", 32)),
                    sampling,
                    timeout_s,
                    stop_ids,
                )
                resp = {"req_id": req.req_id,
                        "output_ids": req.output,
                        "timed_out": req.timed_out}
                if body.get("logprobs"):
                    resp["logprobs"] = req.logprobs
                self._json(200, resp)
            except QueueFullError as e:
                self._json(429, {"error": str(e)})
            except (KeyError, TypeError, ValueError,
                    json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})

    return Handler


def serve(engine: Engine, host: str = "127.0.0.1", port: int = 8400):
    """Blocking serve loop; returns the (already started) HTTPServer when
    called with ``port=0`` probing in tests via serve_async."""
    srv = EngineServer(engine)
    srv.start()
    httpd = ThreadingHTTPServer((host, port), _make_handler(srv))
    log.info("serving on %s:%d", host, httpd.server_address[1])
    try:
        httpd.serve_forever()
    finally:
        srv.stop()


def serve_async(engine: Engine, host: str = "127.0.0.1", port: int = 0):
    """Start server in a background thread; returns (httpd, engine_server)."""
    srv = EngineServer(engine)
    srv.start()
    httpd = ThreadingHTTPServer((host, port), _make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, srv
