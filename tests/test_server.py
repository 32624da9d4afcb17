"""HTTP serving frontend test: concurrent requests through a real socket."""

import json
import threading
import urllib.request

from quant_tpu.engine import Engine
from quant_tpu.engine.server import serve_async
from quant_tpu.models import PRESETS, llama

CFG = PRESETS["test-tiny"]


def test_http_generate_and_health():
    params = llama.init_params(CFG, seed=0)
    eng = Engine(params, CFG, max_slots=4, max_seq=32, eos_id=-1)
    httpd, srv = serve_async(eng)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        results = {}

        def post(i, prompt):
            req = urllib.request.Request(
                base + "/generate",
                data=json.dumps({"prompt_ids": prompt,
                                 "max_new_tokens": 4}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.loads(r.read())

        threads = [
            threading.Thread(target=post, args=(i, [3 + i, 5, 7]))
            for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 3
        assert all(len(r["output_ids"]) == 4 for r in results.values())

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["ok"]

        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            m = r.read().decode()
        assert "quant_tpu_steps" in m
        assert "quant_tpu_requests_total 3" in m

        # malformed request → 400
        req = urllib.request.Request(
            base + "/generate", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_streaming_matches_blocking():
    params = llama.init_params(CFG, seed=1)
    eng = Engine(params, CFG, max_slots=4, max_seq=32, eos_id=-1)
    httpd, srv = serve_async(eng)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    prompt, n_new = [4, 9, 2], 8
    try:
        req = urllib.request.Request(
            base + "/generate",
            data=json.dumps({"prompt_ids": prompt,
                             "max_new_tokens": n_new}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            blocking = json.loads(r.read())["output_ids"]

        req = urllib.request.Request(
            base + "/generate",
            data=json.dumps({"prompt_ids": prompt, "stream": True,
                             "max_new_tokens": n_new}).encode(),
            headers={"Content-Type": "application/json"},
        )
        streamed, lines, done = [], 0, None
        with urllib.request.urlopen(req, timeout=120) as r:
            for raw in r:
                obj = json.loads(raw)
                if obj.get("done"):
                    done = obj
                    break
                streamed.extend(obj["token_ids"])
                lines += 1
        assert done is not None
        assert streamed == blocking == done["output_ids"]
        assert len(streamed) == n_new
        assert lines >= 2, "tokens must arrive incrementally"

        # explicit cancel releases the slot (the disconnect path calls
        # the same cancel_stream)
        sreq, q = srv.submit_stream([5, 6, 7], 16, None)
        q.get(timeout=60)  # at least one token committed
        srv.cancel_stream(sreq.req_id)
        deadline = 60
        import time
        t0 = time.time()
        while eng.has_work() and time.time() - t0 < deadline:
            time.sleep(0.01)
        assert not eng.has_work()
    finally:
        httpd.shutdown()
        srv.stop()


def test_http_queue_full_429():
    """QueueFullError from admission maps to HTTP 429 (deterministic:
    the engine's add_request is stubbed to always refuse)."""
    from quant_tpu.engine import QueueFullError

    params = llama.init_params(CFG, seed=2)
    eng = Engine(params, CFG, max_slots=1, max_seq=32, eos_id=-1)

    def refuse(req):
        raise QueueFullError("pending queue full (stub)")

    eng.add_request = refuse
    httpd, srv = serve_async(eng)
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt_ids": [5, 6],
                             "max_new_tokens": 2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 429"
        except urllib.error.HTTPError as e:
            assert e.code == 429
            assert "queue full" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        srv.stop()
