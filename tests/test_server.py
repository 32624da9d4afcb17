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


class _StubTokenizer:
    """Duck-typed tokenizer: 1 char = 1 token (offset into vocab)."""

    def encode(self, text):
        return [ord(c) % 50 + 3 for c in text]

    def decode(self, ids):
        return "".join(chr((t - 3) % 50 + 97) for t in ids)

    def apply_chat_template(self, messages, add_generation_prompt=False):
        ids = []
        for m in messages:
            ids += self.encode(m["role"]) + self.encode(m["content"])
        return ids + ([1] if add_generation_prompt else [])


def _post(base, path, payload, timeout=120):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_openai_compat_endpoints():
    params = llama.init_params(CFG, seed=3)
    eng = Engine(params, CFG, max_slots=4, max_seq=48, eos_id=-1)
    httpd, srv = serve_async(eng, tokenizer=_StubTokenizer(),
                             model_name="tiny-test")
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/v1/models", timeout=30) as r:
            models = json.loads(r.read())
        assert models["data"][0]["id"] == "tiny-test"

        # token-array prompt, greedy → must equal the native endpoint
        prompt = [5, 9, 11]
        with _post(base, "/generate",
                   {"prompt_ids": prompt, "max_new_tokens": 6}) as r:
            native = json.loads(r.read())["output_ids"]
        with _post(base, "/v1/completions",
                   {"prompt": prompt, "max_tokens": 6,
                    "temperature": 0, "logprobs": True}) as r:
            oai = json.loads(r.read())
        ch = oai["choices"][0]
        assert ch["token_ids"] == native
        assert ch["finish_reason"] == "length"
        assert len(ch["logprobs"]["token_logprobs"]) == 6
        assert oai["usage"] == {"prompt_tokens": 3,
                                "completion_tokens": 6,
                                "total_tokens": 9}
        assert ch["text"] == _StubTokenizer().decode(native)

        # text prompt goes through the server-side tokenizer
        with _post(base, "/v1/completions",
                   {"prompt": "hi", "max_tokens": 4,
                    "temperature": 0}) as r:
            txt = json.loads(r.read())
        assert len(txt["choices"][0]["token_ids"]) == 4
        assert txt["usage"]["prompt_tokens"] == 2

        # SSE streaming: deltas concatenate to the blocking output
        streamed, finals = [], []
        with _post(base, "/v1/completions",
                   {"prompt": prompt, "max_tokens": 6, "temperature": 0,
                    "stream": True}) as r:
            assert r.headers["Content-Type"].startswith(
                "text/event-stream")
            for raw in r:
                raw = raw.strip()
                if not raw.startswith(b"data: "):
                    continue
                payload = raw[len(b"data: "):]
                if payload == b"[DONE]":
                    break
                obj = json.loads(payload)
                c = obj["choices"][0]
                streamed.extend(c["token_ids"])
                if c["finish_reason"]:
                    finals.append(c["finish_reason"])
        assert streamed == native
        assert finals == ["length"]

        # chat completions via the stub chat template
        msgs = [{"role": "user", "content": "ab"}]
        with _post(base, "/v1/chat/completions",
                   {"messages": msgs, "max_tokens": 5,
                    "temperature": 0}) as r:
            chat = json.loads(r.read())
        cch = chat["choices"][0]
        assert chat["object"] == "chat.completion"
        assert cch["message"]["role"] == "assistant"
        assert len(cch["token_ids"]) == 5
        expect_ids = _StubTokenizer().apply_chat_template(
            msgs, add_generation_prompt=True)
        assert chat["usage"]["prompt_tokens"] == len(expect_ids)

        # bad prompt types → 400
        for bad in [{"prompt": []}, {"prompt": 7}, {}]:
            try:
                _post(base, "/v1/completions", bad, timeout=30)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        httpd.shutdown()
        srv.stop()


def test_openai_compat_without_tokenizer():
    """Token-id prompts work tokenizer-less; text/chat give clear 400s."""
    params = llama.init_params(CFG, seed=4)
    eng = Engine(params, CFG, max_slots=2, max_seq=32, eos_id=-1)
    httpd, srv = serve_async(eng)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with _post(base, "/v1/completions",
                   {"prompt": [4, 5], "max_tokens": 3,
                    "temperature": 0}) as r:
            out = json.loads(r.read())
        assert len(out["choices"][0]["token_ids"]) == 3
        assert out["choices"][0]["text"] == ""  # no tokenizer to decode

        # OpenAI logit_bias dict form bans a token end-to-end
        banned = out["choices"][0]["token_ids"][0]
        with _post(base, "/v1/completions",
                   {"prompt": [4, 5], "max_tokens": 3, "temperature": 0,
                    "logit_bias": {str(banned): -1e9}}) as r:
            out2 = json.loads(r.read())
        assert banned not in out2["choices"][0]["token_ids"]
        for payload, needle in [({"prompt": "hello"}, "tokenizer"),
                                ({"messages": []}, "tokenizer")]:
            path = ("/v1/chat/completions" if "messages" in payload
                    else "/v1/completions")
            try:
                _post(base, path, payload, timeout=30)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert needle in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
        srv.stop()


def test_openai_n_choices():
    """n>1 returns that many co-batched choices; greedy copies agree."""
    params = llama.init_params(CFG, seed=5)
    eng = Engine(params, CFG, max_slots=4, max_seq=32, eos_id=-1)
    httpd, srv = serve_async(eng)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with _post(base, "/v1/completions",
                   {"prompt": [6, 7], "max_tokens": 4, "n": 3,
                    "temperature": 0}) as r:
            out = json.loads(r.read())
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        ids = [c["token_ids"] for c in out["choices"]]
        assert ids[0] == ids[1] == ids[2] and len(ids[0]) == 4
        assert out["usage"]["completion_tokens"] == 12
        try:
            _post(base, "/v1/completions",
                  {"prompt": [6, 7], "n": 2, "stream": True}, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        srv.stop()


def test_guided_decoding_endpoints():
    """guided_choice (token-id lists, no tokenizer needed) and
    guided_regex (server-side tokenizer vocab) through the HTTP API."""
    params = llama.init_params(CFG, seed=6)
    eng = Engine(params, CFG, max_slots=4, max_seq=48, eos_id=7)
    httpd, srv = serve_async(eng, tokenizer=_StubTokenizer())
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with _post(base, "/generate",
                   {"prompt_ids": [5, 9], "max_new_tokens": 8,
                    "temperature": 1.0,
                    "guided_choice": [[30, 31, 32], [40, 41]]}) as r:
            out = json.loads(r.read())["output_ids"]
        assert out in ([30, 31, 32, 7], [40, 41, 7]), out

        # regex over the stub tokenizer's vocab: ids decoding to 'a'
        a_ids = {t for t in range(CFG.vocab_size)
                 if _StubTokenizer().decode([t]) == "a"}
        with _post(base, "/v1/completions",
                   {"prompt": [5, 9], "max_tokens": 8,
                    "temperature": 1.0, "guided_regex": "a{3}"}) as r:
            ch = json.loads(r.read())["choices"][0]
        assert len(ch["token_ids"]) == 4 and ch["token_ids"][-1] == 7
        assert all(t in a_ids for t in ch["token_ids"][:3]), ch

        # mutually exclusive fields -> 400
        import urllib.error
        try:
            _post(base, "/generate",
                  {"prompt_ids": [5], "max_new_tokens": 2,
                   "guided_regex": "a", "guided_choice": [[1]]})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        srv.stop()


def test_openai_top_logprobs():
    """Legacy integer ``logprobs`` on /v1/completions returns per-token
    top-K dicts; top-1 equals the committed token for greedy."""
    params = llama.init_params(CFG, seed=7)
    eng = Engine(params, CFG, max_slots=2, max_seq=48, eos_id=-1)
    httpd, srv = serve_async(eng, tokenizer=_StubTokenizer())
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with _post(base, "/v1/completions",
                   {"prompt": [5, 9, 11], "max_tokens": 4,
                    "temperature": 0, "logprobs": 2}) as r:
            ch = json.loads(r.read())["choices"][0]
        lp = ch["logprobs"]
        assert len(lp["top_logprobs"]) == 4
        assert all(len(d) == 2 for d in lp["top_logprobs"])
        assert [ids[0] for ids in lp["top_token_ids"]] == ch["token_ids"]
        # native endpoint exposes the parallel arrays too
        with _post(base, "/generate",
                   {"prompt_ids": [5, 9, 11], "max_new_tokens": 3,
                    "top_logprobs": 2}) as r:
            out = json.loads(r.read())
        assert len(out["top_token_ids"]) == 3
        assert [t[0] for t in out["top_token_ids"]] == out["output_ids"]
    finally:
        httpd.shutdown()
        srv.stop()


def test_guided_json_endpoint():
    """guided_json (schema → regex → FSM) over HTTP with a tokenizer
    whose vocab contains the JSON structural bytes."""
    class _JsonStub:
        # id i ∈ [3, 130) decodes to chr(i); enough to cover JSON text
        def encode(self, text):
            return [ord(c) for c in text]

        def decode(self, ids):
            return "".join(chr(t) if 3 <= t < 130 else "" for t in ids)

    params = llama.init_params(CFG, seed=8)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=2)
    httpd, srv = serve_async(eng, tokenizer=_JsonStub())
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with _post(base, "/v1/completions",
                   {"prompt": [5, 9], "max_tokens": 24,
                    "temperature": 1.0,
                    "guided_json": {"type": "array",
                                    "items": {"type": "boolean"},
                                    "minItems": 1, "maxItems": 2}}) as r:
            ch = json.loads(r.read())["choices"][0]
        text = ch["text"]
        parsed = json.loads(text)
        assert isinstance(parsed, list) and 1 <= len(parsed) <= 2
        assert all(isinstance(x, bool) for x in parsed)
    finally:
        httpd.shutdown()
        srv.stop()


def test_multi_lora_endpoint():
    """Adapter selection over HTTP: explicit "lora" field and OpenAI
    "model"-name routing; /v1/models lists adapters; 400 on unknown."""
    import dataclasses
    import urllib.error

    from test_lora import _adapter

    cfg = dataclasses.replace(CFG, kv_bits=16, dtype="float32", bits=8,
                              group_size=64)
    params = llama.init_params(cfg, seed=9)
    eng = Engine(params, cfg, max_slots=4, max_seq=48, eos_id=-1,
                 loras={"fin": _adapter(cfg, 91)})
    httpd, srv = serve_async(eng, model_name="base-tiny")
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(base + "/v1/models",
                                    timeout=30) as r:
            ids = [m["id"] for m in json.loads(r.read())["data"]]
        assert ids == ["base-tiny", "fin"]

        prompt = [5, 9, 11]
        with _post(base, "/generate",
                   {"prompt_ids": prompt, "max_new_tokens": 6}) as r:
            base_out = json.loads(r.read())["output_ids"]
        with _post(base, "/generate",
                   {"prompt_ids": prompt, "max_new_tokens": 6,
                    "lora": "fin"}) as r:
            lora_out = json.loads(r.read())["output_ids"]
        assert lora_out != base_out
        # OpenAI model-name routing reaches the same adapter
        with _post(base, "/v1/completions",
                   {"model": "fin", "prompt": prompt, "max_tokens": 6,
                    "temperature": 0}) as r:
            oai = json.loads(r.read())["choices"][0]["token_ids"]
        assert oai == lora_out

        try:
            _post(base, "/generate", {"prompt_ids": prompt,
                                      "max_new_tokens": 2,
                                      "lora": "nope"})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        srv.stop()


def test_embeddings_endpoint():
    """/v1/embeddings: L2-normalized mean-pooled hidden states; batched
    inputs; deterministic; engine state untouched."""
    import numpy as np

    params = llama.init_params(CFG, seed=10)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    httpd, srv = serve_async(eng, tokenizer=_StubTokenizer())
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with _post(base, "/v1/embeddings",
                   {"input": [[5, 6, 7], "hello"]}) as r:
            out = json.loads(r.read())
        assert len(out["data"]) == 2
        v0 = np.asarray(out["data"][0]["embedding"])
        assert v0.shape == (CFG.dim,)
        np.testing.assert_allclose(np.linalg.norm(v0), 1.0, rtol=1e-4)
        # deterministic + distinct inputs differ
        with _post(base, "/v1/embeddings", {"input": [5, 6, 7]}) as r:
            again = np.asarray(
                json.loads(r.read())["data"][0]["embedding"])
        np.testing.assert_allclose(v0, again, rtol=1e-6)
        v1 = np.asarray(out["data"][1]["embedding"])
        assert not np.allclose(v0, v1)
        assert out["usage"]["prompt_tokens"] == 3 + len("hello")
        # generation still works after embedding calls
        with _post(base, "/generate",
                   {"prompt_ids": [5, 6], "max_new_tokens": 3}) as r:
            assert len(json.loads(r.read())["output_ids"]) == 3
    finally:
        httpd.shutdown()
        srv.stop()


def test_invalid_prompt_ids_rejected_and_server_survives():
    """Out-of-range prompt ids must 400 (not crash the scheduler) and
    the server keeps serving afterwards (regression: host-side bincount
    of a penalized request crashed the step loop)."""
    import urllib.error

    params = llama.init_params(CFG, seed=11)
    eng = Engine(params, CFG, max_slots=2, max_seq=32, eos_id=-1)
    httpd, srv = serve_async(eng)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        for bad in ([-1], [CFG.vocab_size], []):
            try:
                _post(base, "/generate",
                      {"prompt_ids": bad, "max_new_tokens": 2,
                       "repetition_penalty": 1.2})
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        with _post(base, "/generate",
                   {"prompt_ids": [5, 6], "max_new_tokens": 3}) as r:
            assert len(json.loads(r.read())["output_ids"]) == 3
    finally:
        httpd.shutdown()
        srv.stop()


def test_streaming_top_logprobs():
    """stream:true must still compute and return top-logprobs (in the
    final done/SSE message)."""
    params = llama.init_params(CFG, seed=12)
    eng = Engine(params, CFG, max_slots=2, max_seq=32, eos_id=-1)
    httpd, srv = serve_async(eng)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with _post(base, "/generate",
                   {"prompt_ids": [5, 6], "max_new_tokens": 3,
                    "stream": True, "top_logprobs": 2}) as r:
            lines = [json.loads(ln) for ln in r.read().splitlines() if ln]
        done = lines[-1]
        assert done["done"] and len(done["top_token_ids"]) == 3
        assert [t[0] for t in done["top_token_ids"]] == done["output_ids"]
    finally:
        httpd.shutdown()
        srv.stop()


def test_openai_string_stop_sequences():
    """OpenAI ``stop`` (strings): decode-level early termination — text
    excludes the stop sequence, finish_reason 'stop', the slot frees
    (request ends before max_tokens)."""
    import urllib.error

    params = llama.init_params(CFG, seed=13)
    eng = Engine(params, CFG, max_slots=2, max_seq=48, eos_id=-1)
    httpd, srv = serve_async(eng, tokenizer=_StubTokenizer())
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        # discover the greedy text, pick a stop string inside it
        with _post(base, "/v1/completions",
                   {"prompt": [5, 9, 11], "max_tokens": 8,
                    "temperature": 0}) as r:
            full = json.loads(r.read())["choices"][0]
        stop = full["text"][3:5]
        with _post(base, "/v1/completions",
                   {"prompt": [5, 9, 11], "max_tokens": 8,
                    "temperature": 0, "stop": stop}) as r:
            ch = json.loads(r.read())["choices"][0]
        assert ch["finish_reason"] == "stop"
        assert stop not in ch["text"]
        assert full["text"].startswith(ch["text"])
        assert len(ch["token_ids"]) < 8
        # list form + unknown-stop passthrough ("length")
        with _post(base, "/v1/completions",
                   {"prompt": [5, 9, 11], "max_tokens": 4,
                    "temperature": 0, "stop": ["@@@never@@@"]}) as r:
            ch2 = json.loads(r.read())["choices"][0]
        assert ch2["finish_reason"] == "length"
        # no tokenizer → stop needs one (fresh server without tokenizer)
        eng2 = Engine(params, CFG, max_slots=1, max_seq=32, eos_id=-1)
        httpd2, srv2 = serve_async(eng2)
        try:
            _post(f"http://127.0.0.1:{httpd2.server_address[1]}",
                  "/v1/completions",
                  {"prompt": [5], "max_tokens": 2, "stop": "x"})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        finally:
            httpd2.shutdown()
            srv2.stop()
    finally:
        httpd.shutdown()
        srv.stop()


def test_seed_param_over_http():
    """OpenAI ``seed``: same seed → identical sampled completion; n>1
    with an explicit seed folds the choice index so choices differ but
    stay reproducible."""
    params = llama.init_params(CFG, seed=14)
    eng = Engine(params, CFG, max_slots=4, max_seq=48, eos_id=-1)
    httpd, srv = serve_async(eng)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    body = {"prompt": [5, 9, 11], "max_tokens": 6, "temperature": 1.0,
            "seed": 42}
    try:
        outs = []
        for _ in range(2):
            with _post(base, "/v1/completions", body) as r:
                outs.append(
                    json.loads(r.read())["choices"][0]["token_ids"])
        assert outs[0] == outs[1]
        with _post(base, "/v1/completions",
                   dict(body, seed=43)) as r:
            other = json.loads(r.read())["choices"][0]["token_ids"]
        assert other != outs[0]
        with _post(base, "/v1/completions", dict(body, n=2)) as r:
            chs = json.loads(r.read())["choices"]
        assert chs[0]["token_ids"] == outs[0]     # seed+0 = base seed
        assert chs[1]["token_ids"] != chs[0]["token_ids"]
    finally:
        httpd.shutdown()
        srv.stop()
