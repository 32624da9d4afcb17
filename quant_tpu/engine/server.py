"""Minimal HTTP serving frontend over the continuous-batching engine.

JSON API (stdlib http.server — zero deps, one background scheduler thread):

    POST /generate   {"prompt_ids": [...], "max_new_tokens": N,
                      "temperature": T, "top_k": K, "top_p": P,
                      "min_p": M}
        → {"req_id": i, "output_ids": [...]}
    POST /generate with "stream": true
        → chunked NDJSON: one {"token_ids": [...]} line per engine step
          as tokens commit, then a final {"done": true, "req_id": i,
          "output_ids": [...]} line. A client disconnect mid-stream
          cancels the request (its slot frees immediately).
    GET  /healthz    → {"ok": true, ...engine stats}
    GET  /metrics    → Prometheus text format (engine stats as
                       quant_tpu_* gauges + server request counters)

OpenAI-compatible surface (drop-in for openai-client users; token-array
prompts work without a tokenizer, text prompts and /v1/chat need one):

    GET  /v1/models           → model list (the single served model)
    POST /v1/completions      {"prompt": "text" | [ids], "max_tokens": N,
                               "temperature"/"top_p"/"min_p", "n": k,
                               "stop_token_ids": [...], "logprobs": true,
                               "stream": true → SSE (n=1 only)}
    POST /v1/chat/completions {"messages": [{"role","content"},...]}
                              (requires a tokenizer with a chat template)

Non-standard but useful: every choice carries ``token_ids`` so clients
without the tokenizer can decode; ``min_p`` and ``stop_token_ids`` are
accepted (vLLM-style extensions), as are the standard
``frequency_penalty`` / ``presence_penalty`` / ``logit_bias`` and
HF-style ``repetition_penalty``. Guided decoding (all endpoints):
``guided_regex`` / ``guided_json`` (a JSON-schema subset; both need a
server-side tokenizer for the vocab) or ``guided_choice`` (list of
strings or token-id lists) compile to a device-resident token FSM
(engine/grammar.py) — masking and state advance run inside the decode
jit, with FSMs cached per pattern/schema.

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
    def __init__(self, engine: Engine, tokenizer=None,
                 model_name: str = "quant-tpu"):
        # tokenizer is duck-typed (HF AutoTokenizer or anything with
        # encode/decode, optionally apply_chat_template); None disables
        # the text-prompt and /v1/chat paths but token-array prompts on
        # /v1/completions still work (the OpenAI API allows them).
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.lock = threading.Lock()
        self.events: dict[int, threading.Event] = {}
        # rid → (request, tokens-emitted-so-far, delta queue); the
        # scheduler thread is the only producer, the HTTP handler the
        # only consumer
        self.streams: dict[int, tuple[Request, int, queue.Queue]] = {}
        # OpenAI string stop sequences: rid → (request, [strings]);
        # checked in the scheduler loop after each step (the engine
        # works in tokens; string stops need the decoded text)
        self.stop_strs: dict[int, tuple[Request, list]] = {}
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
            try:
                with self.lock:
                    busy = self.engine.has_work()
                    finished = self.engine.step() if busy else []
                    finished += self._check_stop_strings()
                    self._push_stream_deltas()
                for req in finished:
                    ev = self.events.pop(req.req_id, None)
                    if ev:
                        ev.set()
            except Exception:
                # a step() exception must not kill the scheduler thread
                # (every handler would hang on ev.wait() forever): cancel
                # all in-flight requests so clients get their partial
                # output, then keep serving
                log.exception("engine step failed; cancelling in-flight "
                              "requests")
                with self.lock:
                    rids = list(self.events) + list(self.streams)
                    for rid in rids:
                        self.engine.cancel(rid)
                    for rid, (req, _, q) in list(self.streams.items()):
                        q.put(None)
                        del self.streams[rid]
                    for rid in list(self.events):
                        self.events.pop(rid).set()
                busy = False
            if not busy:
                time.sleep(0.005)

    def _check_stop_strings(self) -> list:
        """Early-terminate requests whose DECODED output contains one of
        their stop strings (OpenAI ``stop``): truncate the token stream
        at the shortest prefix containing the match, cancel the slot,
        and record the text cut so responses exclude the stop sequence.
        Runs under the scheduler lock, BEFORE stream deltas are pushed
        (stopped tokens are never emitted)."""
        finished = []
        for rid, (req, strs) in list(self.stop_strs.items()):
            if req.finished:
                del self.stop_strs[rid]
                continue
            if not req.output:
                continue
            text = self.tokenizer.decode(req.output)
            idx = min((text.find(s) for s in strs if s in text),
                      default=-1)
            if idx < 0:
                continue
            # shortest token prefix whose decode already contains a stop
            ntok = len(req.output)
            for n in range(1, len(req.output) + 1):
                t = self.tokenizer.decode(req.output[:n])
                if any(s in t for s in strs):
                    ntok = n
                    break
            del req.output[ntok:]
            del req.logprobs[ntok:]
            if req.top_ids:
                del req.top_ids[ntok:]
                del req.top_lps[ntok:]
            req.stopped_text = text[:idx]  # response text cut
            self.engine.cancel(rid)
            req.finished = True
            del self.stop_strs[rid]
            finished.append(req)
            log.info("string stop hit req=%d at %d tokens", rid, ntok)
        return finished

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
               stop_ids=(), fsm=None, top_logprobs=0,
               lora=None, stop_strs=(), seed=None) -> Request:
        ev = threading.Event()
        with self.lock:
            rid = self.next_id
            self.next_id += 1
            req = Request(req_id=rid, prompt=list(prompt_ids),
                          max_new_tokens=max_new_tokens, sampling=sampling,
                          deadline=self._deadline(timeout_s),
                          stop_ids=tuple(stop_ids), fsm=fsm,
                          top_logprobs=top_logprobs, lora=lora,
                          seed=seed)
            # add_request may reject (oversized prompt) — only register the
            # event once the request is actually enqueued, or the events
            # dict leaks an entry per failed submit.
            self.engine.add_request(req)
            self.events[rid] = ev
            if stop_strs:
                self.stop_strs[rid] = (req, list(stop_strs))
        ev.wait()
        return req

    def submit_many(self, prompt_ids, max_new_tokens, sampling, n,
                    timeout_s: float | None = None,
                    stop_ids=(), fsm=None,
                    top_logprobs=0, lora=None,
                    stop_strs=(), seed=None) -> list[Request]:
        """Enqueue n copies of one prompt (OpenAI ``n`` choices) and wait
        for all: the copies co-batch in the engine, so n choices cost one
        continuous-batching pass, not n sequential generations."""
        evs, reqs = [], []
        with self.lock:
            try:
                for j in range(n):
                    rid = self.next_id
                    self.next_id += 1
                    req = Request(req_id=rid, prompt=list(prompt_ids),
                                  max_new_tokens=max_new_tokens,
                                  sampling=sampling,
                                  deadline=self._deadline(timeout_s),
                                  stop_ids=tuple(stop_ids), fsm=fsm,
                                  top_logprobs=top_logprobs, lora=lora,
                                  # explicit seed + n choices: fold the
                                  # choice index so choices still differ
                                  seed=(None if seed is None
                                        else int(seed) + j))
                    self.engine.add_request(req)
                    ev = threading.Event()
                    self.events[rid] = ev
                    if stop_strs:
                        self.stop_strs[rid] = (req, list(stop_strs))
                    evs.append(ev)
                    reqs.append(req)
            except Exception:
                # roll back the copies already enqueued so a mid-batch
                # QueueFullError doesn't leak requests/events
                for req in reqs:
                    self.engine.cancel(req.req_id)
                    self.events.pop(req.req_id, None)
                raise
        for ev in evs:
            ev.wait()
        return reqs

    def submit_stream(self, prompt_ids, max_new_tokens, sampling,
                      timeout_s: float | None = None, stop_ids=(),
                      fsm=None, top_logprobs=0, lora=None,
                      stop_strs=(), seed=None):
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
                          stop_ids=tuple(stop_ids), fsm=fsm,
                          top_logprobs=top_logprobs, lora=lora,
                          seed=seed)
            self.engine.add_request(req)
            self.streams[rid] = (req, 0, q)
            if stop_strs:
                self.stop_strs[rid] = (req, list(stop_strs))
        return req, q

    def cancel_stream(self, rid: int):
        with self.lock:
            self.streams.pop(rid, None)
            self.engine.cancel(rid)

    # ---- guided decoding --------------------------------------------

    def _vocab_bytes(self) -> list[bytes]:
        """Tokenizer vocabulary as exact byte strings (built once;
        regex FSMs walk these) — see grammar.vocab_bytes for the
        SentencePiece / byte-level-BPE fidelity rules."""
        if getattr(self, "_vocab_bytes_cache", None) is None:
            from quant_tpu.engine.grammar import vocab_bytes

            self._vocab_bytes_cache = vocab_bytes(
                self.tokenizer, self.engine.cfg.vocab_size)
        return self._vocab_bytes_cache

    def stop_strings(self, body):
        """OpenAI ``stop``: a string or list of up to 4 strings
        (needs the server-side tokenizer to decode output text)."""
        s = body.get("stop")
        if s is None:
            return ()
        if isinstance(s, str):
            s = [s]
        if (not isinstance(s, list) or not s or len(s) > 4
                or not all(isinstance(x, str) and x for x in s)):
            raise ValueError("stop must be a non-empty string or a "
                             "list of 1-4 non-empty strings")
        if self.tokenizer is None:
            raise ValueError("string stop sequences need a server-side "
                             "tokenizer (serve --tokenizer); use "
                             "stop_token_ids instead")
        return tuple(s)

    def request_lora(self, body):
        """Adapter for a request: explicit ``lora`` field, or the
        OpenAI ``model`` name when it names a registered adapter
        (vLLM-style multi-LoRA routing). 400s on unknown ``lora``."""
        name = body.get("lora")
        if name is None:
            m = body.get("model")
            if m in self.engine.lora_names:
                name = m
            else:
                return None
        if name not in self.engine.lora_names:
            raise ValueError(f"unknown lora adapter {name!r}")
        return name

    def guided_fsm(self, body):
        """Build (and cache) a TokenFSM for a request body's
        ``guided_regex`` / ``guided_json`` / ``guided_choice`` field;
        None if none set."""
        from quant_tpu.engine.grammar import (
            choice_fsm, json_schema_regex, regex_fsm,
        )

        pattern = body.get("guided_regex")
        schema = body.get("guided_json")
        choice = body.get("guided_choice")
        if sum(x is not None for x in (pattern, schema, choice)) > 1:
            raise ValueError("guided_regex / guided_json / guided_choice "
                             "are mutually exclusive")
        if schema is not None:
            if not isinstance(schema, dict):
                raise ValueError("guided_json must be a schema object")
            pattern = json_schema_regex(schema)
        if pattern is None and choice is None:
            return None
        cache = getattr(self, "_fsm_cache", None)
        if cache is None:
            cache = self._fsm_cache = {}
        if pattern is not None:
            if self.tokenizer is None:
                raise ValueError(
                    "guided_regex needs a server-side tokenizer "
                    "(serve --tokenizer)")
            key = ("regex", pattern)
            if key not in cache:
                cache[key] = regex_fsm(pattern, self._vocab_bytes(),
                                       self.engine.eos_id)
            return cache[key]
        if not isinstance(choice, list) or not choice:
            raise ValueError("guided_choice must be a non-empty list")
        seqs = []
        for c in choice:
            if isinstance(c, str):
                if self.tokenizer is None:
                    raise ValueError("string guided_choice needs a "
                                     "server-side tokenizer")
                try:
                    ids = self.tokenizer.encode(c,
                                                add_special_tokens=False)
                except TypeError:  # duck-typed tokenizer without kwarg
                    ids = self.tokenizer.encode(c)
                seqs.append([int(t) for t in ids])
            elif isinstance(c, list):
                seqs.append([int(t) for t in c])
            else:
                raise ValueError("guided_choice entries must be strings "
                                 "or token-id lists")
        key = ("choice", tuple(tuple(s) for s in seqs))
        if key not in cache:
            cache[key] = choice_fsm(seqs, self.engine.cfg.vocab_size,
                                    self.engine.eos_id)
        return cache[key]


def _parse_logit_bias(body, vocab_size: int) -> tuple:
    """OpenAI logit_bias {"token_id": bias, ...} → sorted tuple of
    (token_id, bias) pairs (the hashable SamplingConfig form).

    Ids are validated against the model vocab — JAX scatter would drop
    out-of-range ids silently, so a wrong-tokenizer typo must 400
    instead. Bias magnitudes clamp to [-100, 100] (OpenAI semantics:
    ±100 already bans/forces)."""
    lb = body.get("logit_bias") or {}
    pairs = []
    for t, v in lb.items():
        tid = int(t)
        if not 0 <= tid < vocab_size:
            raise ValueError(
                f"logit_bias token id {tid} outside [0, {vocab_size})")
        pairs.append((tid, min(100.0, max(-100.0, float(v)))))
    return tuple(sorted(pairs))


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
            elif self.path == "/v1/models":
                models = [{"id": srv.model_name, "object": "model",
                           "owned_by": "quant-tpu"}]
                models += [{"id": n, "object": "model",
                            "owned_by": "quant-tpu",
                            "parent": srv.model_name}
                           for n in srv.engine.lora_names if n]
                self._json(200, {"object": "list", "data": models})
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

        def _stream(self, body, sampling, timeout_s=None, stop_ids=(),
                    fsm=None, lora=None):
            req, q = srv.submit_stream(
                body["prompt_ids"],
                int(body.get("max_new_tokens", 32)),
                sampling,
                timeout_s,
                stop_ids,
                fsm=fsm,
                lora=lora,
                top_logprobs=int(body.get("top_logprobs", 0)),
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
                        if req.top_logprobs:
                            done["top_token_ids"] = req.top_ids
                            done["top_logprobs"] = req.top_lps
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

        # ---- OpenAI-compatible layer -------------------------------

        def _oai_sampling(self, body):
            # OpenAI defaults: temperature 1.0 (sampled), top_p 1.0
            return SamplingConfig(
                temperature=float(body.get("temperature", 1.0)),
                top_k=int(body.get("top_k", 0)),
                top_p=float(body.get("top_p", 1.0)),
                min_p=float(body.get("min_p", 0.0)),
                repetition_penalty=float(
                    body.get("repetition_penalty", 1.0)),
                frequency_penalty=float(
                    body.get("frequency_penalty", 0.0)),
                presence_penalty=float(
                    body.get("presence_penalty", 0.0)),
                logit_bias=_parse_logit_bias(
                    body, srv.engine.cfg.vocab_size),
            )

        def _oai_prompt_ids(self, body):
            p = body.get("prompt")
            if isinstance(p, str):
                if srv.tokenizer is None:
                    raise ValueError(
                        "text prompt needs a server-side tokenizer; pass "
                        "token ids instead (prompt: [int, ...])")
                return list(srv.tokenizer.encode(p))
            if (isinstance(p, list) and p
                    and all(isinstance(t, int) for t in p)):
                return p
            raise ValueError("prompt must be a string or a non-empty "
                             "list of token ids (batched prompts are "
                             "not supported)")

        def _finish_reason(self, req):
            if getattr(req, "stopped_text", None) is not None:
                return "stop"
            last = req.output[-1] if req.output else None
            if last == srv.engine.eos_id or (last is not None
                                             and last in req.stop_ids):
                return "stop"
            return "length"

        def _decode_text(self, ids):
            if srv.tokenizer is None:
                return ""
            return srv.tokenizer.decode(ids)

        def _choice_text(self, req):
            # a string-stop cut excludes the stop sequence (OpenAI)
            cut = getattr(req, "stopped_text", None)
            return cut if cut is not None else self._decode_text(
                req.output)

        @staticmethod
        def _oai_top_logprobs(body):
            """OpenAI top-K request: completions' legacy integer
            ``logprobs`` or chat's ``top_logprobs`` (with logprobs
            true). Bools stay chosen-token-only."""
            lp = body.get("logprobs")
            if isinstance(lp, int) and not isinstance(lp, bool) and lp > 0:
                return min(lp, 20)
            tk = body.get("top_logprobs")
            if lp and tk:
                return min(int(tk), 20)
            return 0

        def _oai_choice(self, req, body, chat, index=0):
            reason = self._finish_reason(req)
            if chat:
                choice = {"index": index, "finish_reason": reason,
                          "message": {"role": "assistant",
                                      "content":
                                          self._choice_text(req)}}
            else:
                choice = {"index": index, "finish_reason": reason,
                          "text": self._choice_text(req)}
            choice["token_ids"] = req.output  # extension
            if body.get("logprobs"):
                lpobj = {"token_logprobs": req.logprobs,
                         "tokens": req.output}
                if req.top_logprobs and req.top_ids:
                    def pos_dict(ids, lps):
                        # distinct ids can decode to the same string —
                        # disambiguate collisions with an id suffix so
                        # all K entries survive (lossless ids ride the
                        # top_token_ids extension regardless)
                        d = {}
                        for t, lp in zip(ids, lps):
                            s = self._decode_text([t]) or str(t)
                            if s in d:
                                s = f"{s}#{t}"
                            d[s] = lp
                        return d
                    lpobj["top_logprobs"] = [
                        pos_dict(ids, lps)
                        for ids, lps in zip(req.top_ids, req.top_lps)]
                    lpobj["top_token_ids"] = req.top_ids  # extension
                choice["logprobs"] = lpobj
            return choice

        def _oai_generate(self, body, prompt_ids, chat):
            import time as _t
            sampling = self._oai_sampling(body)
            max_new = int(body.get("max_tokens", 16))
            stop_ids = [int(t) for t in body.get("stop_token_ids", [])]
            nq = int(body.get("n", 1))
            if not 1 <= nq <= 128:
                # OpenAI caps n at 128; without a cap a single request
                # could enqueue unbounded copies (submit_many blocks the
                # handler thread until all n complete) even when
                # max_pending backpressure is off.
                raise ValueError("n must be in [1, 128]")
            obj = ("chat.completion" if chat else "text_completion")
            if body.get("stream"):
                if nq != 1:
                    raise ValueError("stream requires n=1")
                self._oai_stream(body, prompt_ids, sampling, max_new,
                                 stop_ids, chat)
                return
            reqs = srv.submit_many(prompt_ids, max_new, sampling, nq,
                                   None, stop_ids,
                                   fsm=srv.guided_fsm(body),
                                   top_logprobs=self._oai_top_logprobs(
                                       body),
                                   lora=srv.request_lora(body),
                                   stop_strs=srv.stop_strings(body),
                                   seed=(int(body["seed"])
                                         if body.get("seed") is not None
                                         else None))
            comp = sum(len(r.output) for r in reqs)
            self._json(200, {
                "id": f"cmpl-{reqs[0].req_id}", "object": obj,
                "created": int(_t.time()), "model": srv.model_name,
                "choices": [self._oai_choice(r, body, chat, i)
                            for i, r in enumerate(reqs)],
                "usage": {"prompt_tokens": len(reqs[0].prompt),
                          "completion_tokens": comp,
                          "total_tokens":
                              len(reqs[0].prompt) + comp}})

        def _oai_stream(self, body, prompt_ids, sampling, max_new,
                        stop_ids, chat):
            import time as _t
            req, q = srv.submit_stream(prompt_ids, max_new, sampling,
                                       None, stop_ids,
                                       fsm=srv.guided_fsm(body),
                                       lora=srv.request_lora(body),
                                       top_logprobs=self._oai_top_logprobs(
                                           body),
                                       stop_strs=srv.stop_strings(body),
                                       seed=(int(body["seed"])
                                             if body.get("seed")
                                             is not None else None))
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            obj = ("chat.completion.chunk" if chat
                   else "text_completion")

            def sse(payload):
                data = b"data: " + payload + b"\n\n"
                self.wfile.write(f"{len(data):x}\r\n".encode()
                                 + data + b"\r\n")
                self.wfile.flush()

            def delta_choice(toks, reason):
                if chat:
                    c = {"index": 0, "finish_reason": reason,
                         "delta": ({"content": self._decode_text(toks)}
                                   if toks else {})}
                else:
                    c = {"index": 0, "finish_reason": reason,
                         "text": self._decode_text(toks)}
                c["token_ids"] = toks
                return c

            try:
                if chat:
                    sse(json.dumps(
                        {"id": f"cmpl-{req.req_id}", "object": obj,
                         "created": int(_t.time()),
                         "model": srv.model_name,
                         "choices": [{"index": 0, "finish_reason": None,
                                      "delta": {"role": "assistant"},
                                      "token_ids": []}]}).encode())
                while True:
                    toks = q.get()
                    done = toks is None
                    choice = delta_choice(
                        [] if done else toks,
                        self._finish_reason(req) if done else None)
                    if done and req.top_logprobs:
                        choice["top_token_ids"] = req.top_ids
                        choice["top_logprobs"] = req.top_lps
                    sse(json.dumps(
                        {"id": f"cmpl-{req.req_id}", "object": obj,
                         "created": int(_t.time()),
                         "model": srv.model_name,
                         "choices": [choice]}).encode())
                    if done:
                        sse(b"[DONE]")
                        self.wfile.write(b"0\r\n\r\n")
                        return
            except OSError:
                srv.cancel_stream(req.req_id)
                log.info("SSE client gone; cancelled req=%d", req.req_id)

        def _oai_completions(self, body):
            self._oai_generate(body, self._oai_prompt_ids(body),
                               chat=False)

        def _oai_chat(self, body):
            tok = srv.tokenizer
            if tok is None or not hasattr(tok, "apply_chat_template"):
                self._json(400, {"error": "chat completions need a "
                                 "server-side tokenizer with a chat "
                                 "template (serve --tokenizer)"})
                return
            msgs = body["messages"]
            ids = tok.apply_chat_template(msgs,
                                          add_generation_prompt=True)
            self._oai_generate(body, list(ids), chat=True)

        def _oai_embeddings(self, body):
            inp = body.get("input")
            if inp is None:
                raise ValueError("input required")
            if isinstance(inp, str) or (
                    isinstance(inp, list) and inp
                    and isinstance(inp[0], int)):
                inp = [inp]
            data = []
            n_tok = 0
            for i, item in enumerate(inp):
                if isinstance(item, str):
                    if srv.tokenizer is None:
                        raise ValueError("text input needs a server-side"
                                         " tokenizer (serve --tokenizer)")
                    ids = list(srv.tokenizer.encode(item))
                else:
                    ids = [int(t) for t in item]
                n_tok += len(ids)
                with srv.lock:
                    vec = srv.engine.embed(ids)
                data.append({"object": "embedding", "index": i,
                             "embedding": [float(v) for v in vec]})
            self._json(200, {
                "object": "list", "data": data,
                "model": srv.model_name,
                "usage": {"prompt_tokens": n_tok,
                          "total_tokens": n_tok}})

        def do_POST(self):
            routes = {"/generate": None,
                      "/v1/completions": self._oai_completions,
                      "/v1/chat/completions": self._oai_chat,
                      "/v1/embeddings": self._oai_embeddings}
            if self.path not in routes:
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n))
                if routes[self.path] is not None:
                    routes[self.path](body)
                    return
                sampling = SamplingConfig(
                    temperature=float(body.get("temperature", 0.0)),
                    top_k=int(body.get("top_k", 0)),
                    top_p=float(body.get("top_p", 1.0)),
                    min_p=float(body.get("min_p", 0.0)),
                    repetition_penalty=float(
                        body.get("repetition_penalty", 1.0)),
                    frequency_penalty=float(
                        body.get("frequency_penalty", 0.0)),
                    presence_penalty=float(
                        body.get("presence_penalty", 0.0)),
                    logit_bias=_parse_logit_bias(
                        body, srv.engine.cfg.vocab_size),
                )
                timeout_s = body.get("timeout_s")
                if timeout_s is not None:
                    timeout_s = float(timeout_s)  # ValueError/TypeError→400
                stop_ids = [int(t) for t in body.get("stop_ids", [])]
                fsm = srv.guided_fsm(body)
                if body.get("stream"):
                    self._stream(body, sampling, timeout_s, stop_ids,
                                 fsm=fsm, lora=srv.request_lora(body))
                    return
                req = srv.submit(
                    body["prompt_ids"],
                    int(body.get("max_new_tokens", 32)),
                    sampling,
                    timeout_s,
                    stop_ids,
                    fsm=fsm,
                    top_logprobs=int(body.get("top_logprobs", 0)),
                    lora=srv.request_lora(body),
                    stop_strs=srv.stop_strings(body),
                    seed=(int(body["seed"])
                          if body.get("seed") is not None else None),
                )
                resp = {"req_id": req.req_id,
                        "output_ids": req.output,
                        "timed_out": req.timed_out}
                if body.get("logprobs"):
                    resp["logprobs"] = req.logprobs
                if req.top_logprobs:
                    resp["top_token_ids"] = req.top_ids
                    resp["top_logprobs"] = req.top_lps
                self._json(200, resp)
            except QueueFullError as e:
                self._json(429, {"error": str(e)})
            except (KeyError, TypeError, ValueError,
                    json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})

    return Handler


def serve(engine: Engine, host: str = "127.0.0.1", port: int = 8400,
          tokenizer=None, model_name: str = "quant-tpu"):
    """Blocking serve loop; returns the (already started) HTTPServer when
    called with ``port=0`` probing in tests via serve_async."""
    srv = EngineServer(engine, tokenizer=tokenizer, model_name=model_name)
    srv.start()
    httpd = ThreadingHTTPServer((host, port), _make_handler(srv))
    log.info("serving on %s:%d", host, httpd.server_address[1])
    try:
        httpd.serve_forever()
    finally:
        srv.stop()


def serve_async(engine: Engine, host: str = "127.0.0.1", port: int = 0,
                tokenizer=None, model_name: str = "quant-tpu"):
    """Start server in a background thread; returns (httpd, engine_server)."""
    srv = EngineServer(engine, tokenizer=tokenizer, model_name=model_name)
    srv.start()
    httpd = ThreadingHTTPServer((host, port), _make_handler(srv))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, srv
