"""Continuous-batching inference engine (SURVEY.md §2.2 #15).

Slot-based scheduler over a fixed-shape decode step — the TPU analogue of
the reference-northstar's "continuous batching" (BASELINE.json:5): admission
and eviction happen in host Python between steps, but every device step is
the SAME jit'd computation (fixed [B, 1] decode, bucketed [1, T] prefill),
so nothing ever retraces.

* Admit: a pending request takes a free slot; its prompt prefills into that
  slot's KV pages via a per-slot prefill (prompt padded to a power-of-two
  bucket; pad garbage sits beyond ``lengths`` and is masked/overwritten).
* Step: all slots decode one token together; inactive slots compute masked
  garbage (cost is shape-static anyway) and are ignored.
* Evict: EOS / max_new_tokens / cache-capacity exhaustion frees the slot.

Observability: per-step structured stats (occupancy, tokens/s EMA) via
``Engine.stats`` (SURVEY.md §5 metrics).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.engine.sampler import SamplingConfig, sample
from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig

log = logging.getLogger("quant_tpu.engine")

__all__ = ["Engine", "Request"]


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: list[int]
    max_new_tokens: int
    sampling: SamplingConfig = SamplingConfig()
    # filled by the engine
    output: list[int] = dataclasses.field(default_factory=list)
    finished: bool = False


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class Engine:
    """Single-host engine; ``mesh`` extends it across chips (TP/DP)."""

    def __init__(
        self,
        params: llama.LlamaParams,
        cfg: ModelConfig,
        max_slots: int = 8,
        max_seq: int = 1024,
        eos_id: int = 2,
    ):
        self.params = params
        self.cfg = cfg
        self.max_slots = max_slots
        self.max_seq = max_seq
        self.eos_id = eos_id
        self.cache = llama.init_cache(cfg, max_slots, max_seq)
        self.slots: list[Request | None] = [None] * max_slots
        self.last_tokens = np.zeros((max_slots,), np.int32)
        self.pending: list[Request] = []
        # Requests that finish DURING admission (max_new=1 / immediate EOS)
        # are staged here so step()/step_block() still report them.
        self._admit_finished: list[Request] = []
        self.key = jax.random.key(0)
        self._steps = 0
        self._tok_ema = 0.0
        self._last_t = time.perf_counter()

        cfg_static = cfg

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(params, tokens, cache, key):
            logits, cache = llama.forward(params, tokens, cache, cfg_static)
            keyn, sub = jax.random.split(key)
            return logits[:, -1], cache, keyn, sub

        self._decode = decode_step

        @functools.partial(jax.jit, static_argnames=("n",),
                           donate_argnums=(2,))
        def decode_block(params, tokens, cache, n):
            # n greedy steps fused in one dispatch (device-side loop) —
            # amortizes host dispatch latency; used by step_block().
            def body(_, carry):
                tok, cache, out, i = carry
                logits, cache = llama.forward(params, tok, cache, cfg_static)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                out = jax.lax.dynamic_update_slice(out, nxt, (0, i))
                return nxt, cache, out, i + 1
            out = jnp.zeros((tokens.shape[0], n), jnp.int32)
            _, cache, out, _ = jax.lax.fori_loop(
                0, n, body, (tokens, cache, out, 0)
            )
            return out, cache

        self._decode_block = decode_block

        # per-bucket prefill: operates on ONE slot's cache view
        self._prefills: dict[int, Any] = {}

    # ── prefill ─────────────────────────────────────────────────────

    def _prefill_fn(self, t_pad: int):
        if t_pad in self._prefills:
            return self._prefills[t_pad]
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill(params, tokens, cache, slot, true_len, first):
            # Slice slot b's cache as a batch-1 cache; the first chunk
            # resets its length, later chunks append.
            view = lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
            start = jnp.where(first, 0, cache.lengths[slot])[None]
            sub = llama.KVCache(
                k_codes=view(cache.k_codes), k_scale=view(cache.k_scale),
                v_codes=view(cache.v_codes), v_scale=view(cache.v_scale),
                lengths=start,
            )
            logits, sub = llama.forward(params, tokens, sub, cfg)
            # Write back with the TRUE length (pad rows sit beyond it and
            # get overwritten by subsequent chunks/decode steps).
            put = lambda a, s: jax.lax.dynamic_update_slice_in_dim(
                a, s, slot, axis=1
            )
            cache = llama.KVCache(
                k_codes=put(cache.k_codes, sub.k_codes),
                k_scale=put(cache.k_scale, sub.k_scale),
                v_codes=put(cache.v_codes, sub.v_codes),
                v_scale=put(cache.v_scale, sub.v_scale),
                lengths=cache.lengths.at[slot].set(start[0] + true_len),
            )
            last = logits[0, true_len - 1]
            return last, cache

        self._prefills[t_pad] = prefill
        return prefill

    # ── public API ──────────────────────────────────────────────────

    def add_request(self, req: Request) -> None:
        if len(req.prompt) + req.max_new_tokens > self.max_seq:
            raise ValueError(
                f"request {req.req_id}: prompt({len(req.prompt)}) + "
                f"max_new({req.max_new_tokens}) exceeds max_seq {self.max_seq}"
            )
        self.pending.append(req)

    PREFILL_CHUNK = 512  # cap XLA prefill attention at O(chunk * S) memory

    def _admit(self) -> None:
        for i in range(self.max_slots):
            if self.slots[i] is not None or not self.pending:
                continue
            req = self.pending.pop(0)
            # Chunked prefill: long prompts stream through fixed-shape
            # buckets; each chunk appends to the slot's cache (first chunk
            # resets it), so attention memory stays bounded.
            prompt = req.prompt
            chunks = [prompt[o:o + self.PREFILL_CHUNK]
                      for o in range(0, len(prompt), self.PREFILL_CHUNK)]
            done = 0
            for ci, chunk in enumerate(chunks):
                t_pad = _bucket(len(chunk))
                toks = np.zeros((1, t_pad), np.int32)
                toks[0, : len(chunk)] = chunk
                last_logits, self.cache = self._prefill_fn(t_pad)(
                    self.params, jnp.asarray(toks), self.cache,
                    jnp.int32(i), jnp.int32(len(chunk)),
                    jnp.bool_(ci == 0),
                )
                done += len(chunk)
            self.key, sub = jax.random.split(self.key)
            tok = int(sample(last_logits[None], sub, req.sampling)[0])
            req.output.append(tok)
            self.slots[i] = req
            self.last_tokens[i] = tok
            self._maybe_finish(i, tok)
            if req.finished:
                self._admit_finished.append(req)
            log.info("admit req=%d slot=%d prompt_len=%d",
                     req.req_id, i, len(req.prompt))

    def _maybe_finish(self, i: int, tok: int) -> None:
        req = self.slots[i]
        if req is None:
            return
        used = len(req.prompt) + len(req.output)
        if (tok == self.eos_id or len(req.output) >= req.max_new_tokens
                or used >= self.max_seq):
            req.finished = True
            self.slots[i] = None
            log.info("finish req=%d generated=%d", req.req_id, len(req.output))

    def cancel(self, req_id: int) -> bool:
        """Cancel a pending or in-flight request; returns True if found."""
        for i, r in enumerate(self.pending):
            if r.req_id == req_id:
                self.pending.pop(i)
                r.finished = True
                log.info("cancel pending req=%d", req_id)
                return True
        for i, r in enumerate(self.slots):
            if r is not None and r.req_id == req_id:
                r.finished = True
                self.slots[i] = None
                log.info("cancel active req=%d slot=%d", req_id, i)
                return True
        return False

    def step(self) -> list[Request]:
        """Admit pending, decode one token for all active slots."""
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        finished, self._admit_finished = self._admit_finished, []
        if active:
            tokens = jnp.asarray(self.last_tokens[:, None])
            logits, self.cache, self.key, sub = self._decode(
                self.params, tokens, self.cache, self.key
            )
            # per-slot sampling configs may differ: sample once per DISTINCT
            # config (usually 1-2) and scatter tokens back to its slots
            toks = np.array(sample(logits, sub, SamplingConfig()))
            groups: dict = {}
            for i in active:
                sc = self.slots[i].sampling
                if not sc.greedy:
                    groups.setdefault(sc, []).append(i)
            for sc, slots in groups.items():
                toks2 = np.asarray(sample(logits, sub, sc))
                for i in slots:
                    toks[i] = toks2[i]
            for i in active:
                req = self.slots[i]
                tok = int(toks[i])
                req.output.append(tok)
                self.last_tokens[i] = tok
                self._maybe_finish(i, tok)
                if req.finished:
                    finished.append(req)
        self._steps += 1
        now = time.perf_counter()
        rate = len(active) / max(now - self._last_t, 1e-6)
        self._tok_ema = 0.9 * self._tok_ema + 0.1 * rate
        self._last_t = now
        return finished

    def step_block(self, n: int) -> list[Request]:
        """Up to n greedy decode steps fused into ONE device dispatch.

        Amortizes host dispatch latency (critical on high-latency links);
        trades admission granularity — pending requests wait for the block.
        Greedy only; per-slot streams are trimmed at EOS/max_new on host.
        """
        self._admit()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        finished, self._admit_finished = self._admit_finished, []
        if not active:
            return finished
        for i in active:
            req = self.slots[i]
            used = len(req.prompt) + len(req.output)
            n = min(n, req.max_new_tokens - len(req.output),
                    self.max_seq - used)
        n = max(n, 1)
        tokens = jnp.asarray(self.last_tokens[:, None])
        toks, self.cache = self._decode_block(
            self.params, tokens, self.cache, n
        )
        toks = np.asarray(toks)
        for i in active:
            req = self.slots[i]
            for j in range(n):
                tok = int(toks[i, j])
                req.output.append(tok)
                self.last_tokens[i] = tok
                self._maybe_finish(i, tok)
                if req.finished:
                    finished.append(req)
                    break
        self._steps += n
        return finished

    @property
    def stats(self) -> dict:
        return {
            "steps": self._steps,
            "occupancy": sum(s is not None for s in self.slots),
            "pending": len(self.pending),
            "tokens_per_s_ema": round(self._tok_ema, 1),
        }

    def has_work(self) -> bool:
        return bool(self.pending) or any(s is not None for s in self.slots)

    def generate(
        self,
        prompts: list[list[int]],
        max_new_tokens: int = 32,
        sampling: SamplingConfig = SamplingConfig(),
    ) -> list[list[int]]:
        """Convenience batch API over the continuous-batching loop."""
        reqs = [
            Request(req_id=i, prompt=p, max_new_tokens=max_new_tokens,
                    sampling=sampling)
            for i, p in enumerate(prompts)
        ]
        for r in reqs:
            self.add_request(r)
        while self.has_work():
            self.step()
        return [r.output for r in reqs]
