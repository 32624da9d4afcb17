"""Continuous-batching inference engine (SURVEY.md §2.2 #15, #8).

Slot-based scheduler over fixed-shape device programs — the TPU analogue of
the reference-northstar's "continuous batching across hosts"
(BASELINE.json:5). The engine runs THREE jitted programs, the classic
TPU-serving split (prefill / insert / decode), so admission never stalls
decode by more than one prefill chunk:

* **prefill** — batch-1 forward of one prompt chunk (power-of-two bucket)
  into a standalone single-slot cache. One chunk per ``step()`` call
  (admission budget): active slots keep decoding between chunks.
* **insert** — scatters the completed single-slot cache into slot ``i`` of
  the decode cache (one device program, O(prompt·L·H·D) traffic).
* **decode** — all slots advance one token (or ``step_block``: n tokens in
  ONE dispatch with on-device per-slot sampling, amortizing host dispatch
  latency). Inactive slots compute masked garbage (shape-static) and their
  out-of-range cache writes are dropped by the scatter's ``mode="drop"``.

Multi-chip (``mesh=``): the same three programs run under ``shard_map``
over a (pipe, data, model) mesh — packed weights TP-column/row-split, KV
cache batch-sharded over ``data`` and head-sharded over ``model``, layers
over ``pipe`` (BASELINE.json:5 "quantized weights and KV tensor-sharded
across chips"; config 4's v5e-8 host). The batch-1 prefill cache replicates
over ``data`` and the insert program writes only the owning data shard.
``paged=True`` composes with (pipe, data, model) meshes: each data shard
owns a private page pool (pool dim sharded over ``data``, kv-heads over
``model``, layer slices over ``pipe``) and the allocator keeps one free
list per data group storing SHARD-LOCAL page ids in that group's table
rows, so preemption and oversubscription stay per-shard decisions with
zero cross-chip traffic.

Speculative decoding (``spec_gamma > 0``): host-side draft proposals
(n-gram prompt lookup by default, engine/spec.py) verified by ONE
(gamma+1)-token forward per step — each slot commits 1..gamma+1 tokens
per dispatch. Greedy slots reproduce the plain argmax chain; sampled
slots run on-device delta-proposal rejection sampling
(sampler.spec_commit), which draws from the exact target chain.
Composes with meshes and the paged pool; ``step_block`` ignores it (the
fused device loop has no host between iterations to propose drafts).

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
from jax.sharding import NamedSharding, PartitionSpec as P

from quant_tpu.engine.sampler import (SamplingConfig, sample,
                                      sample_batch, spec_commit,
                                      token_logprob)
from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig

log = logging.getLogger("quant_tpu.engine")

__all__ = ["Engine", "QueueFullError", "Request"]


class QueueFullError(RuntimeError):
    """add_request refused: the pending queue is at max_pending
    (backpressure signal — the HTTP server maps it to 429)."""


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: list[int]
    max_new_tokens: int
    sampling: SamplingConfig = SamplingConfig()
    # absolute time.monotonic() deadline; the engine cancels the request
    # at the next step boundary once passed (timed_out set). None = no
    # deadline.
    deadline: float | None = None
    # extra per-request stop tokens (in addition to the engine's eos_id);
    # the stop token itself is included in the output like eos
    stop_ids: tuple[int, ...] = ()
    # grammar-constrained decoding: a grammar.TokenFSM whose transition
    # table lives on device; the decode programs mask illegal tokens and
    # advance the per-slot state entirely inside the jit (no per-step
    # host sync). Composes with speculative decoding (r5): the verify
    # program masks every chain position with the byte-walked state, so
    # illegal drafts reject and guided output == guided plain decode.
    fsm: Any = None
    # OpenAI top-logprobs: also return the top-K raw-model logprobs per
    # output position (ids + logprobs computed on device, packed into
    # the same fetch as the tokens). 0 = off.
    top_logprobs: int = 0
    # Multi-LoRA: name of a registered adapter (Engine(loras={...}));
    # None = the base model.
    lora: Any = None
    # Per-request PRNG seed: the sampled stream is a pure function of
    # (seed, prompt, sampling config) — INDEPENDENT of co-batched
    # traffic, dispatch sizes or engine history (per-slot on-device
    # keys). None derives a deterministic seed from req_id.
    seed: int | None = None
    # filled by the engine
    output: list[int] = dataclasses.field(default_factory=list)
    # log p(token) under the raw model distribution, one per output token
    logprobs: list[float] = dataclasses.field(default_factory=list)
    finished: bool = False
    timed_out: bool = False
    # per-position top-K alternatives when top_logprobs > 0
    top_ids: list = dataclasses.field(default_factory=list)
    top_lps: list = dataclasses.field(default_factory=list)
    # number of PRNG splits this request's slot key has consumed
    # (one per dispatch participation) — lets preempted re-admissions
    # replay to the exact key state
    key_draws: int = 0
    # latency bookkeeping (time.monotonic()): set at add_request /
    # first committed token / finish — TTFT and TPOT derive from these
    submit_t: float | None = None
    first_token_t: float | None = None
    finish_t: float | None = None

    @property
    def ttft(self) -> float | None:
        """Time to first token (s); None until the first token lands."""
        if self.submit_t is None or self.first_token_t is None:
            return None
        return self.first_token_t - self.submit_t

    @property
    def tpot(self) -> float | None:
        """Mean time per output token after the first (s)."""
        if (self.first_token_t is None or self.finish_t is None
                or len(self.output) < 2):
            return None
        return (self.finish_t - self.first_token_t) / (len(self.output) - 1)


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, donate_argnums=())
def _advance_key(kd, n):
    """Split-chain a key n times (one dispatch): the decode programs
    consume one split per dispatch, so a preempted request re-admitted
    with k prior draws resumes the EXACT stream it would have produced
    uninterrupted."""
    def body(_, k):
        return jax.random.split(k)[0]
    return jax.random.key_data(jax.lax.fori_loop(
        0, n, body, jax.random.wrap_key_data(kd)))


def _top_logprobs(logits, k: int):
    """(ids [B, k] int32, logprobs [B, k] f32) of the raw model
    distribution — the OpenAI top-logprobs payload. Accepts [B, V] or
    [B, T, V] (then [B, T, k])."""
    lg = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lg, axis=-1, keepdims=True)
    tl, ti = jax.lax.top_k(lg, k)
    return ti.astype(jnp.int32), tl - lse


def _fsm_mask_rows(bits, ids, states, vocab):
    """Per-slot legality rows for the sampler (0 legal / -1 forbidden)
    from the packed [F, S, V/32] bitmask stack."""
    w = bits[ids, states]                             # [B, Vw] uint32
    exp = (w[:, :, None]
           >> jnp.arange(32, dtype=jnp.uint32)[None, None]) & 1
    return jnp.where(exp.reshape(w.shape[0], -1)[:, :vocab] > 0,
                     0, -1).astype(jnp.int32)


def _fsm_walk(bt, tokb, tokl, ids, states, toks, eos_id):
    """Advance per-slot FSM states by walking the sampled tokens' bytes
    through the byte-DFA stack ([F, S, 256]) — a handful of [B]-sized
    gathers instead of a dense [S, V] next-state table (VERDICT r3 #5).
    EOS walks zero bytes (state unchanged; the request is finishing)."""
    tb = tokb[ids, toks].astype(jnp.int32)            # [B, L]
    tl = jnp.where(toks == eos_id, 0, tokl[ids, toks])
    smax = bt.shape[1] - 1

    def body(p, cur):
        nxt = bt[ids, jnp.clip(cur, 0, smax), tb[:, p]]
        return jnp.where(p < tl, nxt, cur)

    st = jax.lax.fori_loop(0, tb.shape[1], body, states)
    return jnp.maximum(st, 0)


class Engine:
    """Continuous-batching engine; ``mesh`` extends it across chips.

    ``mesh``: a ``parallel.make_mesh`` (pipe, data, model, seq) mesh. The
    engine shards params/caches itself (idempotent if already sharded).
    ``seq`` must be 1 — long-context sequence parallelism applies to
    prefill via parallel.sp, not to slot decode.

    Per-request capabilities (all on-device in the decode programs):
    sampling knobs + penalties + logit_bias, grammar FSMs
    (``Request.fsm`` — register_fsm/engine.grammar), top-K logprobs
    (``top_logprobs``), LoRA adapters (``Engine(loras=...)`` +
    ``Request.lora``; composes with n-gram speculation), paged KV /
    prefix caching, speculative decoding (``spec_gamma``), deadlines,
    and :meth:`embed` for /v1/embeddings. ``stats`` exposes rolling
    TTFT/TPOT percentiles.
    """

    PREFILL_CHUNK = 512  # cap XLA prefill attention at O(chunk * S) memory
    MAX_FSMS = 64        # registry cap (compressed tables: ~34 MB each
    #                    at the 128k-vocab/2k-state extreme, typ. <1 MB)

    def __init__(
        self,
        params: llama.LlamaParams,
        cfg: ModelConfig,
        max_slots: int = 8,
        max_seq: int = 1024,
        eos_id: int = 2,
        mesh=None,
        pp_micro: int = 1,
        paged: bool = False,
        page_size: int | None = None,
        n_pages: int | None = None,
        prefix_cache: bool = False,
        spec_gamma: int = 0,
        spec_proposer=None,
        max_pending: int | None = None,
        loras: dict | None = None,
        sp_prefill_mode: str = "ring",
        sp_prefill_threshold: int | None = None,
        sp_quantum: int = 64,
        block_admit_chunks: int | None = 4,
    ):
        self.cfg = cfg
        self.max_pending = max_pending
        self.mesh = mesh
        # Multi-LoRA: adapters register at construction (one retrace
        # per engine, never mid-serving); requests pick by name.
        self.lora_names: dict = {None: 0}
        if loras:
            from quant_tpu.models.lora import make_lora_stack

            if spec_gamma and spec_proposer is not None and hasattr(
                    spec_proposer, "draft_batch"):
                raise ValueError(
                    "loras do not compose with a draft-MODEL proposer "
                    "(the draft has no adapters, so its KV would "
                    "desynchronize); n-gram speculation composes fine")
            tp_ = mesh.shape.get("model", 1) if mesh is not None else 1
            stack = make_lora_stack(list(loras.values()), cfg, tp=tp_)
            params = dataclasses.replace(params, lora=stack)
            for j, name in enumerate(loras):
                self.lora_names[name] = j + 1
        self.max_slots = max_slots
        self.max_seq = max_seq
        # per-fused-block admission budget (None = drain fully)
        self.block_admit_chunks = block_admit_chunks
        self.eos_id = eos_id
        self.paged = paged
        if page_size is None:
            # Hardware sweep 2026-08-18 (tpu_attn_compare.py, 8B slice,
            # B=32/S=4096): the paged flash kernel runs one PAGE per grid
            # program, so per-program overhead dominates small pages —
            # page 128 → 3.37 ms/step, 256 → 3.17, 512 → 1.99 (parity
            # with the contiguous flash kernel). Default to 512, clamped
            # to max_seq's divisors for short-context engines; the cost
            # is coarser prefix-cache sharing + ≤page-1 tokens of KV
            # slack per slot (~1 MB at 8B geometry — noise vs capacity).
            page_size = next(g for g in (512, 256, 128, 64, 32, max_seq)
                             if max_seq % g == 0)
        self.page_size = page_size
        self.prefix_cache = prefix_cache
        _data_groups0 = mesh.shape.get("data", 1) if mesh is not None else 1
        _sp0 = mesh.shape.get("seq", 1) if mesh is not None else 1
        _pipe0 = mesh.shape.get("pipe", 1) if mesh is not None else 1
        if prefix_cache:
            # Prompt-prefix page sharing (vLLM-style automatic prefix
            # caching, re-designed for the paged pool): full page-aligned
            # prompt blocks are content-addressed by a chained digest;
            # admission reuses matching pages (skipping their prefill
            # compute entirely) and prefills only the suffix DIRECTLY into
            # pool pages, attending to the shared prefix via the page
            # table. Freed pages whose blocks remain cached become
            # evictable (LRU) rather than free.
            #
            # Meshes: page ids are SHARD-LOCAL and each (data, seq)
            # shard owns a private pool, so all prefix state is PER
            # (data group, seq shard) — a block cached by pool p can
            # only be reused through pool p (the KV bytes live in that
            # shard's pool; under seq a block's table COLUMN pins its
            # seq shard, and the chained digest pins the column).
            if not paged:
                raise ValueError("prefix_cache requires paged=True")
            if mesh is not None and mesh.shape.get("pipe", 1) > 1:
                raise ValueError(
                    "prefix_cache composes with (data, model) meshes; "
                    "pipe>1 is not supported")
            ng = _data_groups0 * _sp0
            self._prefix_map: list[dict] = [{} for _ in range(ng)]
            self._page_key: list[dict] = [{} for _ in range(ng)]
            self._evictable: list[dict] = [{} for _ in range(ng)]
            self._page_ref: list[dict] = [{} for _ in range(ng)]
            self._prefix_hit_tokens = 0
        self.slots: list[Request | None] = [None] * max_slots
        self.last_tokens = np.zeros((max_slots,), np.int32)
        self.pending: list[Request] = []
        # in-flight admission: [req, slot, chunks_done_offset, last_logits]
        self._prefilling: list | None = None
        # Requests that finish DURING admission (max_new=1 / immediate EOS)
        # are staged here so step()/step_block() still report them.
        self._admit_finished: list[Request] = []
        # per-slot PRNG key data [B, 2] uint32 (threefry): every sampled
        # draw splits the SLOT's key on device, so a request's stream
        # depends only on its own seed/steps — never on co-batching
        self.slot_keys = jnp.zeros((max_slots, 2), jnp.uint32)
        # per-slot token-history counts (prompt + committed output) for
        # repetition/frequency/presence penalties; maintained exactly for
        # penalized slots (zeroed + rebuilt at admission), updated by a
        # cheap scatter-add in every decode program
        self.counts = jnp.zeros((max_slots, cfg.vocab_size), jnp.int32)
        self._steps = 0
        self._tok_ema = 0.0
        self._last_t = time.perf_counter()
        # Grammar-constrained decoding (engine/grammar.py): registered
        # TokenFSMs live on device in COMPRESSED form (VERDICT r3 #5) —
        # a [F, S, V/32] uint32 legality-bitmask stack + the [F, S, 256]
        # byte-DFA stack + per-FSM token byte strings; ~30x smaller than
        # the former dense [F, S, V] int32 stack (a 128k-vocab, 2k-state
        # grammar is ~34 MB instead of ~1 GB). Registration grows the
        # stacks IN PLACE (device-side pads + one .at[fid].set upload of
        # the new tables — never a full-stack host re-upload). Id 0 = the
        # trivial all-legal single-state FSM every unconstrained slot
        # points at. Per-slot id/state live on host (tiny [B] uploads per
        # dispatch); the decode programs expand bits[id, state] to mask
        # logits and byte-walk sampled tokens to advance states in-jit.
        vw = -(-cfg.vocab_size // 32)
        self._fsm_bits = jnp.full((1, 1, vw), 0xFFFFFFFF, jnp.uint32)
        self._fsm_bt = jnp.zeros((1, 1, 256), jnp.int32)   # self-loop
        self._fsm_tokb = jnp.zeros((1, cfg.vocab_size, 1), jnp.uint8)
        self._fsm_tokl = jnp.zeros((1, cfg.vocab_size), jnp.int32)
        self._fsm_key: dict[int, int] = {}
        self._fsm_objs: list = [None]  # index 0 = trivial FSM
        self._fsm_retraces = 0  # mid-serving registrations that grew
        # the table shapes (each one retraces the decode programs)
        self._fsm_ids = np.zeros((max_slots,), np.int32)
        self._fsm_state = np.zeros((max_slots,), np.int32)
        # per-slot LoRA adapter ids (0 = base) for the decode programs
        self._adapter_slot = np.zeros((max_slots,), np.int32)
        # rolling latency reservoirs (last 512 finished requests) for the
        # TTFT / TPOT percentiles in ``stats`` and /metrics
        from collections import deque
        self._ttfts: deque = deque(maxlen=512)
        self._tpots: deque = deque(maxlen=512)

        data_groups = mesh.shape.get("data", 1) if mesh is not None else 1
        self._data_groups = data_groups
        self._sp_pools = _sp0
        if paged:
            # Paged KV pool (VERDICT r1 #4): HBM bounded by allocated
            # pages. Page 0 is RESERVED scratch — freed slots park their
            # table rows there and lengths at 0, so stale decode writes
            # can never corrupt reallocated pages.
            #
            # With a mesh, each (``data``, ``seq``) shard owns a PRIVATE
            # local pool of ``n_pages`` pages (pool dim shards over
            # data x seq, kv-heads over model); page-table rows are
            # slot-major over data, COLUMNS segment-major over seq
            # (column j = global S pages [j*page, (j+1)*page), owned by
            # seq shard j // ppseg), and entries hold SHARD-LOCAL ids —
            # the allocator keeps one free list per (data group, seq
            # shard) and the device programs never translate indices.
            # Under pipeline parallelism each (pipe, data) shard
            # additionally holds only its layer slice of the pool.
            if max_seq % page_size:
                raise ValueError(f"max_seq {max_seq} must divide by "
                                 f"page_size {page_size}")
            if max_slots % data_groups:
                raise ValueError(f"max_slots {max_slots} must divide by "
                                 f"data axis {data_groups}")
            if (max_seq // page_size) % _sp0:
                raise ValueError(
                    f"seq axis {_sp0} must divide the page count "
                    f"{max_seq // page_size} (max_seq/page_size)")
            self._ppseg = (max_seq // page_size) // _sp0
            if n_pages is None:
                n_pages = 1 + (max_slots // data_groups) * self._ppseg
            self.n_pages = n_pages  # per (data, seq) shard
            self._free_pages = [list(range(n_pages - 1, 0, -1))
                                for _ in range(data_groups * _sp0)]
            self._page_tbl = np.zeros(
                (max_slots, max_seq // page_size), np.int32)
            self._n_alloc = np.zeros((max_slots,), np.int64)
            self._admit_seq = np.zeros((max_slots,), np.int64)
            self._admit_counter = 0
            self._release_pending: list[int] = []
            self._tbl_dirty = False
            cache0 = llama.init_paged_cache(
                cfg, max_slots, max_seq, n_pages * data_groups * _sp0,
                page_size, pipe=_pipe0)
        else:
            cache0 = llama.init_cache(cfg, max_slots, max_seq,
                                      pipe=_pipe0)
        pf0 = llama.init_cache(cfg, 1, max_seq, pipe=_pipe0)

        if mesh is not None:
            from quant_tpu.parallel import pp as pp_mod
            from quant_tpu.parallel import tp as tp_mod

            sp = mesh.shape.get("seq", 1)
            if cfg.is_mla or cfg.first_k_dense:
                # MLA / first_k_dense long prompts always take the
                # chunked seq-axis prefill: ring/Ulysses sp_prefill
                # handles neither the absorbed latent nor the two-stack
                # scan (and the MLA latent cache is 3.6x smaller per
                # token, moving the SP break-even far higher)
                sp_prefill_mode = None
            if sp > 1:
                # Long-context serving (VERDICT r3 #3): the decode cache's
                # S dim shards over ``seq`` (cache_specs), decode uses the
                # LSE-merge KV-sharded attention and chunked prefill the
                # T>1 seq_axis path (chunk KV writes scatter with drop
                # semantics, so shard straddling is safe). Prompts past
                # ``sp_prefill_threshold`` additionally run their body
                # through the q-sharded ring/Ulysses prefill
                # (parallel.sp.sp_prefill_forward) — compute shards over
                # seq, not just KV bytes. Speculation composes: the
                # verify program's T=gamma+1 forward rides the same
                # seq_axis machinery as chunked prefill (equality-tested
                # for n-gram and draft-model proposers).
                if max_seq % sp:
                    raise ValueError(
                        f"seq axis {sp} must divide max_seq {max_seq}")
            self._sp = sp
            self.sp_prefill_mode = sp_prefill_mode
            self.sp_prefill_threshold = (
                2 * self.PREFILL_CHUNK if sp_prefill_threshold is None
                else sp_prefill_threshold)
            self.sp_quantum = sp_quantum
            pipe = mesh.shape.get("pipe", 1)
            if max_slots % mesh.shape["data"]:
                raise ValueError(
                    f"max_slots {max_slots} must divide data axis "
                    f"{mesh.shape['data']}")
            if pipe > 1:
                if paged and sp > 1:
                    raise ValueError(
                        "paged x seq x pipe>1 is not implemented (pp "
                        "paged pools page the full S per slot); drop "
                        "one of paged/seq with pipeline stages")
                params = pp_mod.shard_params_pp(params, mesh)
                self.cache = pp_mod.shard_cache_pp(cache0, mesh)
                pf_specs = pp_mod.pp_cache_specs(pf0, batch_axis=None)
                fwd_full = pp_mod.pp_forward_fn(
                    cfg, mesh, params, cache0, n_micro=pp_micro)
                fwd_one = pp_mod.pp_forward_fn(
                    cfg, mesh, params, pf0, n_micro=1, batch_axis=None)
                full_specs = pp_mod.pp_cache_specs(cache0)
            else:
                params = tp_mod.shard_params(params, mesh)
                self.cache = tp_mod.shard_cache(cache0, mesh)
                pf_specs = tp_mod.cache_specs(pf0, batch_axis=None)
                fwd_full = tp_mod.sharded_forward_fn(
                    cfg, mesh, params, cache0)
                fwd_one = tp_mod.sharded_forward_fn(
                    cfg, mesh, params, pf0, batch_axis=None)
                full_specs = tp_mod.cache_specs(cache0)
            self.pf_cache = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                pf0, pf_specs)
            if paged:
                insert_inner = jax.shard_map(
                    self._insert_paged_local,
                    mesh=mesh,
                    # ids columns shard over seq (each seq shard scatters
                    # its own segment's blocks into its local pool)
                    in_specs=(full_specs, pf_specs, P(), P("seq")),
                    out_specs=full_specs,
                    check_vma=False,
                )
            else:
                insert_inner = jax.shard_map(
                    self._insert_local,
                    mesh=mesh,
                    in_specs=(full_specs, pf_specs, P()),
                    out_specs=full_specs,
                    check_vma=False,
                )
        else:
            self._sp = 1
            self.cache = cache0
            self.pf_cache = pf0
            fwd_full = fwd_one = functools.partial(llama.forward, cfg=cfg)
            insert_inner = (self._insert_paged if paged
                            else self._insert_single)
        self.params = params

        @functools.partial(jax.jit, donate_argnums=(2, 13),
                           static_argnames=("use_pen", "use_bias",
                                            "use_fsm", "topk_lp"))
        def decode_step(params, tokens, cache, slot_keys, temps,
                        topks, topps, minps, reps, freqs, press,
                        bias_toks, bias_vals, counts, fsm_tabs=None,
                        fsm_ids=None, fsm_states=None, adapter_ids=None,
                        use_pen=False, use_bias=False, use_fsm=False,
                        topk_lp=0):
            # sampling happens ON DEVICE (sample_batch, per-slot traced
            # knobs): one dispatch and one [B, 2]-int fetch per step —
            # the host never touches logits, and no per-config extra RPC
            # (each costs 40-80 ms on this relay). Column 1 is the
            # committed token's raw-model logprob, bitcast to int32 so
            # token + logprob ride one packed fetch. ``counts`` [B, V]
            # token-history counts ride along donated; the committed
            # token is scatter-added every step (cheap), the penalty
            # math itself only when use_pen (static).
            logits, cache = fwd_full(params, tokens, cache,
                                     adapter_ids=adapter_ids)
            ks = jax.vmap(jax.random.split)(
                jax.random.wrap_key_data(slot_keys))
            keyn = jax.random.key_data(ks[:, 0])
            pen = (counts, reps, freqs, press) if use_pen else None
            bias = (bias_toks, bias_vals) if use_bias else None
            rows = (_fsm_mask_rows(fsm_tabs[0], fsm_ids, fsm_states,
                                   cfg.vocab_size) if use_fsm else None)
            toks = sample_batch(logits[:, -1], ks[:, 1], temps, topks,
                                topps, minps, pen, bias, fsm_rows=rows)
            counts = counts.at[jnp.arange(toks.shape[0]), toks].add(1)
            lp = token_logprob(logits[:, -1], toks)
            cols = [toks[:, None],
                    jax.lax.bitcast_convert_type(lp, jnp.int32)[:, None]]
            if topk_lp:
                # OpenAI top-logprobs: top-K of the RAW model
                # distribution, riding the same packed fetch
                ti, tl = _top_logprobs(logits[:, -1], topk_lp)
                cols += [ti, jax.lax.bitcast_convert_type(tl, jnp.int32)]
            packed = jnp.concatenate(cols, axis=1)
            return packed, cache, keyn, counts

        self._decode = decode_step

        @functools.partial(jax.jit,
                           static_argnames=("n", "sampled", "use_pen",
                                            "use_bias", "use_fsm",
                                            "topk_lp"),
                           donate_argnums=(2, 13))
        def decode_block(params, tokens, cache, slot_keys, temps,
                         topks, topps, minps, reps, freqs, press,
                         bias_toks, bias_vals, counts, fsm_tabs=None,
                         fsm_ids=None, fsm_states=None, adapter_ids=None,
                         n=1, sampled=False, use_pen=False,
                         use_bias=False, use_fsm=False, topk_lp=0):
            # n decode steps fused in one dispatch (device-side loop) with
            # on-device per-slot sampling — amortizes host dispatch latency
            # (critical on high-latency links); used by step_block().
            # counts carried through the loop → penalties see each
            # committed token immediately (exact sequential semantics).
            # FSM states thread through the loop the same way (the whole
            # point of the device-resident grammar tables: n constrained
            # steps per host round-trip).
            if fsm_states is None:
                fsm_states = jnp.zeros((tokens.shape[0],), jnp.int32)

            def body(_, carry):
                tok, cache, kd, counts, fstate, out, lps, tis, tls, i = \
                    carry
                logits, cache = fwd_full(params, tok, cache,
                                         adapter_ids=adapter_ids)
                ks = jax.vmap(jax.random.split)(
                    jax.random.wrap_key_data(kd))
                kd = jax.random.key_data(ks[:, 0])
                lg = logits[:, -1]
                rows = (_fsm_mask_rows(fsm_tabs[0], fsm_ids, fstate,
                                       cfg.vocab_size)
                        if use_fsm else None)
                if sampled:
                    pen = ((counts, reps, freqs, press) if use_pen
                           else None)
                    bias = ((bias_toks, bias_vals) if use_bias
                            else None)
                    nxt = sample_batch(lg, ks[:, 1], temps, topks,
                                       topps, minps, pen, bias,
                                       fsm_rows=rows)[:, None]
                else:
                    nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)[:, None]
                counts = counts.at[
                    jnp.arange(nxt.shape[0]), nxt[:, 0]].add(1)
                if use_fsm:
                    # masked sampling guarantees a legal transition;
                    # byte-walk the sampled token to the next state
                    fstate = _fsm_walk(fsm_tabs[1], fsm_tabs[2],
                                       fsm_tabs[3], fsm_ids, fstate,
                                       nxt[:, 0], eos_id)
                lp = token_logprob(lg, nxt[:, 0])[:, None]
                out = jax.lax.dynamic_update_slice(out, nxt, (0, i))
                lps = jax.lax.dynamic_update_slice(lps, lp, (0, i))
                if topk_lp:
                    ti, tl = _top_logprobs(lg, topk_lp)
                    tis = jax.lax.dynamic_update_slice(
                        tis, ti[:, None], (0, i, 0))
                    tls = jax.lax.dynamic_update_slice(
                        tls, tl[:, None], (0, i, 0))
                return (nxt, cache, kd, counts, fstate, out, lps, tis,
                        tls, i + 1)
            b0 = tokens.shape[0]
            out = jnp.zeros((b0, n), jnp.int32)
            lps = jnp.zeros((b0, n), jnp.float32)
            tis = jnp.zeros((b0, n, max(topk_lp, 1)), jnp.int32)
            tls = jnp.zeros((b0, n, max(topk_lp, 1)), jnp.float32)
            (_, cache, keyn, counts, _, out, lps, tis, tls, _) = \
                jax.lax.fori_loop(
                    0, n, body,
                    (tokens, cache, slot_keys, counts, fsm_states, out,
                     lps, tis, tls, 0))
            # [B, 2n(+2nK)]: tokens, bitcast logprobs(, top ids, top
            # bitcast logprobs) — one packed fetch
            cols = [out, jax.lax.bitcast_convert_type(lps, jnp.int32)]
            if topk_lp:
                cols += [tis.reshape(b0, n * topk_lp),
                         jax.lax.bitcast_convert_type(
                             tls, jnp.int32).reshape(b0, n * topk_lp)]
            packed = jnp.concatenate(cols, axis=1)
            return packed, cache, keyn, counts

        self._decode_block = decode_block

        # Speculative decoding (greedy acceptance; see engine/spec.py).
        # One VERIFY dispatch advances every slot by 1..gamma+1 tokens:
        # a (gamma+1)-token forward reuses the model's T>1 insert path, so
        # it composes with meshes and the paged pool unchanged. Greedy
        # chain acceptance keeps the output bit-identical to plain greedy.
        self.spec_gamma = spec_gamma
        self._stateful_proposer = False
        self._spec_proposed = 0
        self._spec_accepted = 0
        self._spec_committed = 0
        self._spec_slot_steps = 0
        self._spec_dispatches = 0
        if spec_gamma:
            from quant_tpu.engine.spec import NgramProposer

            self.proposer = spec_proposer or NgramProposer(spec_gamma)
            # stateful (draft-model) proposers keep per-slot KV that must
            # track every committed token — see spec.DraftModelProposer
            self._stateful_proposer = hasattr(self.proposer, "draft_batch")
            if self._stateful_proposer and self.proposer.gamma < spec_gamma:
                raise ValueError(
                    f"proposer gamma {self.proposer.gamma} < engine "
                    f"spec_gamma {spec_gamma}")

            @functools.partial(jax.jit, donate_argnums=(2, 13),
                               static_argnames=("sampled", "use_pen",
                                                "use_bias", "use_fsm",
                                                "topk_lp"))
            def verify_step(params, tokens, cache, slot_keys, temps,
                            topks, topps, minps, reps, freqs, press,
                            bias_toks, bias_vals, counts,
                            fsm_tabs=None, fsm_ids=None, fsm_states=None,
                            adapter_ids=None, q_probs=None, sampled=True,
                            use_pen=False, use_bias=False, use_fsm=False,
                            topk_lp=0):
                base = cache.lengths
                logits, cache = fwd_full(params, tokens, cache,
                                         adapter_ids=adapter_ids)
                ks = jax.vmap(jax.random.split)(
                    jax.random.wrap_key_data(slot_keys))
                keyn = jax.random.key_data(ks[:, 0])
                rows = None
                if use_fsm:
                    # FSM x speculation (r5, VERDICT r4 #8): position j's
                    # legality row uses the state AFTER byte-walking the
                    # draft prefix tokens[:, 1..j] (tokens[:, 0] is the
                    # last committed token — its transition already
                    # happened at commit). Masking the target with these
                    # rows makes p(illegal)=0, so the first illegal
                    # draft rejects with probability 1 and the commit
                    # token is always legal — guided output is identical
                    # to guided plain decode. gamma is small and static:
                    # an unrolled walk keeps this a handful of gathers.
                    st = fsm_states
                    rows_l = [_fsm_mask_rows(fsm_tabs[0], fsm_ids, st,
                                             cfg.vocab_size)]
                    for j in range(1, tokens.shape[1]):
                        st = _fsm_walk(fsm_tabs[1], fsm_tabs[2],
                                       fsm_tabs[3], fsm_ids, st,
                                       tokens[:, j], eos_id)
                        rows_l.append(_fsm_mask_rows(
                            fsm_tabs[0], fsm_ids, st, cfg.vocab_size))
                    rows = jnp.stack(rows_l, axis=1)   # [B, g+1, V]
                if sampled:
                    # On-device speculative rejection sampling against
                    # the delta proposal (sampler.spec_commit): greedy
                    # slots reduce to the argmax-prefix rule, sampled
                    # slots commit exact target-chain samples — one
                    # program serves mixed batches, so sampled requests
                    # never force the plain-decode fallback. Penalized
                    # batches always take this path (use_pen → the host
                    # passes sampled=True): spec_commit builds the exact
                    # within-window cumulative counts.
                    pen = ((counts, reps, freqs, press) if use_pen
                           else None)
                    bias = ((bias_toks, bias_vals) if use_bias
                            else None)
                    out, acc = spec_commit(logits, tokens, ks[:, 1],
                                           temps, topks, topps, minps,
                                           pen, bias, q_probs=q_probs,
                                           fsm_rows=rows)
                else:
                    # all-greedy batch: pure argmax chain, no
                    # vocab-sized sort/filter work on device
                    lg = logits
                    if use_fsm:
                        lg = jnp.where(rows < 0, -jnp.inf,
                                       lg.astype(jnp.float32))
                    tgt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                    match = (tokens[:, 1:] == tgt[:, :-1]).astype(
                        jnp.int32)
                    acc = jnp.cumprod(match, axis=1).sum(axis=1)
                    out = tgt
                # forward advanced lengths by gamma+1; commit only the
                # accepted prefix + commit token (stale tail entries are
                # masked by lengths and overwritten by later writes)
                cache = dataclasses.replace(cache, lengths=base + acc + 1)
                # count the committed tokens (accepted prefix + commit):
                # positions > acc are garbage and masked to +0
                b, gp1 = out.shape
                pos = jax.lax.broadcasted_iota(jnp.int32, (b, gp1), 1)
                counts = counts.at[
                    jnp.arange(b)[:, None], out].add(
                        (pos <= acc[:, None]).astype(jnp.int32))
                # ONE packed host fetch ([B, 2*(gamma+1)(+2K') + 1]:
                # tokens, bitcast logprobs, optional top-K ids+logprobs
                # per position, acc LAST): on high-latency links (this
                # relay: 40-80 ms/RPC) a second device->host read per
                # step would cost more than speculation saves
                lp = token_logprob(logits, out)
                b_, gp1_ = out.shape
                cols = [out, jax.lax.bitcast_convert_type(lp, jnp.int32)]
                if topk_lp:
                    ti, tl = _top_logprobs(logits, topk_lp)
                    cols += [ti.reshape(b_, gp1_ * topk_lp),
                             jax.lax.bitcast_convert_type(
                                 tl, jnp.int32).reshape(
                                     b_, gp1_ * topk_lp)]
                return jnp.concatenate(
                    cols + [acc[:, None]], axis=1), cache, counts, keyn

            self._verify = verify_step

        self._insert = jax.jit(insert_inner, donate_argnums=(0,))
        # per-bucket prefill jits
        self._prefills: dict[int, Any] = {}
        self._fwd_one = fwd_one

    # ── device programs ─────────────────────────────────────────────

    @staticmethod
    def _insert_single(cache, sub, slot):
        """Copy the single-slot prefill cache into decode-cache slot."""
        put = lambda f, s: jax.lax.dynamic_update_slice_in_dim(
            f, s, slot, axis=1)
        return llama.KVCache(
            k_codes=put(cache.k_codes, sub.k_codes),
            k_scale=put(cache.k_scale, sub.k_scale),
            v_codes=put(cache.v_codes, sub.v_codes),
            v_scale=put(cache.v_scale, sub.v_scale),
            lengths=jax.lax.dynamic_update_slice(
                cache.lengths, sub.lengths, (slot,)),
        )

    @staticmethod
    def _paged_scatter(cache, sub, page_ids):
        """Scatter the contiguous single-slot prefill cache into POOL
        pages: the prefill S axis reshapes into [n_pages, page] blocks
        written at ``page_ids`` (out-of-pool sentinel ids drop — pages
        beyond the prompt stay untouched/free). Returns the four pools."""
        page = cache.page_size

        def blocks(a, codes):
            # [L, 1, H, S(, D)] → [L, S/page, H, page(, D)]
            a = a[:, 0]
            l, h, s = a.shape[:3]
            if codes:
                a = a.reshape(l, h, s // page, page, -1)
                return a.transpose(0, 2, 1, 3, 4)
            a = a.reshape(l, h, s // page, page)
            return a.transpose(0, 2, 1, 3)

        def put(pool, a, codes):
            return pool.at[:, page_ids].set(
                blocks(a, codes), mode="drop", unique_indices=True)

        return (put(cache.k_codes, sub.k_codes, True),
                put(cache.k_scale, sub.k_scale, False),
                put(cache.v_codes, sub.v_codes, True),
                put(cache.v_scale, sub.v_scale, False))

    @staticmethod
    def _insert_paged(cache, sub, slot, page_ids):
        kc, ks, vc, vs = Engine._paged_scatter(cache, sub, page_ids)
        return llama.PagedKVCache(
            k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
            page_tbl=cache.page_tbl,
            lengths=jax.lax.dynamic_update_slice(
                cache.lengths, sub.lengths, (slot,)),
        )

    @staticmethod
    def _insert_paged_local(cache, sub, slot, page_ids):
        """Paged insert under shard_map: pool + table rows are sharded
        over ``data`` (shard-local page ids); ``sub`` replicates. Only the
        shard owning ``slot`` commits — other shards remap every id to a
        distinct out-of-pool sentinel so the scatter drops all writes."""
        b_loc = cache.page_tbl.shape[0]
        di = jax.lax.axis_index("data")
        rel = slot - di * b_loc
        owned = (rel >= 0) & (rel < b_loc)
        lp = jnp.clip(rel, 0, b_loc - 1)
        n_loc = cache.k_codes.shape[1]
        sent = n_loc + jnp.arange(page_ids.shape[0],
                                  dtype=page_ids.dtype)
        kc, ks, vc, vs = Engine._paged_scatter(
            cache, sub, jnp.where(owned, page_ids, sent))
        cur_len = jax.lax.dynamic_slice_in_dim(cache.lengths, lp, 1)
        return llama.PagedKVCache(
            k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
            page_tbl=cache.page_tbl,
            lengths=jax.lax.dynamic_update_slice(
                cache.lengths, jnp.where(owned, sub.lengths, cur_len),
                (lp,)),
        )

    @staticmethod
    def _insert_local(cache, sub, slot):
        """Per-shard insert under shard_map: the decode cache's batch is
        sharded over ``data`` while ``sub`` replicates — only the shard
        owning ``slot`` commits the write (clamped RMW, no collectives)."""
        b_loc = cache.k_codes.shape[1]
        di = jax.lax.axis_index("data")
        rel = slot - di * b_loc
        owned = (rel >= 0) & (rel < b_loc)
        lp = jnp.clip(rel, 0, b_loc - 1)

        def put(f, s):
            cur = jax.lax.dynamic_slice_in_dim(f, lp, 1, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(
                f, jnp.where(owned, s, cur), lp, axis=1)

        cur_len = jax.lax.dynamic_slice_in_dim(cache.lengths, lp, 1)
        return llama.KVCache(
            k_codes=put(cache.k_codes, sub.k_codes),
            k_scale=put(cache.k_scale, sub.k_scale),
            v_codes=put(cache.v_codes, sub.v_codes),
            v_scale=put(cache.v_scale, sub.v_scale),
            lengths=jax.lax.dynamic_update_slice(
                cache.lengths, jnp.where(owned, sub.lengths, cur_len),
                (lp,)),
        )

    def _prefix_prefill_fn(self, t_pad: int):
        """Suffix prefill DIRECTLY into pool pages (prefix-cache mode): a
        batch-1 PagedKVCache view shares the pool buffers and the slot's
        table row, so the chunk attends to reused prefix pages through the
        page table and its KV writes land in the slot's own pages — no
        separate insert program. Pools are donated and threaded back.

        Meshes: runs under shard_map with the pool sharded over ``data``
        (kv-heads over ``model``). Every data shard executes the same
        compute, but non-owners get a zeroed table row, so they read/write
        only the RESERVED scratch page 0 of their own pool; the owner's
        last-token logits are selected with a masked psum."""
        key = ("px", t_pad)
        if key in self._prefills:
            return self._prefills[key]
        fwd_one = self._fwd_one

        if self.mesh is None:
            @functools.partial(jax.jit, donate_argnums=(2,))
            def prefill(params, tokens, pools, tbl_row, start, true_len,
                        slot, aid):
                del slot
                kc, ks, vc, vs = pools
                view = llama.PagedKVCache(
                    k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
                    page_tbl=tbl_row[None], lengths=start[None])
                logits, view = fwd_one(params, tokens, view,
                                       adapter_ids=aid)
                last = jax.lax.dynamic_index_in_dim(
                    logits[0], true_len - 1, 0, False)
                return last, (view.k_codes, view.k_scale,
                              view.v_codes, view.v_scale)
        else:
            from quant_tpu.parallel import tp as tp_mod

            cfg = self.cfg
            mesh = self.mesh
            p_specs = tp_mod.param_specs(self.params)
            codes_spec = P(None, ("data", "seq"), "model", None, None)
            scale_spec = P(None, ("data", "seq"), "model", None)
            pool_specs = (codes_spec, scale_spec, codes_spec, scale_spec)
            slots_per = self.max_slots // self._data_groups
            fwd = functools.partial(
                llama.forward, cfg=cfg, axis="model",
                seq_axis="seq" if self._sp > 1 else None)

            def inner(params, tokens, pools, tbl_row, start, true_len,
                      slot, aid):
                kc, ks, vc, vs = pools
                di = jax.lax.axis_index("data")
                owned = (slot // slots_per) == di
                # non-owners get DISTINCT out-of-pool sentinels: their KV
                # writes drop (scatter mode="drop"; zeros would collide
                # under unique_indices) and their gathers clamp to garbage
                # that only feeds the masked-out logits
                n_loc = kc.shape[1]
                sent = n_loc + jnp.arange(tbl_row.shape[0],
                                          dtype=tbl_row.dtype)
                tbl = jnp.where(owned, tbl_row, sent)
                view = llama.PagedKVCache(
                    k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
                    page_tbl=tbl[None], lengths=start[None])
                logits, view = fwd(params, tokens, view,
                                   adapter_ids=aid)
                last = jax.lax.dynamic_index_in_dim(
                    logits[0], true_len - 1, 0, False)
                last = jax.lax.psum(
                    jnp.where(owned, last, jnp.zeros_like(last)), "data")
                return last, (view.k_codes, view.k_scale,
                              view.v_codes, view.v_scale)

            sm = jax.shard_map(
                inner, mesh=mesh,
                # tbl_row columns shard over seq (segment-major layout)
                in_specs=(p_specs, P(None, None), pool_specs, P("seq"),
                          P(), P(), P(), P()),
                out_specs=(P(), pool_specs),
                check_vma=False,
            )
            prefill = jax.jit(sm, donate_argnums=(2,))

        self._prefills[key] = prefill
        return prefill

    def _prefill_fn(self, t_pad: int):
        if t_pad in self._prefills:
            return self._prefills[t_pad]
        fwd_one = self._fwd_one

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill(params, tokens, pfc, true_len, aid):
            start = pfc.lengths
            logits, pfc = fwd_one(params, tokens, pfc, adapter_ids=aid)
            # forward advanced lengths by the PADDED chunk; rewind to the
            # true length (pad rows sit beyond it, masked / overwritten by
            # the next chunk).
            pfc = dataclasses.replace(pfc, lengths=start + true_len)
            last = jax.lax.dynamic_index_in_dim(
                logits[0], true_len - 1, 0, False)
            return last, pfc

        self._prefills[t_pad] = prefill
        return prefill

    def _sp_prefill_fn(self, t_loc: int):
        """q-sharded ring/Ulysses prefill over the batch-1 pf cache
        (seq>1 meshes): tokens [1, sp * t_loc] shard over ``seq``, every
        rank computes 1/sp of the prompt body and the int8 KV ring-inserts
        into each rank's cache S-shard. Returns (last-token logits [V],
        pf_cache). Composes with TP; data shards replicate the compute
        (batch-1 admission, same as the chunked path)."""
        key = ("sp", t_loc)
        if key in self._prefills:
            return self._prefills[key]
        from quant_tpu.parallel import sp as sp_mod
        from quant_tpu.parallel import tp as tp_mod

        cfg = self.cfg
        mesh = self.mesh
        tp_ = mesh.shape.get("model", 1)
        p_specs = tp_mod.param_specs(self.params)
        c_specs = tp_mod.cache_specs(self.pf_cache, batch_axis=None)
        fwd = functools.partial(
            sp_mod.sp_prefill_forward, cfg=cfg, seq_axis="seq",
            mode=self.sp_prefill_mode,
            axis="model" if tp_ > 1 else None, last_only=True)
        sm = jax.shard_map(
            lambda pr, tok, ca: fwd(pr, tok, ca),
            mesh=mesh,
            in_specs=(p_specs, P(None, "seq"), c_specs),
            out_specs=(P(None, None, None), c_specs),
            check_vma=False,
        )

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill(params, tokens, pfc):
            logits, pfc = sm(params, tokens, pfc)
            return logits[0, -1], pfc

        self._prefills[key] = prefill
        return prefill

    def _embed_fn(self, t_pad: int):
        key = ("emb", t_pad)
        if key in self._prefills:
            return self._prefills[key]
        cfg = self.cfg
        if self.mesh is None:
            fwd = functools.partial(llama.forward, cfg=cfg,
                                    return_hidden=True)
        else:
            from quant_tpu.parallel import tp as tp_mod

            if self.mesh.shape.get("pipe", 1) > 1:
                raise ValueError("embeddings are not supported with "
                                 "pipe > 1")
            ep = self.mesh.shape.get("expert", 1)
            p_specs = tp_mod.param_specs(self.params)
            c_specs = tp_mod.cache_specs(
                llama.init_cache(cfg, 1, t_pad), batch_axis=None)
            fwd = jax.shard_map(
                functools.partial(
                    llama.forward, cfg=cfg, axis="model",
                    expert_axis="expert" if ep > 1 else None,
                    return_hidden=True),
                mesh=self.mesh,
                in_specs=(p_specs, P(None, None), c_specs),
                out_specs=(P(None, None, None), c_specs),
                check_vma=False,
            )

        @jax.jit
        def emb(params, toks, cache, n):
            h, _ = fwd(params, toks, cache)          # [1, t_pad, D]
            mask = (jnp.arange(toks.shape[1]) < n)[None, :, None]
            v = jnp.sum(h * mask, axis=1) / jnp.maximum(
                n.astype(jnp.float32), 1.0)
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
            return v[0]

        self._prefills[key] = emb
        return emb

    def embed(self, prompt_ids) -> np.ndarray:
        """[D] L2-normalized mean-pooled final-norm hidden state of the
        prompt (the /v1/embeddings payload). Uses a throwaway cache —
        engine slots/KV state are untouched."""
        n = len(prompt_ids)
        if not 0 < n <= self.max_seq:
            raise ValueError(f"embedding input length {n} outside "
                             f"(0, {self.max_seq}]")
        t_pad = _bucket(n)
        toks = np.zeros((1, t_pad), np.int32)
        toks[0, :n] = prompt_ids
        cache = llama.init_cache(self.cfg, 1, t_pad)
        if self.mesh is not None:
            from quant_tpu.parallel import tp as tp_mod

            specs = tp_mod.cache_specs(cache, batch_axis=None)
            cache = jax.tree.map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(self.mesh, s)), cache, specs)
        vec = self._embed_fn(t_pad)(
            self.params, jnp.asarray(toks), cache, jnp.int32(n))
        return np.asarray(vec, np.float32)

    # ── paged allocator (free list over the page pool) ───────────────

    def _pages_for(self, n_tokens: int) -> int:
        return -(-n_tokens // self.page_size)

    def _group(self, slot: int) -> int:
        """Data group owning a slot (slot-major sharding over ``data``)."""
        return slot // (self.max_slots // self._data_groups)

    def _pool_of(self, slot: int, col: int) -> int:
        """Free-list / prefix-state index of the (data group, seq shard)
        pool owning table column ``col`` of ``slot`` (r5 paged x seq:
        column j pages global S range [j*page, (j+1)*page), which lives
        in seq shard j // ppseg)."""
        sp = self._sp_pools
        return self._group(slot) * sp + (col // self._ppseg if sp > 1
                                         else 0)

    def _block_keys(self, stream: list[int]) -> list[bytes]:
        """Chained content digests of the stream's FULL page-aligned
        blocks: key_j = H(key_{j-1} || tokens of block j), so a match at
        block j implies the entire prefix matches (and the KV it produced,
        positions being absolute under RoPE)."""
        import hashlib

        page = self.page_size
        keys, h = [], b""
        for j in range(len(stream) // page):
            blk = np.asarray(stream[j * page:(j + 1) * page], np.int32)
            h = hashlib.blake2b(h + blk.tobytes(), digest_size=16).digest()
            keys.append(h)
        return keys

    def _match_prefix(self, slot: int, stream: list[int]) -> int:
        """Point the slot's leading table entries at cached pages matching
        the stream's longest full-block prefix; returns the token count
        covered (prefill resumes there). At least one token is always left
        to prefill — its logits seed sampling."""
        page = self.page_size
        max_k = (len(stream) - 1) // page
        k = 0
        for j, key in enumerate(self._block_keys(stream)[:max_k]):
            g = self._pool_of(slot, j)
            pg = self._prefix_map[g].get(key)
            if pg is None:
                break
            if self._page_ref[g].get(pg, 0) == 0:
                self._evictable[g].pop(pg, None)  # re-referenced
                self._page_ref[g][pg] = 1
            else:
                self._page_ref[g][pg] += 1
            self._page_tbl[slot, j] = pg
            self._tbl_dirty = True
            k = j + 1
        self._n_alloc[slot] = k
        self._prefix_hit_tokens += k * page
        return k * page

    def _register_prefix(self, slot: int, stream: list[int]) -> None:
        """Publish the slot's filled full blocks into the prefix map (the
        pages now hold exactly those blocks' KV)."""
        for j, key in enumerate(self._block_keys(stream)):
            g = self._pool_of(slot, j)
            if key in self._prefix_map[g]:
                continue
            pg = int(self._page_tbl[slot, j])
            if pg in self._page_key[g]:  # page already published (shared)
                continue
            self._prefix_map[g][key] = pg
            self._page_key[g][pg] = key

    def _alloc_page(self, group: int) -> int | None:
        """A blank page from the (data group, seq shard) pool's free
        list, else (prefix mode) the least-recently-cached evictable
        page — its block leaves the prefix map; else None (caller
        preempts). ``group`` is a ``_pool_of`` index."""
        free = self._free_pages[group]
        if free:
            return free.pop()
        if self.prefix_cache and self._evictable[group]:
            pg = next(iter(self._evictable[group]))
            del self._evictable[group][pg]
            del self._prefix_map[group][self._page_key[group].pop(pg)]
            return pg
        return None

    def _ensure_pages(self, slot: int, upto_len: int) -> bool:
        need = self._pages_for(min(upto_len, self.max_seq))
        while self._n_alloc[slot] < need:
            col = int(self._n_alloc[slot])
            pool = self._pool_of(slot, col)
            pg = self._alloc_page(pool)
            if pg is None:
                return False
            if self.prefix_cache:
                self._page_ref[pool][pg] = 1
            self._page_tbl[slot, col] = pg
            self._n_alloc[slot] += 1
            self._tbl_dirty = True
        return True

    def _free_slot_pages(self, slot: int) -> None:
        for j in range(int(self._n_alloc[slot])):
            g = self._pool_of(slot, j)
            pg = int(self._page_tbl[slot, j])
            if self.prefix_cache:
                self._page_ref[g][pg] -= 1
                if self._page_ref[g][pg] > 0:
                    continue  # still referenced by another slot
                if pg in self._page_key[g]:
                    # block stays cached; page becomes evictable (LRU)
                    self._evictable[g][pg] = None
                    continue
            self._free_pages[g].append(pg)
        self._page_tbl[slot, :] = 0  # reserved scratch page
        self._n_alloc[slot] = 0
        self._release_pending.append(slot)
        self._tbl_dirty = True

    def _sync_paged(self) -> None:
        """Push host-side allocator state to the device cache: freed slots'
        lengths reset to 0 (their writes park in scratch page 0) and the
        page table replaced when dirty."""
        if not self.paged:
            return
        if self._release_pending:
            idx = jnp.asarray(self._release_pending, jnp.int32)
            self.cache = dataclasses.replace(
                self.cache, lengths=self.cache.lengths.at[idx].set(0))
            self._release_pending = []
        if self._tbl_dirty:
            tbl = jnp.asarray(self._page_tbl)
            if self.mesh is not None:
                tbl = jax.device_put(
                    tbl, NamedSharding(self.mesh, P("data", "seq")))
            self.cache = dataclasses.replace(self.cache, page_tbl=tbl)
            self._tbl_dirty = False

    def _preempt_newest(self, group: int = 0) -> bool:
        """Evict the most recently admitted slot IN ``group`` (pools and
        free lists are per data group), returning its pages; the request
        re-enqueues at the queue head and RESUMES later (admission
        prefills prompt + generated output, preserving the stream)."""
        cands = [i for i, s in enumerate(self.slots)
                 if s is not None and self._group(i) == group]
        if not cands:
            return False
        victim = max(cands, key=lambda i: self._admit_seq[i])
        req = self.slots[victim]
        self.slots[victim] = None
        self._free_slot_pages(victim)
        self.pending.insert(0, req)
        log.info("preempt req=%d slot=%d (pool exhausted)", req.req_id,
                 victim)
        return True

    def _grow_for_decode(self, horizon: int) -> None:
        """Allocate pages covering the next ``horizon`` tokens of every
        active slot, preempting the newest slots on pool exhaustion."""
        if not self.paged:
            return
        for i in range(self.max_slots):
            while self.slots[i] is not None:
                req = self.slots[i]
                used = len(req.prompt) + len(req.output)
                if self._ensure_pages(i, min(used + horizon,
                                             self.max_seq)):
                    break
                if not self._preempt_newest(self._group(i)):
                    raise RuntimeError(
                        "page pool exhausted with nothing to preempt")

    # ── public API ──────────────────────────────────────────────────

    @staticmethod
    def _stack_set(stack, fid: int, table, fill=0):
        """Grow a [F, R, C...] device stack to cover (fid, table) and
        write the table's rows — pads happen ON DEVICE, the upload is
        only ``table`` itself."""
        table = jnp.asarray(table)
        pads = [(0, max(0, fid + 1 - stack.shape[0]))]
        pads += [(0, max(0, t - c))
                 for t, c in zip(table.shape, stack.shape[1:])]
        if any(p[1] for p in pads):
            stack = jnp.pad(stack, pads, constant_values=fill)
        idx = (fid,) + tuple(slice(0, d) for d in table.shape)
        return stack.at[idx].set(table)

    def register_fsm(self, fsm) -> int:
        """Register a grammar.TokenFSM on device (compressed bitmask +
        byte-DFA form); returns its id. Idempotent per TokenFSM object.
        Dead states were given a forced EOS bit at construction so a
        stuck slot terminates cleanly."""
        key = id(fsm)
        if key in self._fsm_key:
            return self._fsm_key[key]
        if len(self._fsm_objs) - 1 >= self.MAX_FSMS:
            raise ValueError(
                f"fsm registry full ({self.MAX_FSMS}); reuse TokenFSM "
                "objects (the HTTP layer caches per pattern/schema)")
        if fsm.vocab_size != self.cfg.vocab_size:
            raise ValueError(
                f"fsm vocab {fsm.vocab_size} != {self.cfg.vocab_size}")
        if fsm.eos_id != self.eos_id:
            raise ValueError(
                f"fsm eos_id {fsm.eos_id} != engine eos_id {self.eos_id}")
        fid = len(self._fsm_objs)
        # grow-in-place: device-side pads + one upload of the new tables;
        # shape change → the decode programs retrace once per new
        # (F, S, L) high-water mark; register grammars before serving
        # steady-state. Counted in Engine.stats (fsm_retraces) so
        # operators can SEE a mid-serving registration latency cliff.
        old_shapes = (self._fsm_bits.shape, self._fsm_bt.shape,
                      self._fsm_tokl.shape)
        self._fsm_bits = self._stack_set(self._fsm_bits, fid, fsm.bits)
        self._fsm_bt = self._stack_set(self._fsm_bt, fid, fsm.byte_trans,
                                       fill=-1)
        self._fsm_tokb = self._stack_set(self._fsm_tokb, fid,
                                         fsm.tok_bytes)
        self._fsm_tokl = self._stack_set(self._fsm_tokl, fid, fsm.tok_len)
        self._fsm_key[key] = fid
        if (self._fsm_bits.shape, self._fsm_bt.shape,
                self._fsm_tokl.shape) != old_shapes and self._steps:
            # table shapes grew after serving started → every decode/
            # verify program retraces on its next dispatch
            self._fsm_retraces += 1
            log.warning(
                "fsm %d registration grew the table shapes mid-serving "
                "(retrace #%d) — register grammars up front to avoid "
                "the latency cliff", fid, self._fsm_retraces)
        # retain the object: the id()-keyed cache must never see a
        # GC'd address reused by a DIFFERENT TokenFSM (silently wrong
        # grammar otherwise)
        self._fsm_objs.append(fsm)
        return fid

    def add_request(self, req: Request) -> None:
        if not req.prompt or any(
                not 0 <= int(t) < self.cfg.vocab_size
                for t in req.prompt):
            # validate up front: out-of-range ids would crash host-side
            # consumers (penalty bincount) or silently gather garbage
            raise ValueError(
                f"request {req.req_id}: prompt ids must be in "
                f"[0, {self.cfg.vocab_size}) and non-empty")
        if not 0 <= req.top_logprobs <= 20:
            raise ValueError("top_logprobs must be in [0, 20]")
        if req.lora is not None and req.lora not in self.lora_names:
            raise ValueError(
                f"unknown lora adapter {req.lora!r} (registered: "
                f"{[k for k in self.lora_names if k]})")
        if req.fsm is not None:
            # composes with speculation too (r5): the verify program
            # masks each chain position with the byte-walked FSM state,
            # so illegal drafts reject and guided output is identical to
            # guided plain decode
            self.register_fsm(req.fsm)
        if len(req.prompt) + req.max_new_tokens > self.max_seq:
            raise ValueError(
                f"request {req.req_id}: prompt({len(req.prompt)}) + "
                f"max_new({req.max_new_tokens}) exceeds max_seq {self.max_seq}"
            )
        if self.paged and min(
                self._pages_for(len(req.prompt) + req.max_new_tokens),
                self._ppseg) > self.n_pages - 1:
            # per-shard bound: the fullest (data, seq) pool sees at most
            # ppseg of a slot's columns
            raise ValueError(
                f"request {req.req_id} needs more pages than the pool has")
        if (self.max_pending is not None
                and len(self.pending) >= self.max_pending):
            raise QueueFullError(
                f"pending queue full ({self.max_pending})")
        if req.submit_t is None:
            req.submit_t = time.monotonic()
        self.pending.append(req)

    def _expire_deadlines(self, finished: list[Request]) -> None:
        """Cancel pending/active requests whose deadline passed; they
        finish with whatever tokens they have, flagged timed_out."""
        now = time.monotonic()

        def expired(r):
            return r is not None and r.deadline is not None \
                and now >= r.deadline and not r.finished

        for r in [r for r in self.pending if expired(r)]:
            self.pending.remove(r)
            r.finished = r.timed_out = True
            finished.append(r)
            log.info("deadline expired (pending) req=%d", r.req_id)
        if self._prefilling is not None and expired(self._prefilling[0]):
            r = self._prefilling[0]
            self.cancel(r.req_id)
            r.timed_out = True
            finished.append(r)
        for i, r in enumerate(self.slots):
            if expired(r):
                self.cancel(r.req_id)
                r.timed_out = True
                finished.append(r)
                log.info("deadline expired (slot %d) req=%d", i, r.req_id)

    def _advance_admission(self) -> None:
        """Run at most ONE prefill chunk (admission budget: decode slots
        never stall longer than one chunked-prefill dispatch)."""
        if self._prefilling is None:
            if not self.pending:
                return
            free = next(
                (i for i, s in enumerate(self.slots) if s is None), None)
            if free is None:
                return
            req = self.pending.pop(0)
            if self.prefix_cache:
                # match the longest cached full-block prefix, then
                # allocate the slot's remaining pages up front — suffix
                # chunks write pool pages directly (no insert program)
                stream0 = req.prompt + req.output
                off0 = self._match_prefix(free, stream0)
                while not self._ensure_pages(
                        free, min(len(stream0) + 1, self.max_seq)):
                    if not self._preempt_newest(self._group(free)):
                        raise RuntimeError(
                            "page pool exhausted with nothing to preempt")
                self._prefilling = [req, free, off0, None]
            else:
                self.pf_cache = dataclasses.replace(
                    self.pf_cache,
                    lengths=jnp.zeros_like(self.pf_cache.lengths))
                self._prefilling = [req, free, 0, None]
        req, slot, off, _ = self._prefilling
        # the chunk prefill and all later decode dispatches use this
        # slot's adapter (0 = base; stale ids on freed slots only feed
        # masked/garbage lanes)
        self._adapter_slot[slot] = self.lora_names.get(req.lora, 0)
        # stream = prompt + output: a PREEMPTED request resumes by
        # prefilling everything it had produced so far (paged engine).
        stream = req.prompt + req.output
        # Long prompts on a seq>1 mesh: the body (rounded down to a
        # sp*sp_quantum multiple, capped so T_loc stays VMEM-sane for the
        # ring's blockwise logits) runs through the q-sharded SP prefill
        # in ONE dispatch — prefill compute shards over seq instead of
        # replicating. The tail (< one quantum) and LoRA requests use the
        # ordinary chunked path, which under seq>1 still shards KV reads
        # (LSE merge) and scatter-drops straddling writes.
        sp_body = 0
        if (off == 0 and getattr(self, "_sp", 1) > 1
                and self.sp_prefill_mode is not None
                and not self.prefix_cache
                and self.mesh.shape.get("pipe", 1) == 1
                and self._adapter_slot[slot] == 0
                and len(stream) >= self.sp_prefill_threshold):
            quantum = self._sp * self.sp_quantum
            sp_body = (len(stream) // quantum) * quantum
            sp_body = min(sp_body, self._sp * 2048)
        if sp_body:
            toks = np.asarray(stream[:sp_body], np.int32)[None]
            last, self.pf_cache = self._sp_prefill_fn(
                sp_body // self._sp)(self.params, jnp.asarray(toks),
                                     self.pf_cache)
            off = sp_body
            if off < len(stream):
                self._prefilling = [req, slot, off, None]
                return
            # fall through to completion with the sp program's logits
        else:
            last, off = self._chunk_prefill(req, slot, off, stream)
            if off < len(stream):
                self._prefilling = [req, slot, off, None]
                return
        self._complete_admission(req, slot, stream, last)

    def _chunk_prefill(self, req, slot, off, stream):
        """One PREFILL_CHUNK through the (possibly prefix-cached) chunked
        prefill program; returns (last_logits, new_off)."""
        aid = jnp.asarray([self._adapter_slot[slot]], jnp.int32)
        chunk = stream[off:off + self.PREFILL_CHUNK]
        t_pad = _bucket(len(chunk))
        toks = np.zeros((1, t_pad), np.int32)
        toks[0, : len(chunk)] = chunk
        if self.prefix_cache:
            pools = (self.cache.k_codes, self.cache.k_scale,
                     self.cache.v_codes, self.cache.v_scale)
            last, pools = self._prefix_prefill_fn(t_pad)(
                self.params, jnp.asarray(toks), pools,
                jnp.asarray(self._page_tbl[slot], jnp.int32),
                jnp.int32(off), jnp.int32(len(chunk)), jnp.int32(slot),
                aid)
            self.cache = dataclasses.replace(
                self.cache, k_codes=pools[0], k_scale=pools[1],
                v_codes=pools[2], v_scale=pools[3])
        else:
            last, self.pf_cache = self._prefill_fn(t_pad)(
                self.params, jnp.asarray(toks), self.pf_cache,
                jnp.int32(len(chunk)), aid)
        return last, off + len(chunk)

    def _complete_admission(self, req, slot, stream, last):
        """Prompt complete: insert into the decode cache + first token."""
        if self.prefix_cache:
            # KV already in pool pages; publish device length + new blocks
            self._admit_counter += 1
            self._admit_seq[slot] = self._admit_counter
            self._register_prefix(slot, stream)
            self._sync_paged()
            self.cache = dataclasses.replace(
                self.cache,
                lengths=self.cache.lengths.at[slot].set(len(stream)))
        elif self.paged:
            while not self._ensure_pages(slot, len(stream) + 1):
                if not self._preempt_newest(self._group(slot)):
                    raise RuntimeError(
                        "page pool exhausted with nothing to preempt")
            self._admit_counter += 1
            self._admit_seq[slot] = self._admit_counter
            self._sync_paged()
            ids = self._page_tbl[slot].astype(np.int32).copy()
            unused = np.arange(len(ids))
            mask = unused >= self._n_alloc[slot]
            # distinct out-of-range sentinels → dropped by the scatter
            ids[mask] = self.n_pages + unused[mask]
            self.cache = self._insert(self.cache, self.pf_cache,
                                      jnp.int32(slot), jnp.asarray(ids))
        else:
            self.cache = self._insert(self.cache, self.pf_cache,
                                      jnp.int32(slot))
        seed = req.seed if req.seed is not None else req.req_id
        kd = jax.random.key_data(jax.random.key(int(seed) & 0x7FFFFFFF))
        if req.key_draws:
            kd = _advance_key(kd, jnp.int32(req.key_draws))
        ks = jax.random.split(jax.random.wrap_key_data(kd))
        self.slot_keys = self.slot_keys.at[slot].set(
            jax.random.key_data(ks[0]))
        req.key_draws += 1
        sub = ks[1]
        fsm_row = None
        if req.fsm is not None:
            # constraint applies to the OUTPUT stream: replay any
            # already-committed output (preempted re-admission) from the
            # start state, then mask this first sample with the state's
            # legality row. Dead-state → EOS handling happened at FSM
            # construction.
            fid = self.register_fsm(req.fsm)
            st = req.fsm.advance(req.fsm.start, req.output)
            self._fsm_ids[slot] = fid
            self._fsm_state[slot] = st
            fsm_row = jnp.asarray(req.fsm.mask_row(st)[None])
        else:
            self._fsm_ids[slot] = 0
            self._fsm_state[slot] = 0
        if req.sampling.has_penalties:
            # Exact prompt(+resumed-output) token counts for the
            # penalties, built host-side and written as ONE row set at
            # admission completion. Deliberately NOT accumulated per
            # chunk on device: the decode/verify programs scatter-add
            # +1 to EVERY slot row each dispatch (including this one,
            # mid-prefill, from its stale last_token), so any such
            # garbage landing during the chunked prefill is overwritten
            # here before the row is first read. After this point the
            # slot is active and the per-step adds are the real
            # committed tokens. Also handles preempted re-admissions
            # (stream = prompt + output, rebuilt from scratch).
            row = np.bincount(np.asarray(stream, np.int64),
                              minlength=self.cfg.vocab_size
                              ).astype(np.int32)
            self.counts = self.counts.at[slot].set(jnp.asarray(row))
            tok = int(sample(last[None], sub, req.sampling,
                             counts=self.counts[slot][None],
                             fsm_rows=fsm_row)[0])
            self.counts = self.counts.at[slot, tok].add(1)
        else:
            tok = int(sample(last[None], sub, req.sampling,
                             fsm_rows=fsm_row)[0])
        if req.fsm is not None:
            self._fsm_state[slot] = req.fsm.advance(
                self._fsm_state[slot], [tok])
        req.output.append(tok)
        req.logprobs.append(float(token_logprob(
            last[None], jnp.asarray([tok], jnp.int32))[0]))
        if req.top_logprobs:
            # first token is host-sampled at admission — host top-K
            lg = np.asarray(last, np.float32)
            m = float(lg.max())
            lse = m + float(np.log(np.sum(np.exp(lg - m))))
            kk = req.top_logprobs
            idx = np.argpartition(-lg, kk)[:kk]
            idx = idx[np.argsort(-lg[idx])]
            req.top_ids.append([int(t) for t in idx])
            req.top_lps.append([float(lg[t] - lse) for t in idx])
        req.first_token_t = time.monotonic()
        self.slots[slot] = req
        self.last_tokens[slot] = tok
        self._maybe_finish(slot, tok)
        if req.finished:
            self._admit_finished.append(req)
        elif self._stateful_proposer:
            # draft-model KV for the committed stream minus its last
            # token (the drafting invariant, spec.DraftModelProposer)
            self.proposer.admit(slot, req.prompt + req.output)
            if hasattr(self.proposer, "set_slot_key"):
                # draft-chain PRNG from the request seed (distinct
                # domain from the engine's sampling keys)
                dk = jax.random.fold_in(
                    jax.random.key(int(seed) & 0x7FFFFFFF), 0xD4A77)
                self.proposer.set_slot_key(
                    slot, jax.random.key_data(dk))
        self._prefilling = None
        log.info("admit req=%d slot=%d prompt_len=%d",
                 req.req_id, slot, len(req.prompt))

    def _drain_admission(self, max_chunks: int | None = None) -> None:
        """Admit pending requests (block mode), at most ``max_chunks``
        prefill dispatches (VERDICT r3 #8: unbounded draining let a burst
        of long prompts stall every decode slot for the whole multi-chunk
        prefill; the budget resumes admission on the next block, bounding
        decode stall at max_chunks dispatches)."""
        done = 0
        while (self._prefilling is not None
               or (self.pending and any(s is None for s in self.slots))):
            if max_chunks is not None and done >= max_chunks:
                return
            self._advance_admission()
            done += 1

    def _maybe_finish(self, i: int, tok: int) -> None:
        req = self.slots[i]
        if req is None:
            return
        used = len(req.prompt) + len(req.output)
        if (tok == self.eos_id or tok in req.stop_ids
                or len(req.output) >= req.max_new_tokens
                or used >= self.max_seq):
            req.finished = True
            req.finish_t = time.monotonic()
            if req.ttft is not None:
                self._ttfts.append(req.ttft)
            if req.tpot is not None:
                self._tpots.append(req.tpot)
            self.slots[i] = None
            if self.paged:
                self._free_slot_pages(i)
            log.info("finish req=%d generated=%d", req.req_id,
                     len(req.output))

    def cancel(self, req_id: int) -> bool:
        """Cancel a pending, prefilling or in-flight request."""
        for i, r in enumerate(self.pending):
            if r.req_id == req_id:
                self.pending.pop(i)
                r.finished = True
                log.info("cancel pending req=%d", req_id)
                return True
        if self._prefilling is not None \
                and self._prefilling[0].req_id == req_id:
            self._prefilling[0].finished = True
            if self.prefix_cache:
                # prefix mode allocates the slot's pages at admission
                # START — release them or they leak
                self._free_slot_pages(self._prefilling[1])
            self._prefilling = None
            log.info("cancel prefilling req=%d", req_id)
            return True
        for i, r in enumerate(self.slots):
            if r is not None and r.req_id == req_id:
                r.finished = True
                self.slots[i] = None
                if self.paged:
                    self._free_slot_pages(i)
                log.info("cancel active req=%d slot=%d", req_id, i)
                return True
        return False

    def _spec_advance(self, active: list[int],
                      finished: list[Request]) -> int:
        """One speculative verify dispatch: draft host-side, verify all
        slots in a single (gamma+1)-token forward, commit the accepted
        prefix + bonus token per slot. Returns committed token count."""
        g = self.spec_gamma
        toks = np.zeros((self.max_slots, g + 1), np.int32)
        toks[:, 0] = self.last_tokens
        n_prop = np.zeros((self.max_slots,), np.int64)
        knobs, any_pen, any_bias, any_fsm = self._sampling_knobs(active)
        sampled = any(not self.slots[i].sampling.greedy for i in active)
        qprobs = None
        if self._stateful_proposer:
            lens = np.zeros((self.max_slots,), np.int64)
            for i in active:
                req = self.slots[i]
                lens[i] = len(req.prompt) + len(req.output)
            if sampled and hasattr(self.proposer, "draft_batch_sampled"):
                # sampled-draft speculative SAMPLING: the chain samples
                # d ~ q under each slot's own knobs and the verify
                # accepts with min(1, p/q) (spec_commit q_probs) — q
                # rows never leave the device
                drafts, qprobs = self.proposer.draft_batch_sampled(
                    self.last_tokens, lens, *knobs[:4])
            else:
                drafts = self.proposer.draft_batch(self.last_tokens, lens)
            toks[:, 1:] = drafts[:, :g]
            n_prop[active] = g
            self._spec_proposed += g * len(active)
        else:
            for i in active:
                req = self.slots[i]
                d = self.proposer.propose(req.prompt + req.output)[:g]
                toks[i, 1:1 + len(d)] = d
                n_prop[i] = len(d)
                self._spec_proposed += len(d)
        k_lp = self._k_lp(active)
        packed, self.cache, self.counts, self.slot_keys = self._verify(
            self.params, jnp.asarray(toks), self.cache, self.slot_keys,
            *knobs,
            self.counts,
            fsm_tabs=(self._fsm_bits, self._fsm_bt,
                      self._fsm_tokb, self._fsm_tokl),
            fsm_ids=jnp.asarray(self._fsm_ids),
            fsm_states=jnp.asarray(self._fsm_state),
            adapter_ids=jnp.asarray(self._adapter_slot),
            q_probs=qprobs,
            sampled=sampled or any_pen or any_bias,
            use_pen=any_pen, use_bias=any_bias, use_fsm=any_fsm,
            topk_lp=k_lp)
        packed = np.asarray(packed)
        tgt = packed[:, :g + 1]
        lps = packed[:, g + 1:2 * (g + 1)].view(np.float32)
        if k_lp:
            b0, o0 = packed.shape[0], 2 * (g + 1)
            t_ids = packed[:, o0:o0 + (g + 1) * k_lp].reshape(
                b0, g + 1, k_lp)
            t_lps = packed[:, o0 + (g + 1) * k_lp:-1].view(
                np.float32).reshape(b0, g + 1, k_lp)
        acc = packed[:, -1]
        self._spec_dispatches += 1
        committed = 0
        for i in active:
            req = self.slots[i]
            req.key_draws += 1
            used = len(req.prompt) + len(req.output)
            # a token at stream position p needs every KV write < p to
            # have landed; writes at >= max_seq were dropped, so only the
            # first max_seq - used commits are trustworthy
            n_take = min(int(acc[i]) + 1, self.max_seq - used)
            # sampled slots can "accept" padded zero drafts beyond the
            # real proposals (the padding is a valid delta proposal for
            # correctness) — cap the stat so acceptance rate stays <= 1
            self._spec_accepted += min(int(acc[i]), int(n_prop[i]))
            fid = (self._fsm_key[id(req.fsm)] if req.fsm is not None
                   else None)
            for j in range(n_take):
                tok = int(tgt[i, j])
                req.output.append(tok)
                req.logprobs.append(float(lps[i, j]))
                if req.top_logprobs:
                    kk = req.top_logprobs
                    req.top_ids.append(
                        [int(t) for t in t_ids[i, j, :kk]])
                    req.top_lps.append(
                        [float(v) for v in t_lps[i, j, :kk]])
                if fid is not None:
                    # replay the verify program's transitions host-side
                    # for every COMMITTED token (accepted prefix + the
                    # commit sample)
                    self._fsm_state[i] = self._fsm_objs[fid].advance(
                        self._fsm_state[i], [tok])
                self.last_tokens[i] = tok
                committed += 1
                self._maybe_finish(i, tok)
                if req.finished:
                    finished.append(req)
                    break
        self._spec_committed += committed
        self._spec_slot_steps += len(active)
        return committed

    def _k_lp(self, active) -> int:
        """Static top-logprobs K for this dispatch: the max over active
        slots (each request keeps only its own first K entries).
        Retraces once per new high-water K — capped at 20 (OpenAI)."""
        return min(20, max((self.slots[i].top_logprobs for i in active),
                           default=0))

    def _sampling_knobs(self, active):
        """Per-slot traced sampling knobs for the on-device samplers:
        ((temps, topks, topps, minps, reps, freqs, press) device arrays
        of [max_slots], any_penalties) — the bool drives the programs'
        static use_pen flag (penalty math compiles in only when some
        active slot actually asks for it)."""
        temps = np.zeros((self.max_slots,), np.float32)
        topks = np.zeros((self.max_slots,), np.int32)
        topps = np.ones((self.max_slots,), np.float32)
        minps = np.zeros((self.max_slots,), np.float32)
        reps = np.ones((self.max_slots,), np.float32)
        freqs = np.zeros((self.max_slots,), np.float32)
        press = np.zeros((self.max_slots,), np.float32)
        any_pen = False
        # logit_bias entries padded to a bucketed K (unused rows point at
        # token 0 with value 0 — a no-op add); K only retraces when a
        # request carries more biases than any before
        nbias = max((len(self.slots[i].sampling.logit_bias)
                     for i in active), default=0)
        k = max(8, _bucket(nbias, lo=8)) if nbias else 8
        bias_toks = np.zeros((self.max_slots, k), np.int32)
        bias_vals = np.zeros((self.max_slots, k), np.float32)
        any_fsm = False
        for i in active:
            sc = self.slots[i].sampling
            temps[i], topks[i], topps[i], minps[i] = (
                sc.temperature, sc.top_k, sc.top_p, sc.min_p)
            reps[i], freqs[i], press[i] = (sc.repetition_penalty,
                                           sc.frequency_penalty,
                                           sc.presence_penalty)
            any_pen = any_pen or sc.has_penalties
            any_fsm = any_fsm or self.slots[i].fsm is not None
            for j, (t, v) in enumerate(sc.logit_bias):
                bias_toks[i, j], bias_vals[i, j] = t, v
        return ((jnp.asarray(temps), jnp.asarray(topks),
                 jnp.asarray(topps), jnp.asarray(minps),
                 jnp.asarray(reps), jnp.asarray(freqs),
                 jnp.asarray(press), jnp.asarray(bias_toks),
                 jnp.asarray(bias_vals)), any_pen, bool(nbias), any_fsm)

    def step(self) -> list[Request]:
        """One prefill chunk of admission (budgeted) + one decode advance
        for all active slots: 1 token each, or 1..spec_gamma+1 tokens
        each when speculative decoding is on (``spec_gamma > 0``).
        Mixed batches are fine — the verify program runs on-device
        rejection sampling per slot (sampler.spec_commit): greedy slots
        follow the exact argmax chain, sampled slots the exact target
        sampling chain (the n-gram proposal is a delta distribution)."""
        expired: list[Request] = []
        self._expire_deadlines(expired)
        self._advance_admission()
        pre_active = [i for i, s in enumerate(self.slots) if s is not None]
        use_spec = bool(self.spec_gamma and pre_active)
        self._grow_for_decode(self.spec_gamma + 1 if use_spec else 1)
        self._sync_paged()
        # _grow_for_decode may have preempted slots — recompute
        active = [i for i, s in enumerate(self.slots) if s is not None]
        use_spec = use_spec and bool(active)
        finished, self._admit_finished = self._admit_finished, []
        finished = expired + finished
        if use_spec:
            n_committed = self._spec_advance(active, finished)
            self._steps += 1
            now = time.perf_counter()
            rate = n_committed / max(now - self._last_t, 1e-6)
            self._tok_ema = 0.9 * self._tok_ema + 0.1 * rate
            self._last_t = now
            return finished
        if active:
            tokens = jnp.asarray(self.last_tokens[:, None])
            knobs, any_pen, any_bias, any_fsm = self._sampling_knobs(
                active)
            k_lp = self._k_lp(active)
            packed, self.cache, self.slot_keys, self.counts = \
                self._decode(
                    self.params, tokens, self.cache, self.slot_keys,
                    *knobs,
                self.counts,
                fsm_tabs=(self._fsm_bits, self._fsm_bt,
                          self._fsm_tokb, self._fsm_tokl),
                fsm_ids=jnp.asarray(self._fsm_ids),
                fsm_states=jnp.asarray(self._fsm_state),
                adapter_ids=jnp.asarray(self._adapter_slot),
                use_pen=any_pen, use_bias=any_bias, use_fsm=any_fsm,
                topk_lp=k_lp)
            packed = np.asarray(packed)
            toks = packed[:, 0]
            lps = packed[:, 1].view(np.float32)
            if k_lp:
                t_ids = packed[:, 2:2 + k_lp]
                t_lps = packed[:, 2 + k_lp:2 + 2 * k_lp].view(np.float32)
            for i in active:
                req = self.slots[i]
                req.key_draws += 1
                tok = int(toks[i])
                req.output.append(tok)
                req.logprobs.append(float(lps[i]))
                if req.top_logprobs:
                    kk = req.top_logprobs
                    req.top_ids.append([int(t) for t in t_ids[i, :kk]])
                    req.top_lps.append([float(v) for v in t_lps[i, :kk]])
                if req.fsm is not None:
                    # mirror the device's transition host-side (the
                    # per-slot state is a host array re-uploaded each
                    # dispatch)
                    fid = self._fsm_key[id(req.fsm)]
                    self._fsm_state[i] = self._fsm_objs[fid].advance(
                        self._fsm_state[i], [tok])
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
        """Up to n decode steps fused into ONE device dispatch, with
        on-device per-slot sampling (greedy / temperature / top-k / top-p).

        Amortizes host dispatch latency; trades admission granularity —
        pending requests are fully admitted before the block. ``n`` is
        capped by the LONGEST-remaining active slot (not the shortest:
        nearly-done slots finish mid-block and get trimmed on host, so one
        short request no longer collapses the batch to 1-step dispatches).
        Over-capacity cache writes of finished slots are dropped by the
        scatter and their lengths reset at the next insert.
        """
        expired: list[Request] = []
        self._expire_deadlines(expired)
        # budget admission only while decode slots would actually stall;
        # an idle engine drains freely (occupancy ramps at full speed)
        self._drain_admission(
            self.block_admit_chunks
            if any(s is not None for s in self.slots) else None)
        self._grow_for_decode(n)
        self._sync_paged()
        active = [i for i, s in enumerate(self.slots) if s is not None]
        finished, self._admit_finished = self._admit_finished, []
        finished = expired + finished
        if not active:
            return finished
        n = max(1, min(n, max(
            self.slots[i].max_new_tokens - len(self.slots[i].output)
            for i in active)))
        sampled = any(not self.slots[i].sampling.greedy for i in active)
        tokens = jnp.asarray(self.last_tokens[:, None])
        knobs, any_pen, any_bias, any_fsm = self._sampling_knobs(active)
        k_lp = self._k_lp(active)
        packed, self.cache, self.slot_keys, self.counts = \
            self._decode_block(
                self.params, tokens, self.cache, self.slot_keys, *knobs,
            self.counts,
            fsm_tabs=(self._fsm_bits, self._fsm_bt,
                      self._fsm_tokb, self._fsm_tokl),
            fsm_ids=jnp.asarray(self._fsm_ids),
            fsm_states=jnp.asarray(self._fsm_state),
            adapter_ids=jnp.asarray(self._adapter_slot),
            n=n, sampled=sampled or any_pen or any_bias or any_fsm,
            use_pen=any_pen, use_bias=any_bias, use_fsm=any_fsm,
            topk_lp=k_lp,
        )
        packed = np.asarray(packed)
        toks = packed[:, :n]
        lps = packed[:, n:2 * n].view(np.float32)
        if k_lp:
            b0 = packed.shape[0]
            t_ids = packed[:, 2 * n:2 * n + n * k_lp].reshape(b0, n, k_lp)
            t_lps = packed[:, 2 * n + n * k_lp:].view(
                np.float32).reshape(b0, n, k_lp)
        for i in active:
            req = self.slots[i]
            req.key_draws += n
            fid = (self._fsm_key[id(req.fsm)] if req.fsm is not None
                   else None)
            for j in range(n):
                tok = int(toks[i, j])
                req.output.append(tok)
                req.logprobs.append(float(lps[i, j]))
                if req.top_logprobs:
                    kk = req.top_logprobs
                    req.top_ids.append(
                        [int(t) for t in t_ids[i, j, :kk]])
                    req.top_lps.append(
                        [float(v) for v in t_lps[i, j, :kk]])
                if fid is not None:
                    # replay the device's in-loop transitions host-side
                    self._fsm_state[i] = self._fsm_objs[fid].advance(
                        self._fsm_state[i], [tok])
                self.last_tokens[i] = tok
                self._maybe_finish(i, tok)
                if req.finished:
                    finished.append(req)
                    break
        self._steps += n
        return finished

    @staticmethod
    def _pcts(xs, name) -> dict:
        if not xs:
            return {}
        a = np.asarray(xs, np.float64)
        return {f"{name}_p50_ms": round(float(np.percentile(a, 50)) * 1e3, 2),
                f"{name}_p90_ms": round(float(np.percentile(a, 90)) * 1e3, 2),
                f"{name}_p99_ms": round(float(np.percentile(a, 99)) * 1e3, 2)}

    @property
    def stats(self) -> dict:
        return {
            "steps": self._steps,
            "occupancy": sum(s is not None for s in self.slots),
            "pending": len(self.pending)
            + (1 if self._prefilling is not None else 0),
            "tokens_per_s_ema": round(self._tok_ema, 1),
            # rolling request-latency percentiles (last 512 finishes):
            # TTFT = enqueue -> first token; TPOT = mean inter-token
            **self._pcts(self._ttfts, "ttft"),
            **self._pcts(self._tpots, "tpot"),
            **({"loras": len(self.lora_names) - 1}
               if len(self.lora_names) > 1 else {}),
            **({"fsms": len(self._fsm_objs) - 1,
                "fsm_retraces": self._fsm_retraces}
               if len(self._fsm_objs) > 1 else {}),
            **({"prefix_hit_tokens": self._prefix_hit_tokens,
                "cached_blocks": sum(len(m) for m in self._prefix_map)}
               if self.prefix_cache else {}),
            **({"free_pages": sum(len(f) for f in self._free_pages),
                "total_pages": (self.n_pages - 1) * self._data_groups}
               if self.paged else {}),
            **({"spec_proposed": self._spec_proposed,
                "spec_accepted": self._spec_accepted,
                "spec_acceptance": round(
                    self._spec_accepted / max(self._spec_proposed, 1), 3),
                # mean tokens a slot commits per verify dispatch (>= 1.0;
                # plain decode would be exactly 1.0)
                "spec_tokens_per_slot_step": round(
                    self._spec_committed / max(self._spec_slot_steps, 1),
                    2)}
               if self.spec_gamma else {}),
        }

    def has_work(self) -> bool:
        return (bool(self.pending) or self._prefilling is not None
                or any(s is not None for s in self.slots))

    def generate(
        self,
        prompts: list[list[int]],
        max_new_tokens: int = 32,
        sampling: SamplingConfig = SamplingConfig(),
        fsm=None,
        lora=None,
    ) -> list[list[int]]:
        """Convenience batch API over the continuous-batching loop.

        Without speculation it drives ``step_block`` (up to 16 decode
        steps fused per dispatch) — on high-RPC-latency links the batch
        completes in ~n/16 round-trips; with ``spec_gamma`` set it steps
        singly so the host can draft between verifies."""
        reqs = [
            Request(req_id=i, prompt=p, max_new_tokens=max_new_tokens,
                    sampling=sampling, fsm=fsm, lora=lora)
            for i, p in enumerate(prompts)
        ]
        for r in reqs:
            self.add_request(r)
        while self.has_work():
            if self.spec_gamma:
                self.step()
            else:
                self.step_block(16)
        return [r.output for r in reqs]
