"""Llama model family — pure JAX, INT4/INT8 weights, INT8 KV cache.

Covers TinyLlama-1.1B / Llama-3-8B / Llama-3-70B (BASELINE.json:9-11):
RMSNorm, rotate-half RoPE, GQA attention, SwiGLU MLP. No reference
counterpart (the C++ reference is a host codec — SURVEY.md §0); the codec's
scheme generalizes to the weight storage here (SURVEY.md §2.2 #6).

TPU-first design:

* Every projection is a :class:`QTensor` consumed by the fused
  dequant+matmul Pallas kernel (``cfg.kernel_mode`` selects pallas /
  interpret / pure-XLA paths — tests run xla+interpret on CPU).
* Layers are STACKED (leading L axis on every leaf) and iterated with
  ``lax.scan`` — one trace, O(1) compile time in depth, and clean pipeline
  sharding later (the stacked axis is what PP splits).
* KV cache is int8 with one float32 scale per (token, head): attention
  applies the key scale AFTER the q·k dot and folds the value scale into the
  softmax probs, so the int8 cache is never materialized as floats
  (HBM traffic = 1 byte/elem + scales).
* Shapes are static: caches are allocated at max_seq and masked by per-slot
  lengths, so prefill/decode/continuous-batching never retrace.

Weight convention: QTensor stores W as [K, N] for ``y = x @ W`` (the HF
converter transposes torch's [out, in]).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.core.qtensor import QTensor, concat_columns, quantize_tensor
from quant_tpu.kernels.dequant_matmul import (
    dequant_matmul,
    dequant_matmul_reference,
)
from quant_tpu.models.config import ModelConfig

__all__ = [
    "LlamaParams", "LayerParams", "KVCache",
    "init_params", "init_params_device", "init_cache", "forward",
    "quantize_dense_params",
]


# ── params ──────────────────────────────────────────────────────────────


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LayerParams:
    """One decoder layer; in LlamaParams these are stacked along axis 0.

    Projections are FUSED column-wise (one kernel launch each): wqkv packs
    q|k|v, w_gate_up packs gate|up — interleaved per TP shard when packed
    with tp>1 (see core.qtensor.concat_columns), so a column split gives
    every rank its slice of each part.
    """
    wqkv: QTensor       # [D, (Hq + 2*Hkv) * Dh]
    wo: QTensor         # [Hq*Dh, D]
    w_gate_up: QTensor  # [D, 2*I]
    w_down: QTensor     # [I, D]
    attn_norm: Any      # [D] (or [L, D] stacked)
    mlp_norm: Any
    # QKV bias (Qwen2 family); zeros for Llama. Same interleaved column
    # order as wqkv so TP column splits stay aligned.
    qkv_bias: Any = None
    # QK-RMSNorm weights (Qwen3 family): [Dh], shared across heads, so
    # they replicate under TP head splits. Ones when cfg.qk_norm is off
    # (the norm itself is gated by the config, not by these values).
    q_norm: Any = None
    k_norm: Any = None
    # Sparse-MoE MLP (cfg.n_experts > 0; Mixtral family). The dense
    # w_gate_up/w_down are None and these take over:
    # ``router`` is a small dense [L, D, E] (replicated under TP/EP —
    # top-k needs every expert's logit); expert projections are QTensors
    # with 4-D [E, L, ...] leading dims so PartitionSpecs shard experts
    # (dim 0, ``expert`` mesh axis) and layers (dim 1, ``pipe``)
    # independently, then mlp_block merges them to the [E_loc*L_loc, ...]
    # stack the scalar-prefetched Pallas index maps select from
    # (slice e*L+layer; a leading-dims reshape is layout-free).
    router: Any = None        # [L, D, E]
    we_gate_up: Any = None    # QTensor [E, L, D, 2I]
    we_down: Any = None       # QTensor [E, L, I, D]
    # Gemma-2 post-block norms ([D], applied to the attention / MLP
    # OUTPUT before the residual add). None unless cfg.post_norms.
    post_attn_norm: Any = None
    post_mlp_norm: Any = None
    # DeepSeek-V2/V3 multi-head latent attention (cfg.is_mla). wqkv is
    # repurposed as the fused DOWN projections [D, qpart + r + dr] where
    # qpart = H*(dn+dr) (direct q, V2-Lite) or q_lora_rank (V3), and the
    # last r+dr columns are kv_a ([c_kv | k_rope]). Decode runs the
    # ABSORBED form: w_uk/w_uv are the per-head kv_b up-projections
    # folded into the query / output sides (dense bf16 [L, H, dn, r] /
    # [L, H, r, dv] — per-head batched GEMMs don't fit the 2-D stacked
    # Pallas kernel, and at r=512 they are ~1-3% of model bytes), so
    # attention is MQA over the quantized latent and the cache holds
    # r + dr values per token TOTAL.
    w_q_b: Any = None       # QTensor [L, q_lora_rank, H*(dn+dr)]
    w_uk: Any = None        # [L, H, dn, r]
    w_uv: Any = None        # [L, H, r, dv]
    q_a_norm: Any = None    # [L, q_lora_rank] (q_lora_rank > 0 only)
    kv_a_norm: Any = None   # [L, r]
    # DeepSeek MoE: always-on shared expert(s) (one dense GLU of width
    # n_shared_experts * intermediate) + V3 e_score_correction_bias
    # (added to routing scores for SELECTION only).
    ws_gate_up: Any = None  # QTensor [L, D, 2 * sI]
    ws_down: Any = None     # QTensor [L, sI, D]
    router_bias: Any = None  # [L, E]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QEmbed:
    """INT8 per-row quantized embedding table (embed_bits=8): halves the
    single biggest fp tensor of a quantized checkpoint; lookup dequantizes
    only the gathered rows."""
    codes: Any   # int8 [V, D]
    scales: Any  # f32  [V]


def _make_embed(table, cfg):
    if cfg.embed_bits == 8:
        t = jnp.asarray(table, jnp.float32)
        absmax = jnp.max(jnp.abs(t), axis=1)
        scales = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        codes = jnp.round(t / scales[:, None]).astype(jnp.int8)
        return QEmbed(codes=codes, scales=scales.astype(jnp.float32))
    return jnp.asarray(table, jnp.dtype(cfg.dtype))


def _embed_lookup(embed, tokens, dt, cfg: ModelConfig | None = None):
    if isinstance(embed, QEmbed):
        rows = embed.codes[tokens].astype(jnp.float32)
        h = (rows * embed.scales[tokens][..., None]).astype(dt)
    else:
        h = embed[tokens].astype(dt)
    if cfg is not None and cfg.embed_scale:
        # Gemma: hidden states enter the stack scaled by sqrt(dim)
        h = h * jnp.asarray(np.sqrt(cfg.dim), dt)
    return h


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LlamaParams:
    embed: Any        # [V, D] activation dtype, or QEmbed (embed_bits=8)
    layers: LayerParams  # leaves stacked [L, ...]
    final_norm: Any   # [D]
    lm_head: QTensor  # [D, V]
    # Multi-LoRA serving: a models.lora.LoraStack of registered adapters
    # (None = no adapters; forward's ``adapter_ids`` selects per slot).
    # Not part of the base checkpoint.
    lora: Any = None
    # DeepSeek first_k_dense: the first k layers use a plain dense MLP
    # — a SEPARATE stacked LayerParams (scan leaves must be uniform, so
    # dense-prefix and MoE layers cannot share one lax.scan). forward
    # runs this stack first, then ``layers`` with layer_off=k so cache
    # writes land at global layer indices. None unless cfg.first_k_dense.
    layers0: Any = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KVCache:
    """INT8 KV cache, static max_seq shapes, per-(token, head) scales.

    lengths[b] = number of valid tokens for slot b (cache write position).
    """
    k_codes: Any   # int8 [L, B, Hkv, S, Dh]
    k_scale: Any   # f32  [L, B, Hkv, S]
    v_codes: Any   # int8 [L, B, Hkv, S, Dh]
    v_scale: Any   # f32  [L, B, Hkv, S]
    lengths: Any   # int32 [B]

    @property
    def max_seq(self) -> int:
        return self.k_codes.shape[3]


def _kv_dtype(cfg: ModelConfig):
    if cfg.kv_bits == 8:
        return jnp.int8
    if cfg.kv_bits == 4:
        return jnp.uint8  # two head-pair nibbles per byte
    return jnp.dtype(cfg.dtype)


def _kv_code_dims(cfg: ModelConfig) -> tuple[int, int]:
    """(head, code) dims of the cache CODE arrays.

    kv_bits=4 packs nibbles across HEAD PAIRS (packed head j = real
    heads 2j low | 2j+1 high): codes [.., H/2, S, D]. The r4 redesign —
    the original split-D layout ([.., H, S, D/2]) left the code arrays
    with a sub-128 lane dim, which Mosaic's DMA slicing rejects in the
    aliased insert kernel and whose lane-view workaround relayouts the
    whole cache per call (measured 640 ms/step). Head-pair packing
    keeps the lane dim at head_dim, packs each token standalone (the
    XLA scatter prefill path is unchanged), and the attention kernels
    dot full-D tiles per head parity with only free major-dim
    reshapes. Scales stay per REAL head ([.., H, S]).
    """
    h = cfg.n_kv_heads // 2 if cfg.kv_bits == 4 else cfg.n_kv_heads
    return h, cfg.head_dim


def cache_rows(cfg: ModelConfig, pipe: int = 1) -> int:
    """Cache layer rows. ``pipe > 1`` on a first_k_dense model pads to
    ``pipe*k0 + (L-k0)`` (r5 MLA x PP): the cache's layer dim shards
    EVENLY over pipe, giving every stage k0 local prefix rows + its
    (L-k0)/pipe MoE rows — the replicated dense-prefix scan runs on
    stage 0 and writes local rows [0, k0); other stages' prefix rows
    stay unused (k0 is 1-3 layers, the waste is noise next to even
    sharding of the two-stack model)."""
    k0 = cfg.first_k_dense
    if pipe > 1 and k0:
        return pipe * k0 + (cfg.n_layers - k0)
    return cfg.n_layers


def init_cache(cfg: ModelConfig, batch: int, max_seq: int,
               pipe: int = 1) -> KVCache:
    l, (hc, d) = cache_rows(cfg, pipe), _kv_code_dims(cfg)
    hs = cfg.n_kv_heads   # scales stay per REAL head
    cdt = _kv_dtype(cfg)
    if cfg.is_mla:
        # MLA stores ONE shared latent [c_kv | k_rope] per token on the
        # K side (r + dr values); there is no separate V — attention
        # outputs probs @ c_kv and the per-head value up-projection
        # happens OUTSIDE attention (absorbed form). The V buffers stay
        # in the pytree at zero width so every generic cache consumer
        # (engine slot moves, prefix caching, scans) works unchanged.
        d = cfg.mla_cache_dim
        return KVCache(
            k_codes=jnp.zeros((l, batch, 1, max_seq, d), cdt),
            k_scale=jnp.zeros((l, batch, 1, max_seq), jnp.float32),
            v_codes=jnp.zeros((l, batch, 1, max_seq, 0), cdt),
            v_scale=jnp.zeros((l, batch, 0, max_seq), jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32),
        )
    return KVCache(
        k_codes=jnp.zeros((l, batch, hc, max_seq, d), cdt),
        k_scale=jnp.zeros((l, batch, hs, max_seq), jnp.float32),
        v_codes=jnp.zeros((l, batch, hc, max_seq, d), cdt),
        v_scale=jnp.zeros((l, batch, hs, max_seq), jnp.float32),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedKVCache:
    """Paged INT8 KV cache (SURVEY #5/#15): a page POOL shared by all
    slots + per-slot page tables (vLLM-style block tables) — HBM is
    bounded by used pages, not slots × max_seq. The engine's free-list
    allocator owns the tables; page_tbl entries past a slot's length may
    be arbitrary valid ids (compute masked / DMA clamped)."""
    k_codes: Any   # int8 [L, P, Hkv, page, Dh]
    k_scale: Any   # f32  [L, P, Hkv, page]
    v_codes: Any
    v_scale: Any
    page_tbl: Any  # int32 [B, max_pages]
    lengths: Any   # int32 [B]

    @property
    def page_size(self) -> int:
        return self.k_codes.shape[3]

    @property
    def max_seq(self) -> int:
        return self.page_tbl.shape[1] * self.page_size


def init_paged_cache(cfg: ModelConfig, batch: int, max_seq: int,
                     n_pages: int, page: int = 128,
                     pipe: int = 1) -> PagedKVCache:
    """Pool of ``n_pages`` pages; per-slot tables sized for max_seq.
    ``n_pages`` < batch * max_seq/page oversubscribes HBM (the point).
    ``pipe``: see :func:`cache_rows` (first_k_dense x PP row padding)."""
    if cfg.is_mla:
        # paged latent pool: same zero-width V convention as init_cache
        l, d = cache_rows(cfg, pipe), cfg.mla_cache_dim
        if max_seq % page:
            raise ValueError(
                f"max_seq {max_seq} must divide by page {page}")
        cdt = _kv_dtype(cfg)
        return PagedKVCache(
            k_codes=jnp.zeros((l, n_pages, 1, page, d), cdt),
            k_scale=jnp.zeros((l, n_pages, 1, page), jnp.float32),
            v_codes=jnp.zeros((l, n_pages, 1, page, 0), cdt),
            v_scale=jnp.zeros((l, n_pages, 0, page), jnp.float32),
            page_tbl=jnp.zeros((batch, max_seq // page), jnp.int32),
            lengths=jnp.zeros((batch,), jnp.int32),
        )
    l, (hc, d) = cache_rows(cfg, pipe), _kv_code_dims(cfg)
    hs = cfg.n_kv_heads   # scales stay per REAL head
    if max_seq % page:
        raise ValueError(f"max_seq {max_seq} must divide by page {page}")
    cdt = _kv_dtype(cfg)
    return PagedKVCache(
        k_codes=jnp.zeros((l, n_pages, hc, page, d), cdt),
        k_scale=jnp.zeros((l, n_pages, hs, page), jnp.float32),
        v_codes=jnp.zeros((l, n_pages, hc, page, d), cdt),
        v_scale=jnp.zeros((l, n_pages, hs, page), jnp.float32),
        page_tbl=jnp.zeros((batch, max_seq // page), jnp.int32),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def _act_dtype(cfg: ModelConfig):
    return jnp.dtype(cfg.dtype)


def _resolve_mode(cfg: ModelConfig) -> str:
    mode = cfg.kernel_mode
    if mode == "auto":
        # pallas on real TPU backends; XLA reference elsewhere (pallas can
        # only interpret on CPU, and interpret mode is far slower than XLA).
        mode = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    return mode


def _resolve_attn_kernel(cfg: ModelConfig, b: int, s_max: int,
                         mode: str, paged: bool = False) -> str:
    """Decode-attention backend for ``attn_kernel="auto"``.

    Paged cache: always the Pallas page-table pair — the only alternative
    gathers every slot's pages into a contiguous copy per layer
    (``paged_gather``), which exists for tests/prefill, not decode.

    Contiguous cache: after the r4 batched-dot kernel rewrite
    (kernels/attention.py — 955 GB/s of cache bytes at B=48/S=1024 vs
    the old head-loop kernel's 413), the 2026-08-19 re-sweep
    (scripts/tpu_attn_compare.py) has flash beating the XLA path at
    EVERY measured shape: B=48/S=1024 1.177 vs 1.350 ms/2-layer step,
    B=8/S=1024 0.477 vs 0.590, B=32/S=2048 1.109 vs 1.838,
    B=16/S=512 0.534 vs 0.572 — the XLA path also materializes a
    per-layer cache slice from the stacked buffer (~3x bytes), so the
    old crossover carve-outs are gone. ``b``/``s_max`` stay in the
    signature for future re-sweeps on other chips.
    """
    del b
    if cfg.is_mla:
        # MLA decode is MQA over the latent with the value read being a
        # PREFIX SLICE of the key read (out = probs @ c_kv) — its own
        # Pallas pair (kernels/mla_attention.py + the mla insert). The
        # latent row is FULL-minor-dim everywhere, so the non-MLA
        # head_dim%128 insert constraint does not apply; the S%128 RMW
        # tile constraint does.
        if cfg.attn_kernel == "xla" or cfg.kv_bits != 8:
            return "xla"
        if mode not in ("pallas", "pallas_interpret"):
            return "xla"
        if mode == "pallas" and s_max % 128 != 0:
            return "xla"
        return "flash"
    if cfg.attn_kernel != "auto":
        return cfg.attn_kernel
    if mode not in ("pallas", "pallas_interpret"):
        return "xla"  # no Pallas backend to select
    if mode == "pallas" and (cfg.head_dim % 128 != 0
                             or (not paged and s_max % 128 != 0)):
        # The aliased insert kernel's RMW DMA needs a 128-lane code dim:
        # Mosaic rejects sub-128-lane HBM slices outright (measured
        # 2026-08-19: d=64 and d=32 "must be aligned to tiling"), and a
        # [.., S*d/128, 128] lane-view reshape is NOT a bitcast for
        # d<128 (the array's physical lanes are padded) — XLA relayouts
        # the whole cache per call, measured 640 ms/step at the flagship
        # shape. kv_bits=4 keeps the full head_dim lane (nibbles pack
        # across HEAD PAIRS, _kv_code_dims), so only sub-128 head_dim
        # models take the XLA path here.
        return "xla"
    del paged
    return "flash"


def _mm(cfg: ModelConfig):
    cfg = dataclasses.replace(cfg, kernel_mode=_resolve_mode(cfg))
    # lut_runtime="sel15": exact-f32 codebook table in-kernel (the slow,
    # bit-faithful mode); "word4" uses the int8-requant gather; "int8"
    # QTensors were already transcoded to linear int8 at load
    # (core.qtensor.transcode_lut_int8) and carry no lut.
    lut_exact = cfg.lut_runtime == "sel15"
    if cfg.kernel_mode == "xla":
        base = functools.partial(dequant_matmul_reference,
                                 act_quant=cfg.act_quant)
    elif cfg.kernel_mode == "pallas_interpret":
        base = functools.partial(dequant_matmul, interpret=True,
                                 act_quant=cfg.act_quant,
                                 lut_exact=lut_exact)
    else:
        base = functools.partial(dequant_matmul, act_quant=cfg.act_quant,
                                 lut_exact=lut_exact)

    xla = cfg.kernel_mode == "xla"

    def mm(x, qt, layer=None, **kw):
        # local_view: inside shard_map the leaves are per-device shards but
        # static metadata is global — rebuild it from the array shapes.
        qt = qt.local_view()
        if xla:
            if layer is not None and qt.codes.ndim == 3:
                qt = dataclasses.replace(
                    qt,
                    codes=jax.lax.dynamic_index_in_dim(
                        qt.codes, layer, 0, False),
                    scales=jax.lax.dynamic_index_in_dim(
                        qt.scales, layer, 0, False),
                    lut=(jax.lax.dynamic_index_in_dim(
                        qt.lut, layer, 0, False)
                        if qt.lut is not None and qt.lut.ndim == 2
                        else qt.lut),
                )
            return base(x, qt, **kw)
        return base(x, qt, layer, **kw)

    return mm


# ── init / quantize ─────────────────────────────────────────────────────


def _dense(rng: np.random.Generator, k: int, n: int) -> np.ndarray:
    return rng.standard_normal((k, n), dtype=np.float32) / np.sqrt(k)


def _pad_moe_down_k(w, kshards: int = 1):
    """Pad the MoE down-projection's contraction dim (per-expert
    intermediate I) up to a 1024 multiple with zero rows BEFORE
    quantization (r5). Hardware finding (2026-08-20, probes in the
    session log): the stacked int4 kernel streams K=2048-class shapes at
    532-537 GB/s at ANY stack depth, while K=1408 (V2-Lite, k_eff=704
    single-tile fallback) and K=1536 (k_eff=768, tk=384) collapse to
    73-82 GB/s at 26 stacked layers — tk=512 (k_eff % 512 == 0) is the
    fast configuration on this chip. Zero rows quantize to zero codes
    (absmax-0 groups guard to scale 1.0) and the caller zero-pads x, so
    the math is exact; DeepSeek-V3 (I=2048) and Mixtral (I=14336) need
    no padding — V2-Lite's I=1408 pays +45%% down bytes for ~6.5x the
    down-stage stream. ``kshards``: pad PER TP row-block (each shard's
    x slice must stay aligned to its own true rows — the padded local
    k is what the kernel sees, so each block pads to a 1024 multiple)."""
    k = w.shape[0]
    kb = k // kshards
    kb_pad = -(-kb // 1024) * 1024
    if kb_pad == kb:
        return w
    xp = np if isinstance(w, np.ndarray) else jnp
    blocks = xp.reshape(w, (kshards, kb) + w.shape[1:])
    blocks = xp.pad(blocks, ((0, 0), (0, kb_pad - kb), (0, 0)))
    return xp.reshape(blocks, (kshards * kb_pad,) + w.shape[1:])


def _pad_x_to_k(a, k, kshards: int = 1):
    """Zero-pad the last dim of ``a`` to ``k`` (the x side of a
    _pad_moe_down_k-padded weight; zeros meet zero rows → exact).
    Per kshards block, mirroring the weight padding."""
    if a.shape[-1] == k:
        return a
    blk = a.shape[-1] // kshards
    kb = k // kshards
    a2 = a.reshape(a.shape[:-1] + (kshards, blk))
    a2 = jnp.pad(a2, [(0, 0)] * (a.ndim - 1) + [(0, 0), (0, kb - blk)])
    return a2.reshape(a.shape[:-1] + (k,))


def _routed_buckets(e: int) -> list[int]:
    """Static hot-slot bucket ladder for routed MoE decode: doublings
    from max(8, E/8) up to E. lax.switch picks the smallest bucket
    covering the step's actual hot-expert count, so the kernel grid —
    and with it the expert bytes streamed — shrinks to within 2x of the
    true hot set (Mosaic does NOT elide the clamped cold-slot fetches
    of a full-E grid; hardware-measured 2026-08-20, routed == dense)."""
    bs, b = [], max(8, e // 8)
    while b < e:
        bs.append(b)
        b *= 2
    return bs + [e]


def _pad_vocab(n: int) -> int:
    """lm_head column padding: awkward vocab sizes (e.g. 128256) only admit
    tiny N-tiles in the matmul kernel; padding to a 4096 multiple restores
    full-width streaming for the single biggest matmul. forward() slices
    logits back to vocab_size."""
    return (n + 4095) // 4096 * 4096 if n >= 4096 else n


def _pad_cols(w, n_pad: int):
    n = w.shape[1]
    if n == n_pad:
        return w
    if isinstance(w, np.ndarray):
        return np.pad(w, ((0, 0), (0, n_pad - n)))
    return jnp.pad(w, ((0, 0), (0, n_pad - n)))


def init_params(cfg: ModelConfig, seed: int = 0, tp: int = 1) -> LlamaParams:
    """Random-init quantized params (tests / benchmarks).

    ``tp``: intended tensor-parallel degree — row-split tensors (wo, w_down)
    are int4-packed with kshards=tp, column-fused tensors are interleaved
    per shard.
    """
    rng = np.random.default_rng(seed)
    d, hd = cfg.dim, cfg.head_dim
    qd, kvd, it = cfg.n_heads * hd, cfg.n_kv_heads * hd, cfg.intermediate

    def stack(n, make):
        outs = [make(i) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def q(w, kshards=1):
        return quantize_tensor(w, bits=cfg.bits, group_size=cfg.group_size,
                               kshards=kshards, codebook=cfg.codebook)

    moe = cfg.n_experts > 0

    def make_layer(i, moe_l, inter):
        """One layer's leaves; the rng draw ORDER for non-MLA configs is
        frozen (wqkv, wo, gate_up, down, bias, q/k norms, post norms) —
        the quality gate's recorded ppl deltas are seed-exact."""
        del i
        attn = {}
        if not cfg.is_mla:
            attn["wqkv"] = q(concat_columns(
                [_dense(rng, d, qd), _dense(rng, d, kvd),
                 _dense(rng, d, kvd)], tp))
            attn["wo"] = q(_dense(rng, qd, d), kshards=tp)
        else:
            r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
            dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
            qw = cfg.q_lora_rank or cfg.n_heads * (dn + dr)
            # MLA TP packing: the q(-a) and kv_a parts interleave per
            # shard like any fused column tensor; forward's MLA branch
            # all-gathers the kv_a slice back to the full latent
            attn["wqkv"] = q(concat_columns(
                [_dense(rng, d, qw), _dense(rng, d, r + dr)], tp))
            attn["wo"] = q(_dense(rng, cfg.n_heads * dv, d), kshards=tp)
            attn["qkv_bias"] = jnp.zeros((qw + r + dr,), jnp.float32)
            attn["w_q_b"] = (q(_dense(rng, cfg.q_lora_rank,
                                      cfg.n_heads * (dn + dr)))
                             if cfg.q_lora_rank else None)
            attn["w_uk"] = jnp.asarray(rng.standard_normal(
                (cfg.n_heads, dn, r)) / np.sqrt(dn), jnp.float32)
            attn["w_uv"] = jnp.asarray(rng.standard_normal(
                (cfg.n_heads, r, dv)) / np.sqrt(r), jnp.float32)
            attn["q_a_norm"] = (jnp.asarray(
                1.0 + 0.1 * rng.standard_normal(cfg.q_lora_rank),
                jnp.float32) if cfg.q_lora_rank else None)
            attn["kv_a_norm"] = jnp.asarray(
                1.0 + 0.1 * rng.standard_normal(r), jnp.float32)
        w_gate_up = None if moe_l else q(concat_columns(
            [_dense(rng, d, inter), _dense(rng, d, inter)], tp))
        w_down = None if moe_l else q(_dense(rng, inter, d), kshards=tp)
        if not cfg.is_mla:
            attn["qkv_bias"] = (
                concat_columns(
                    [rng.standard_normal((1, qd),
                                         dtype=np.float32) * 0.02,
                     rng.standard_normal((1, kvd),
                                         dtype=np.float32) * 0.02,
                     rng.standard_normal((1, kvd),
                                         dtype=np.float32) * 0.02],
                    tp)[0]
                if cfg.qkv_bias
                else jnp.zeros((qd + 2 * kvd,), jnp.float32))
        si = cfg.n_shared_experts * inter
        return LayerParams(
            w_gate_up=w_gate_up,
            w_down=w_down,
            attn_norm=jnp.ones((d,), jnp.float32),
            mlp_norm=jnp.ones((d,), jnp.float32),
            q_norm=(jnp.asarray(
                1.0 + 0.1 * rng.standard_normal((hd,)), jnp.float32)
                if cfg.qk_norm else jnp.ones((hd,), jnp.float32)),
            k_norm=(jnp.asarray(
                1.0 + 0.1 * rng.standard_normal((hd,)), jnp.float32)
                if cfg.qk_norm else jnp.ones((hd,), jnp.float32)),
            post_attn_norm=(jnp.asarray(
                0.1 * rng.standard_normal((d,)), jnp.float32)
                if cfg.post_norms else None),
            post_mlp_norm=(jnp.asarray(
                0.1 * rng.standard_normal((d,)), jnp.float32)
                if cfg.post_norms else None),
            ws_gate_up=(q(concat_columns(
                [_dense(rng, d, si), _dense(rng, d, si)], tp))
                if moe_l and cfg.n_shared_experts else None),
            ws_down=(q(_dense(rng, si, d), kshards=tp)
                     if moe_l and cfg.n_shared_experts else None),
            router_bias=(jnp.asarray(
                rng.standard_normal(cfg.n_experts) * 0.5, jnp.float32)
                if moe_l and cfg.router_bias else None),
            **attn,
        )

    n_moe = cfg.n_layers - cfg.first_k_dense
    layers = stack(n_moe if moe else cfg.n_layers,
                   lambda i: make_layer(i, moe, it))
    layers0 = (stack(cfg.first_k_dense, lambda i: make_layer(
        i, False, cfg.dense_intermediate or it))
        if cfg.first_k_dense else None)
    if moe:
        # expert-major [E, L, ...] stacking: see LayerParams.we_gate_up
        def estack(make):
            rows = [
                jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[make() for _ in range(n_moe)])
                for _ in range(cfg.n_experts)
            ]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *rows)
        layers = dataclasses.replace(
            layers,
            router=jnp.asarray(
                rng.standard_normal(
                    (n_moe, d, cfg.n_experts)) * 0.5,
                jnp.float32),
            we_gate_up=estack(lambda: q(concat_columns(
                [_dense(rng, d, it), _dense(rng, d, it)], tp))),
            we_down=estack(lambda: q(_pad_moe_down_k(
                _dense(rng, it, d), tp), kshards=tp)),
        )
    return LlamaParams(
        layers0=layers0,
        embed=_make_embed(
            rng.standard_normal((cfg.vocab_size, d), dtype=np.float32) * 0.02,
            cfg,
        ),
        layers=layers,
        final_norm=jnp.ones((d,), jnp.float32),
        lm_head=q(_pad_cols(_dense(rng, d, cfg.vocab_size),
                          _pad_vocab(cfg.vocab_size))),
    )


def init_params_device(cfg: ModelConfig, seed: int = 0,
                       tp: int = 1) -> LlamaParams:
    """Random-init quantized params ON DEVICE (pure jnp).

    Benchmarks on the axon relay need this: host→device uploads run at
    ~MB/s, so multi-GB models must be generated and quantized in HBM.
    Identical structure to :func:`init_params` (weights differ — jax PRNG).
    """
    from quant_tpu.core.qtensor import quantize_tensor_device

    d, hd = cfg.dim, cfg.head_dim
    qd, kvd, it = cfg.n_heads * hd, cfg.n_kv_heads * hd, cfg.intermediate
    key = jax.random.key(seed)

    def dense(key, k, n):
        return jax.random.normal(key, (k, n), jnp.float32) / np.sqrt(k)

    def cat(keys_dims, kshards=1):
        parts = [dense(kk, d0, n0) for kk, (d0, n0) in keys_dims]
        if tp == 1:
            return jnp.concatenate(parts, axis=1)
        chunks = []
        for s in range(tp):
            for p in parts:
                wdt = p.shape[1] // tp
                chunks.append(p[:, s * wdt:(s + 1) * wdt])
        return jnp.concatenate(chunks, axis=1)

    qz = functools.partial(quantize_tensor_device, bits=cfg.bits,
                           group_size=cfg.group_size,
                           codebook=cfg.codebook)

    @functools.partial(jax.jit, static_argnames=("inter", "shared"))
    def make_layer(key, inter=it, shared=0):
        ks = jax.random.split(key, 12)
        if cfg.is_mla:
            r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
            dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
            qw = cfg.q_lora_rank or cfg.n_heads * (dn + dr)
            attn = dict(
                wqkv=qz(cat([(ks[0], (d, qw)), (ks[1], (d, r + dr))])),
                wo=qz(dense(ks[3], cfg.n_heads * dv, d), kshards=tp),
                qkv_bias=jnp.zeros((qw + r + dr,), jnp.float32),
                w_q_b=(qz(dense(ks[2], cfg.q_lora_rank,
                                cfg.n_heads * (dn + dr)))
                       if cfg.q_lora_rank else None),
                w_uk=jax.random.normal(
                    ks[7], (cfg.n_heads, dn, r),
                    jnp.float32) / np.sqrt(dn),
                w_uv=jax.random.normal(
                    ks[8], (cfg.n_heads, r, dv),
                    jnp.float32) / np.sqrt(r),
                q_a_norm=(jnp.ones((cfg.q_lora_rank,), jnp.float32)
                          if cfg.q_lora_rank else None),
                kv_a_norm=jnp.ones((r,), jnp.float32),
            )
        else:
            attn = dict(
                wqkv=qz(cat([(ks[0], (d, qd)), (ks[1], (d, kvd)),
                             (ks[2], (d, kvd))])),
                wo=qz(dense(ks[3], qd, d), kshards=tp),
                qkv_bias=jnp.zeros((qd + 2 * kvd,), jnp.float32),
            )
        si = shared * inter
        return LayerParams(
            w_gate_up=(None if cfg.n_experts and not inter else
                       qz(cat([(ks[4], (d, inter)),
                               (ks[5], (d, inter))]))),
            w_down=(None if cfg.n_experts and not inter else
                    qz(dense(ks[6], inter, d), kshards=tp)),
            attn_norm=jnp.ones((d,), jnp.float32),
            mlp_norm=jnp.ones((d,), jnp.float32),
            q_norm=jnp.ones((hd,), jnp.float32),
            k_norm=jnp.ones((hd,), jnp.float32),
            post_attn_norm=(jnp.ones((d,), jnp.float32)
                            if cfg.post_norms else None),
            post_mlp_norm=(jnp.ones((d,), jnp.float32)
                           if cfg.post_norms else None),
            ws_gate_up=(qz(cat([(ks[9], (d, si)), (ks[10], (d, si))]))
                        if si else None),
            ws_down=(qz(dense(ks[11], si, d), kshards=tp)
                     if si else None),
            **attn,
        )

    k0 = cfg.first_k_dense
    n_moe = cfg.n_layers - k0
    lkeys = jax.random.split(key, cfg.n_layers + 3)
    layers = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[make_layer(lkeys[k0 + i],
                     shared=cfg.n_shared_experts if cfg.n_experts else 0)
          for i in range(n_moe)],
    )
    layers0 = None
    if k0:
        layers0 = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[make_layer(lkeys[i], inter=cfg.dense_intermediate or it)
              for i in range(k0)],
        )
    if cfg.n_experts:
        @jax.jit
        def make_expert(key):
            ks = jax.random.split(key, 3)
            return (qz(cat([(ks[0], (d, it)), (ks[1], (d, it))])),
                    qz(_pad_moe_down_k(dense(ks[2], it, d), tp),
                       kshards=tp))

        ekeys = jax.random.split(
            jax.random.fold_in(key, 7), cfg.n_experts * n_moe)

        # Fill preallocated [E, L, ...] buffers with DONATED in-place
        # row updates: accumulating all per-expert stacks then stacking
        # across E holds the expert weights TWICE transiently — at
        # DeepSeek-V2-Lite scale that is ~2x 7 GB and OOMs the chip
        # (measured 2026-08-20); peak is now weights + one expert row.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def _set_row(buf, val, e):
            return buf.at[e].set(val)

        def erow(e):
            row = [make_expert(ekeys[e * n_moe + i])
                   for i in range(n_moe)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *row)

        row0 = erow(0)
        bufs = jax.tree.map(
            lambda a: jnp.zeros((cfg.n_experts,) + a.shape, a.dtype),
            row0)
        bufs = jax.tree.map(
            lambda b, v: _set_row(b, v, jnp.int32(0)), bufs, row0)
        del row0
        for e in range(1, cfg.n_experts):
            rowe = erow(e)
            bufs = jax.tree.map(
                lambda b, v: _set_row(b, v, jnp.int32(e)), bufs, rowe)
            del rowe
        wgu, wdn = bufs
        layers = dataclasses.replace(
            layers,
            router=0.5 * jax.random.normal(
                jax.random.fold_in(key, 8),
                (n_moe, d, cfg.n_experts), jnp.float32),
            router_bias=(0.5 * jax.random.normal(
                jax.random.fold_in(key, 9),
                (n_moe, cfg.n_experts), jnp.float32)
                if cfg.router_bias else None),
            we_gate_up=wgu, we_down=wdn,
            w_gate_up=None, w_down=None,
        )
    return LlamaParams(
        layers0=layers0,
        embed=_make_embed(
            jax.random.normal(lkeys[-1], (cfg.vocab_size, d), jnp.float32)
            * 0.02, cfg,
        ),
        layers=layers,
        final_norm=jnp.ones((d,), jnp.float32),
        lm_head=quantize_tensor_device(
            _pad_cols(dense(lkeys[-2], d, cfg.vocab_size),
                      _pad_vocab(cfg.vocab_size)),
            cfg.bits, cfg.group_size, codebook=cfg.codebook,
        ),
    )


def quantize_dense_params(
    dense: dict, cfg: ModelConfig, tp: int = 1
) -> LlamaParams:
    """Build LlamaParams from a dict of dense numpy weights.

    Expected keys: embed [V,D], final_norm [D], lm_head [D,V], and per layer
    i: layers.i.{wq,wk,wv,wo,w_gate,w_up,w_down} as [K,N] float arrays plus
    layers.i.{attn_norm,mlp_norm} [D]. MoE configs (cfg.n_experts>0)
    instead expect layers.i.router [D,E] and per expert e:
    layers.i.expert{e}.{w_gate,w_up,w_down}. ``tp``: row-split tensors
    (wo, w_down) are packed with kshards=tp for tensor-parallel row
    sharding.
    """
    def qz(w, kshards=1):
        return quantize_tensor(np.asarray(w), cfg.bits, cfg.group_size,
                               kshards=kshards, codebook=cfg.codebook)

    if cfg.is_mla:
        raise NotImplementedError(
            "MLA checkpoints load through checkpoint.hf.convert_hf_llama "
            "(DeepseekV2/V3 tensor names) or init_params; the generic "
            "dense-dict layout has no [q|kv_a]/kv_b naming")
    moe = cfg.n_experts > 0
    per_layer = []
    for i in range(cfg.n_layers):
        g = lambda name: np.asarray(dense[f"layers.{i}.{name}"], np.float32)
        per_layer.append(LayerParams(
            wqkv=qz(concat_columns([g("wq"), g("wk"), g("wv")], tp)),
            wo=qz(g("wo"), tp),
            w_gate_up=None if moe else qz(
                concat_columns([g("w_gate"), g("w_up")], tp)),
            w_down=None if moe else qz(g("w_down"), tp),
            router=jnp.asarray(g("router"), jnp.float32) if moe else None,
            attn_norm=jnp.asarray(g("attn_norm"), jnp.float32),
            mlp_norm=jnp.asarray(g("mlp_norm"), jnp.float32),
            qkv_bias=jnp.asarray(
                concat_columns(
                    [g("q_bias")[None, :], g("k_bias")[None, :],
                     g("v_bias")[None, :]], tp)[0]
                if f"layers.{i}.q_bias" in dense
                else np.zeros(
                    (dense[f"layers.{i}.wq"].shape[1]
                     + 2 * dense[f"layers.{i}.wk"].shape[1],), np.float32),
                jnp.float32,
            ),
            q_norm=jnp.asarray(
                g("q_norm") if f"layers.{i}.q_norm" in dense
                else np.ones((cfg.head_dim,), np.float32), jnp.float32),
            k_norm=jnp.asarray(
                g("k_norm") if f"layers.{i}.k_norm" in dense
                else np.ones((cfg.head_dim,), np.float32), jnp.float32),
            post_attn_norm=(jnp.asarray(g("post_attn_norm"), jnp.float32)
                            if cfg.post_norms else None),
            post_mlp_norm=(jnp.asarray(g("post_mlp_norm"), jnp.float32)
                           if cfg.post_norms else None),
        ))
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    if moe:
        def estack(names_fn):
            per_e = []
            for e in range(cfg.n_experts):
                row = [names_fn(e, i) for i in range(cfg.n_layers)]
                per_e.append(jax.tree.map(
                    lambda *xs: jnp.stack(xs), *row))
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per_e)

        def ge(e, i, name):
            return np.asarray(
                dense[f"layers.{i}.expert{e}.{name}"], np.float32)

        layers = dataclasses.replace(
            layers,
            we_gate_up=estack(lambda e, i: qz(concat_columns(
                [ge(e, i, "w_gate"), ge(e, i, "w_up")], tp))),
            we_down=estack(lambda e, i: qz(
                _pad_moe_down_k(ge(e, i, "w_down"), tp), tp)),
        )
    return LlamaParams(
        embed=_make_embed(np.asarray(dense["embed"], np.float32), cfg),
        layers=layers,
        final_norm=jnp.asarray(dense["final_norm"], jnp.float32),
        lm_head=qz(_pad_cols(np.asarray(dense["lm_head"],
                                        np.float32),
                             _pad_vocab(cfg.vocab_size))),
    )


# ── math blocks ─────────────────────────────────────────────────────────


def layer_windows(cfg: ModelConfig) -> jax.Array:
    """Per-layer attention window sizes [L] int32 (0 = full causal).

    Encodes ``cfg.sliding_pattern`` (Gemma-2 local/global alternation:
    layer i is global iff (i+1) % pattern == 0); with pattern=0 every
    layer gets ``cfg.sliding_window`` (Mistral). Threaded through the
    layer scan as an xs leaf so the alternation stays one trace."""
    p = cfg.sliding_pattern
    return jnp.asarray(
        [0 if (p and (i + 1) % p == 0) else cfg.sliding_window
         for i in range(cfg.n_layers)], jnp.int32)


def _q_scale(cfg, dh: int) -> float:
    """Attention score scale: 1/sqrt(query_pre_attn_scalar or head_dim).

    ``score_mscale`` (DeepseekV3 yarn): the scale additionally carries
    yarn_mscale(factor, mscale_all_dim)^2 — matches HF DeepseekV3Attention
    (HF DeepseekV2 does not apply it)."""
    s = cfg.query_pre_attn_scalar if (
        cfg is not None and cfg.query_pre_attn_scalar) else dh
    scale = 1.0 / np.sqrt(s)
    if cfg is not None and cfg.score_mscale:
        m = _yarn_mscale(cfg.rope_factor, cfg.rope_mscale_all_dim or 1.0)
        scale *= m * m
    return float(scale)


def _softcap_scores(logits, cfg):
    """Gemma-2 tanh softcapping on attention scores; must run BEFORE the
    causal mask (tanh would saturate the -1e30 mask values to -cap)."""
    if cfg is not None and cfg.attn_softcap:
        cap = cfg.attn_softcap
        logits = cap * jnp.tanh(logits / cap)
    return logits


def rmsnorm(x, w, eps, offset: float = 0.0):
    """``offset``: Gemma stores norm weights as deltas from 1 — the applied
    gain is ``offset + w`` (0 for the Llama/Qwen families)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * (offset + w)).astype(x.dtype)


def _act(cfg: ModelConfig):
    """Gate activation for the GLU MLP (computed in f32)."""
    if cfg.act_fn == "gelu_tanh":
        return functools.partial(jax.nn.gelu, approximate=True)
    return jax.nn.silu


def _merge_experts(qt: QTensor) -> QTensor:
    """[E, L, ...] expert-major stack → [E*L, ...] for the stacked-kernel
    index maps (slice e*L+layer). A leading-dims reshape is layout-free;
    the 4-D form exists so PartitionSpecs can shard experts (dim 0, EP)
    and layers (dim 1, PP) independently."""
    return dataclasses.replace(
        qt,
        codes=qt.codes.reshape((-1,) + qt.codes.shape[2:]),
        scales=qt.scales.reshape((-1,) + qt.scales.shape[2:]),
    )


def moe_route(x, router, cfg: ModelConfig, bias=None):
    """Routing weights [B, T, E]: score all experts, keep the top
    ``experts_per_token``, zero the rest, renormalize if ``norm_topk``
    (Mixtral semantics — HF MixtralSparseMoeBlock order).

    DeepSeek extensions (exact HF DeepseekV2MoEGate / DeepseekV3TopkRouter
    order):
    * ``score_fn="sigmoid"`` (V3) scores with sigmoid instead of softmax.
    * ``bias`` (V3 e_score_correction_bias [E]) is added to the scores
      for SELECTION only — the combine weights gather UNBIASED scores.
    * group-limited routing (``n_expert_groups``): experts split into G
      contiguous groups; group score = max (V2 group_limited_greedy) or
      top-2 sum (V3 noaux_tc) of member SELECTION scores; experts outside
      the best ``topk_groups`` groups have their selection score zeroed
      (HF masked_fill 0.0 — NOT -inf — replicated exactly).
    * ``routed_scaling`` multiplies the final kept weights.
    """
    logits = x.astype(jnp.float32) @ router.astype(jnp.float32)
    if cfg.score_fn == "sigmoid":
        probs = jax.nn.sigmoid(logits)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    sel = probs if bias is None else probs + bias
    if cfg.n_expert_groups:
        g = cfg.n_expert_groups
        gsel = sel.reshape(*sel.shape[:-1], g, cfg.n_experts // g)
        if cfg.group_score == "top2sum":
            top2, _ = jax.lax.top_k(gsel, 2)
            gscore = jnp.sum(top2, axis=-1)
        else:
            gscore = jnp.max(gsel, axis=-1)
        _, gi = jax.lax.top_k(gscore, cfg.topk_groups)
        gmask = jnp.sum(jax.nn.one_hot(gi, g, dtype=sel.dtype), axis=-2)
        sel = jnp.where(gmask[..., None] > 0, gsel, 0.0).reshape(sel.shape)
    _, top_i = jax.lax.top_k(sel, cfg.experts_per_token)
    mask = jnp.sum(
        jax.nn.one_hot(top_i, cfg.n_experts, dtype=probs.dtype), axis=-2)
    w = probs * mask
    if cfg.norm_topk:
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)
    return w * cfg.routed_scaling


def mlp_block(x, layers, idx, cfg, mm, dt, axis=None, router=None,
              expert_axis=None, lora=None, adapter_ids=None,
              router_bias=None):
    """MLP residual delta in f32, psum'd over the given mesh axes.

    Dense (n_experts=0): fused gate|up column matmul + row-split down,
    psum over ``axis`` (TP).

    MoE (n_experts>0, Mixtral family): EVERY local expert runs densely on
    every token and outputs combine with the top-k routing weights (zeros
    for unrouted pairs). TPU-first rationale: static shapes (no
    sort/scatter/capacity drops — bit-exact routing), and at decode batch
    sizes the step is weight-HBM-bound, where dense-all-experts is
    OPTIMAL — each expert's packed codes stream once per step, exactly
    what routed dispatch also costs once B >= n_experts; the surplus is
    idle-MXU FLOPs only. (Prefill pays real extra FLOPs ~E/k; a
    capacity-based dispatch path can slot in here later if MoE prefill
    throughput ever matters.) Under ``expert_axis`` each shard computes
    its contiguous expert slice and the combine psums over
    (expert, model) in one collective.
    """
    if not cfg.n_experts:
        gu = mm(x, layers.w_gate_up, idx)
        if lora is not None:
            from quant_tpu.models.lora import lora_delta
            gu = gu + lora_delta(x, lora.a_gu, lora.b_gu, idx,
                                 adapter_ids).astype(gu.dtype)
        gate, up = jnp.split(gu, 2, axis=-1)
        a_in = _act(cfg)(gate.astype(jnp.float32)).astype(dt) * up
        out = mm(a_in, layers.w_down, idx, out_dtype=jnp.float32)
        if lora is not None:
            from quant_tpu.models.lora import lora_delta
            out = out + lora_delta(a_in, lora.a_down, lora.b_down, idx,
                                   adapter_ids)
        return jax.lax.psum(out, axis) if axis else out

    # DeepSeek shared expert(s): one always-on dense GLU added to the
    # routed combination. TP-sharded like the dense MLP (column gate|up,
    # row down) but REPLICATED over the expert axis, so its partial sums
    # join the TP psum only — psumming it over expert_axis would
    # multiply the shared output by the EP degree.
    shared = None
    if cfg.n_shared_experts:
        sgu = mm(x, layers.ws_gate_up, idx)
        sg, su = jnp.split(sgu, 2, axis=-1)
        s_in = _act(cfg)(sg.astype(jnp.float32)).astype(dt) * su
        shared = mm(s_in, layers.ws_down, idx, out_dtype=jnp.float32)
        if axis:
            shared = jax.lax.psum(shared, axis)

    w = moe_route(x, router, cfg, bias=router_bias)    # [B, T, E]
    wgu = _merge_experts(layers.we_gate_up.local_view())
    wdn = _merge_experts(layers.we_down.local_view())
    l_stack = layers.attn_norm.shape[0]                # shard-local L
    e_loc = wgu.codes.shape[0] // l_stack              # shard-local E
    if expert_axis is not None:
        e0 = jax.lax.axis_index(expert_axis) * e_loc
        w = jax.lax.dynamic_slice_in_dim(w, e0, e_loc, axis=-1)
    axes = tuple(a for a in (axis, expert_axis) if a)
    # capacity dispatch (opt-in drop semantics) applies to prefill AND
    # — r5 — high-batch decode: past tokens*k >= 2E the dense
    # all-experts matmul is COMPUTE-bound (B=128 at V3 geometry = a
    # 14.7 ms/layer MXU floor for 16x the routed FLOPs), so gathering
    # the routed rows wins there too. Below the threshold decode stays
    # on the exact dense/routed-bucket paths.
    if (cfg.moe_prefill == "capacity"
            and int(np.prod(x.shape[:-1])) * cfg.experts_per_token
            >= 2 * cfg.n_experts):
        routed = _moe_capacity(x, w, wgu, wdn, e_loc, l_stack, idx, cfg,
                               mm, dt, axes)
        return routed if shared is None else routed + shared
    # Zero-routed-expert skip, gated STATICALLY on token count: with few
    # tokens the lax.cond's false branch never touches an unrouted
    # expert's packed codes, so HBM reads drop from E experts to the
    # routed set — measured 1.8x on single-stream decode (B=1: 1.47 vs
    # 2.70 ms/step, Mixtral-geometry slice). But the conditionals also
    # SERIALIZE the expert weight streams, so with every expert hot the
    # same slice ran 3.92 vs 2.70 ms — hence skip only while the token
    # count keeps the expected hit-rate low (tokens*k*2 <= E: B<=2 for
    # Mixtral 8x2), where the byte savings dominate the serialization.
    n_tok = int(np.prod(x.shape[:-1]))
    use_cond = n_tok * cfg.experts_per_token * 2 <= cfg.n_experts
    mode = _resolve_mode(cfg)
    if (cfg.moe_fused and not use_cond
            and mode in ("pallas", "pallas_interpret")):
        # Fused all-experts path: the per-expert loop launches 2*E
        # kernels per layer — at DeepSeek-V2-Lite scale (64 experts x 27
        # layers = 3456 launches/step) issue+launch latency caps the
        # full decode at ~210 GB/s effective vs ~600 for the dense
        # flagship (hardware, 2026-08-20). ONE launch computes every
        # expert's gate|up (experts ride the parallel N grid) and ONE
        # accumulates the routed down combine (experts ride the
        # sequential K grid); routing weights fold into the down input.
        from quant_tpu.kernels.dequant_matmul import (
            _Untileable, dequant_matmul_moe,
        )
        interp = mode == "pallas_interpret"
        # Routed decode (r5, VERDICT r4 #7): when the expected hot-
        # expert coverage is materially below 1 (E >> tokens*k regime,
        # DeepSeek-V3 E=256 at small decode batches), stream only the
        # experts some token actually routed to. A compacted hot-expert
        # list rides scalar prefetch and the kernel runs with a BUCKETED
        # static slot count (E/8, E/4, E/2, E — lax.switch picks the
        # smallest bucket covering the actual hot count): the grid
        # itself shrinks, so cold experts' packed bytes never enter the
        # DMA schedule. (The earlier clamp-only design kept the full-E
        # grid and relied on Mosaic eliding the repeated cold-slot
        # fetches — hardware-measured 2026-08-20 at V3 geometry it
        # elides NOTHING: routed == dense +-1% at every batch. Slots
        # between n_hot and the bucket still clamp, but now waste at
        # most the bucket rounding, < 2x the true hot bytes.) Tail
        # outputs are zero-gated, so the math stays exact. Dense stays
        # when nearly everything is expected hot and for prefill.
        exp_hot = 1.0 - (1.0 - cfg.experts_per_token / cfg.n_experts
                         ) ** n_tok
        routed = (not use_cond and x.shape[-2] == 1
                  and (cfg.moe_routed == "on"
                       or (cfg.moe_routed == "auto" and exp_hot < 0.875)))
        if routed:
            any_e = jnp.any(w > 0, axis=tuple(range(w.ndim - 1)))
            n_hot = jnp.sum(any_e.astype(jnp.int32))
            order = jnp.argsort(jnp.logical_not(any_e),
                                stable=True).astype(jnp.int32)
            hotc = order[jnp.minimum(jnp.arange(e_loc),
                                     jnp.maximum(n_hot - 1, 0))]

        def _fused(ns):
            # ns = static hot-slot bucket; None = dense all-experts
            if ns is None:
                hot_b, w_b, ns = None, w, e_loc
            else:
                hot_b = jnp.concatenate([n_hot[None], hotc[:ns]])
                # routing weights in hot-slot order; zero the tail
                w_b = (jnp.take(w, hotc[:ns], axis=-1)
                       * (jnp.arange(ns) < n_hot))
            gu_all = dequant_matmul_moe(
                x, wgu, idx, n_experts=ns, stride=l_stack,
                mode="concat", interpret=interp,
                act_quant=cfg.act_quant, hot=hot_b)  # [B, T, ns*2I']
            b_, t_ = x.shape[0], x.shape[1]
            gu_all = gu_all.reshape(b_, t_, ns, -1)
            gate, up = jnp.split(gu_all, 2, axis=-1)
            a = _act(cfg)(gate.astype(jnp.float32)).astype(dt) * up
            a = a * w_b.astype(dt)[..., None]      # routing weights
            a = _pad_x_to_k(a, wdn.k, wdn.kshards)  # K-padded down
            xs = jnp.moveaxis(a, 2, 0)             # [ns, B, T, I']
            # "psum": experts on the parallel grid, per-expert x rows,
            # XLA sums the slots — the sequential "sum" chain measured
            # 187->80 GB/s (L=8->26) vs 532-672 on the parallel grid
            return dequant_matmul_moe(
                xs, wdn, idx, n_experts=ns, stride=l_stack,
                mode="psum", interpret=interp, out_dtype=jnp.float32,
                act_quant=cfg.act_quant, hot=hot_b)  # [B, T, D]

        try:
            if routed:
                buckets = _routed_buckets(e_loc)
                bidx = sum((n_hot > b).astype(jnp.int32)
                           for b in buckets[:-1]) if len(buckets) > 1 \
                    else 0
                out = jax.lax.switch(
                    bidx, [functools.partial(_fused, b) for b in buckets])
            else:
                out = _fused(None)
            out = jax.lax.psum(out, axes) if axes else out
            return out if shared is None else out + shared
        except _Untileable:
            pass  # awkward shapes: the per-expert loop below handles it
    out = jnp.zeros(x.shape[:-1] + (wdn.n,), jnp.float32)
    for e in range(e_loc):
        eidx = e * l_stack + idx
        we = w[..., e:e + 1]

        def _expert(x, we, eidx=eidx):
            gu = mm(x, wgu, eidx)
            gate, up = jnp.split(gu, 2, axis=-1)
            a_e = _act(cfg)(gate.astype(jnp.float32)).astype(dt) * up
            y = mm(_pad_x_to_k(a_e, wdn.k, wdn.kshards), wdn, eidx,
                   out_dtype=jnp.float32)
            return y * we

        if use_cond:
            out = out + jax.lax.cond(
                jnp.any(we > 0), _expert,
                lambda x, we: jnp.zeros(
                    x.shape[:-1] + (wdn.n,), jnp.float32),
                x, we)
        else:
            out = out + _expert(x, we)
    out = jax.lax.psum(out, axes) if axes else out
    return out if shared is None else out + shared


def _moe_capacity(x, w, wgu, wdn, e_loc, l_stack, idx, cfg, mm, dt, axes):
    """GShard-style fixed-capacity MoE dispatch (cfg.moe_prefill =
    "capacity"; prefill, and — r5 — high-batch decode past the same
    tokens*k >= 2E threshold). Per expert: gather the first C routed
    tokens (C = ceil(N*k/E * capacity_factor), sublane-aligned), run
    the expert on [C, D], scatter-add the weighted output. FLOPs drop
    from N*E to N*k*cf expert-rows (dense all-experts decode at
    DeepSeek-V3 geometry is COMPUTE-bound from B~64: 2.9 PFLOP/layer at
    B=128 = a 14.7 ms MXU floor, hardware 2026-08-21); tokens beyond an
    expert's capacity lose that expert's contribution (standard
    capacity-drop semantics — the reason this mode is opt-in).

    The dispatch is ONE fused grouped-GEMM pair when the shapes tile
    (dequant_matmul_moe mode="grouped": per-expert [C, D] blocks
    against the stacked weights in one launch — the per-expert loop
    pays 2*E launches/layer, the very pattern measured launch-bound on
    this chip), with the loop as fallback. Composes with EP/TP: the
    gather/scatter are per LOCAL expert and the combine psums over
    (expert, model).
    """
    b, t, d = x.shape
    n = b * t
    x2 = x.reshape(n, d)
    w2 = w.reshape(n, e_loc)
    cap = int(np.ceil(n * cfg.experts_per_token / cfg.n_experts
                      * cfg.moe_capacity_factor))
    cap = min(max(8, -(-cap // 8) * 8), n)
    mode = _resolve_mode(cfg)
    if cfg.moe_fused and mode in ("pallas", "pallas_interpret"):
        from quant_tpu.kernels.dequant_matmul import (
            _Untileable, dequant_matmul_moe,
        )
        try:
            # vectorized slotting: rank each token among its expert's
            # routed tokens; rank >= cap drops (slot cap scatters into
            # a spare column that is sliced away)
            sel = w2 > 0                                     # [N, E]
            pos = jnp.cumsum(sel.astype(jnp.int32), axis=0) - 1
            slot = jnp.where(sel & (pos < cap), pos, cap).T  # [E, N]
            erows = jnp.arange(e_loc, dtype=jnp.int32)[:, None]
            st = jnp.zeros((e_loc, cap + 1), jnp.int32).at[
                erows, slot].set(
                jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                                 (e_loc, n)), mode="drop")[:, :cap]
            sw = jnp.zeros((e_loc, cap + 1), jnp.float32).at[
                erows, slot].set(w2.T, mode="drop")[:, :cap]
            interp = mode == "pallas_interpret"
            xs = x2[st].astype(dt)                       # [E, C, D]
            gu = dequant_matmul_moe(
                xs, wgu, idx, n_experts=e_loc, stride=l_stack,
                mode="grouped", interpret=interp,
                act_quant=cfg.act_quant)                 # [E, C, 2I]
            gate, up = jnp.split(gu, 2, axis=-1)
            a = _act(cfg)(gate.astype(jnp.float32)).astype(dt) * up
            a = _pad_x_to_k(a, wdn.k, wdn.kshards)
            y = dequant_matmul_moe(
                a, wdn, idx, n_experts=e_loc, stride=l_stack,
                mode="grouped", interpret=interp,
                out_dtype=jnp.float32,
                act_quant=cfg.act_quant)                 # [E, C, D]
            # unused slots carry sw=0 (scatter-add 0 to token 0)
            out = jnp.zeros((n, wdn.n), jnp.float32).at[
                st.reshape(-1)].add(
                y.reshape(e_loc * cap, -1) * sw.reshape(-1, 1))
            out = out.reshape(b, t, -1)
            return jax.lax.psum(out, axes) if axes else out
        except _Untileable:
            pass
    out = jnp.zeros((n, wdn.n), jnp.float32)
    for e in range(e_loc):
        we = w2[:, e]                                  # [N]
        sel = we > 0
        pos = jnp.cumsum(sel.astype(jnp.int32)) - 1    # rank among routed
        slot = jnp.where(sel & (pos < cap), pos, cap)  # cap → dropped
        slot_tok = jnp.zeros((cap,), jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        slot_w = jnp.zeros((cap,), jnp.float32).at[slot].set(
            we, mode="drop")
        eidx = e * l_stack + idx
        gu = mm(x2[slot_tok], wgu, eidx)               # [C, 2I]
        gate, up = jnp.split(gu, 2, axis=-1)
        a_e = _act(cfg)(gate.astype(jnp.float32)).astype(dt) * up
        ye = mm(_pad_x_to_k(a_e, wdn.k, wdn.kshards), wdn, eidx,
                out_dtype=jnp.float32)
        # unused slots carry slot_w=0 (scatter-adds 0 to token 0)
        out = out.at[slot_tok].add(ye * slot_w[:, None])
    out = out.reshape(b, t, -1)
    return jax.lax.psum(out, axes) if axes else out


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * float(np.log(scale)) + 1.0


def yarn_attention_factor(cfg: ModelConfig) -> float:
    """The cos/sin multiplier of HF's yarn rope (attention_scaling):
    explicit rope_attn_factor, or the mscale ratio, or mscale(factor)."""
    if cfg.rope_attn_factor:
        return cfg.rope_attn_factor
    if cfg.rope_mscale and cfg.rope_mscale_all_dim:
        return (_yarn_mscale(cfg.rope_factor, cfg.rope_mscale)
                / _yarn_mscale(cfg.rope_factor, cfg.rope_mscale_all_dim))
    return _yarn_mscale(cfg.rope_factor)


def _yarn_freqs(theta: float, half: int, cfg: ModelConfig) -> np.ndarray:
    """Yarn NTK-by-parts inverse frequencies (HF _compute_yarn_parameters
    semantics, truncate=True): interpolated (freq/factor) below beta_slow
    rotations at the original context, extrapolated (unscaled) above
    beta_fast, with a linear per-dim ramp between."""
    dim = 2 * half
    base = theta
    pos_freqs = base ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
    inv_extra = 1.0 / pos_freqs
    inv_inter = 1.0 / (cfg.rope_factor * pos_freqs)

    def corr_dim(n_rot):
        return (dim * np.log(cfg.rope_orig_max_pos
                             / (n_rot * 2 * np.pi))) / (2 * np.log(base))

    low = max(np.floor(corr_dim(cfg.rope_beta_fast)), 0)
    high = min(np.ceil(corr_dim(cfg.rope_beta_slow)), dim - 1)
    if low == high:
        high += 0.001
    ramp = np.clip((np.arange(half, dtype=np.float32) - low)
                   / (high - low), 0, 1)
    extra_w = 1.0 - ramp
    return (inv_inter * (1.0 - extra_w)
            + inv_extra * extra_w).astype(np.float32)


def _rope_freqs(theta: float, half: int, cfg: ModelConfig | None):
    """Inverse frequencies [half], with the config's long-context
    scaling applied (mirrors HF's ROPE_INIT_FUNCTIONS semantics)."""
    freqs = theta ** (-np.arange(0, half, dtype=np.float32) / half)
    if cfg is None or cfg.rope_scaling == "none":
        return jnp.asarray(freqs)
    if cfg.rope_scaling == "linear":
        return jnp.asarray(freqs / cfg.rope_factor)
    if cfg.rope_scaling == "yarn":
        return jnp.asarray(_yarn_freqs(theta, half, cfg))
    # "llama3" NTK-by-parts (Llama-3.1/3.2): scale low-frequency bands
    # by 1/factor, keep high-frequency bands, smooth ramp between
    factor = cfg.rope_factor
    low_wl = cfg.rope_orig_max_pos / cfg.rope_low_freq_factor
    high_wl = cfg.rope_orig_max_pos / cfg.rope_high_freq_factor
    wavelen = 2.0 * np.pi / freqs
    scaled = np.where(wavelen > low_wl, freqs / factor, freqs)
    smooth = ((cfg.rope_orig_max_pos / wavelen
               - cfg.rope_low_freq_factor)
              / (cfg.rope_high_freq_factor - cfg.rope_low_freq_factor))
    smoothed = (1.0 - smooth) / factor * freqs + smooth * freqs
    medium = (wavelen >= high_wl) & (wavelen <= low_wl)
    return jnp.asarray(np.where(medium, smoothed, scaled)
                       .astype(np.float32))


def _layer_theta(cfg: ModelConfig, window):
    """Per-layer traced (theta, freq_divisor) for rope_local_theta
    models (Gemma-3): sliding layers (window > 0) use the local base
    unscaled; global layers use rope_theta with the linear factor.
    None when the model has a uniform rope base."""
    if cfg is None or not cfg.rope_local_theta:
        return None
    local = window > 0
    th = jnp.where(local, cfg.rope_local_theta, cfg.rope_theta)
    div = jnp.where(
        local, 1.0,
        cfg.rope_factor if cfg.rope_scaling == "linear" else 1.0)
    return th, div


def _deinterleave(x):
    """[..., d] with INTERLEAVED rotary pairs → [evens | odds].

    DeepSeek rotates (x[2i], x[2i+1]) pairs (HF DeepseekV2 complex rope /
    DeepseekV3 rope_interleave). De-interleaving then applying rotate-half
    RoPE rotates exactly the same pairs with the same frequencies; the
    output is a fixed permutation of HF's, applied identically to q and
    k, so attention scores (and therefore the model) are unchanged —
    matches HF's own apply_rotary_pos_emb_interleave transform."""
    *s, d = x.shape
    y = x.reshape(*s, d // 2, 2)
    return jnp.moveaxis(y, -1, -2).reshape(*s, d)


def _rope(x, positions, theta, cfg: ModelConfig | None = None,
          theta_override=None):
    """Rotate-half RoPE. x [B, T, H, Dh], positions [B, T] int32.
    ``cfg`` applies its rope_scaling (None → plain RoPE) and
    rope_interleaved pair layout; ``theta_override`` = (traced theta,
    freq divisor) from :func:`_layer_theta` for per-layer rope bases."""
    if cfg is not None and cfg.rope_interleaved:
        x = _deinterleave(x)
    b, t, h, dh = x.shape
    half = dh // 2
    if theta_override is not None:
        th, div = theta_override
        freqs = th ** (-jnp.arange(0, half, dtype=jnp.float32)
                       / half) / div
    else:
        freqs = _rope_freqs(theta, half, cfg)
    ang = positions[:, :, None].astype(jnp.float32) * freqs  # [B, T, half]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    if (cfg is not None and cfg.rope_scaling == "yarn"
            and theta_override is None):
        # HF folds attention_scaling into cos/sin; applying it to the
        # rotated output is identical (both rope terms carry it)
        out = out * yarn_attention_factor(cfg)
    return out.astype(x.dtype)


def quantize_kv(x, bits: int = 8):
    """Per-(token, head) symmetric quantization: x [B, T, H, Dh] →
    (codes, scales).

    ``bits=8``: int8 codes. ``bits=4``: two codes per byte packed across
    HEAD PAIRS — packed head j holds real head 2j in the low nibble and
    2j+1 in the high nibble, same token/dim position: codes
    [B, T, H/2, Dh] (see :func:`_kv_code_dims` for why). Scales stay per
    REAL head. ``bits=16`` disables KV quantization (quality ablation /
    fp fallback): codes are the raw activations, scales identity —
    every cache consumer computes codes*scale so the paths stay shared.
    """
    if bits == 16:
        return x, jnp.ones(x.shape[:-1], jnp.float32)
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    qmax = 7.0 if bits == 4 else 127.0
    scale = jnp.where(absmax == 0, 1.0, absmax / qmax)
    codes = jnp.round(x.astype(jnp.float32) / scale[..., None])
    if bits == 4:
        u = (codes + 8).astype(jnp.uint8)
        packed = u[..., 0::2, :] | (u[..., 1::2, :] << 4)
        return packed.astype(jnp.uint8), scale.astype(jnp.float32)
    return codes.astype(jnp.int8), scale.astype(jnp.float32)


def dequant_kv(codes, bits: int, head_axis: int = -3):
    """Cache codes → float32 values with REAL head order restored
    (codes*scale is the caller's job). int4: head-pair nibble unpack
    (see quantize_kv) — ``head_axis`` names the packed-head axis: -3
    for the cache layouts ([B, H/2, S, D] / [P, H/2, page, D]), -2 for
    the per-token [B, T, H/2, D] layout."""
    if bits != 4:
        return codes.astype(jnp.float32)
    lo = (codes & 0xF).astype(jnp.float32) - 8.0
    hi = (codes >> 4).astype(jnp.float32) - 8.0
    ax = head_axis % codes.ndim
    # interleave pairs back: [.., H/2, ..] -> [.., H/2, 2, ..] -> [.., H, ..]
    st = jnp.stack([lo, hi], axis=ax + 1)
    shp = st.shape
    return st.reshape(*shp[:ax], shp[ax] * 2, *shp[ax + 2:])


def _cache_insert_at_layer(cc_full, cs_full, codes, scale, lengths, layer,
                           s0=0, batch0=None):
    """Write T entries for layer ``layer`` into the FULL [L, B, H, S, D]
    cache at per-slot position lengths[b].

    One native scatter with unique indices — XLA keeps it in-place when the
    buffer is threaded through the layer scan, so per-step traffic is O(T),
    never a cache copy. ``mode="drop"`` discards rows outside this shard's
    S-slice, which implements sequence-shard ownership for free.
    """
    b, t = codes.shape[0], codes.shape[1]
    b_ix = jnp.arange(b)[:, None]                       # [B, 1]
    if batch0 is not None:
        b_ix = b_ix + batch0
    pos = lengths[:, None] + jnp.arange(t)[None, :] - s0  # [B, T]
    # negative indices would WRAP before the bounds check — push them
    # out-of-bounds high so "drop" discards them
    pos = jnp.where(pos < 0, cc_full.shape[3], pos)
    # advanced-index result for [L,B,H,S,D][layer, b_ix, :, pos] is
    # [B, T, H, D] — exactly quantize_kv's layout.
    cc_full = cc_full.at[layer, b_ix, :, pos].set(
        codes, mode="drop", unique_indices=True)
    cs_full = cs_full.at[layer, b_ix, :, pos].set(
        scale, mode="drop", unique_indices=True)
    return cc_full, cs_full


def _paged_insert_at_layer(cc, cs, codes, scale, lengths, layer, page_tbl,
                           s0=0):
    """Write T entries into the PAGE POOL at per-slot positions via the
    page table. Same one-scatter/in-place property as the contiguous
    insert; positions beyond the table capacity are dropped.

    cc [L, P, H, page, D]; codes [B, T, H, D]; page_tbl [B, max_pages].
    ``s0``: this shard's global S offset under sequence sharding (r5
    paged x seq): the table holds only this shard's columns with
    SHARD-LOCAL page ids, so positions outside [s0, s0 + cap) drop —
    the owning shard commits them (scatter-drop straddling semantics,
    same as the contiguous ``_cache_insert``).
    """
    page = cc.shape[3]
    b, t = codes.shape[0], codes.shape[1]
    pos = lengths[:, None] + jnp.arange(t)[None, :] - s0     # [B, T]
    cap = page_tbl.shape[1] * page
    pg_ix = jnp.take_along_axis(
        page_tbl, jnp.clip(pos // page, 0, page_tbl.shape[1] - 1), axis=1)
    # out-of-shard / over-cap → sentinel page → dropped
    pg_ix = jnp.where((pos >= 0) & (pos < cap), pg_ix, cc.shape[1])
    row = jnp.clip(pos, 0, cap - 1) % page
    cc = cc.at[layer, pg_ix, :, row].set(codes, mode="drop",
                                         unique_indices=True)
    cs = cs.at[layer, pg_ix, :, row].set(scale, mode="drop",
                                         unique_indices=True)
    return cc, cs


def _cache_insert(cache_codes, cache_scale, codes, scale, lengths, s0=0):
    """Write T new entries per slot at global position lengths[b].

    cache [B, H, S_loc, D]/[B, H, S_loc]; new entries [B, T, H, D]/[B, T, H].
    ``s0``: this shard's global offset under sequence sharding — a shard
    only commits the write when the whole T-range falls inside its slice
    (read-modify-write of T rows, O(T) traffic; insert ranges must not
    straddle shard boundaries — decode T=1 never does, prefill chunks must
    align). Writes past the local capacity are dropped.
    """
    codes_h = codes.transpose(0, 2, 1, 3)   # [B, H, T, D]
    scale_h = scale.transpose(0, 2, 1)      # [B, H, T]
    t = codes_h.shape[2]
    s_loc = cache_codes.shape[2]

    def per_slot(cc, cs, c, s, start):
        rel = start - s0
        owned = (rel >= 0) & (rel <= s_loc - t)
        lp = jnp.clip(rel, 0, s_loc - t)
        cur_c = jax.lax.dynamic_slice(cc, (0, lp, 0), (cc.shape[0], t,
                                                       cc.shape[2]))
        cur_s = jax.lax.dynamic_slice(cs, (0, lp), (cs.shape[0], t))
        cc = jax.lax.dynamic_update_slice(
            cc, jnp.where(owned, c, cur_c), (0, lp, 0))
        cs = jax.lax.dynamic_update_slice(
            cs, jnp.where(owned, s, cur_s), (0, lp))
        return cc, cs
    return jax.vmap(per_slot)(cache_codes, cache_scale, codes_h, scale_h,
                              lengths)


def attention(q, k_codes, k_scale, v_codes, v_scale, positions, lengths, cfg,
              seq_axis=None, key_offset=0, window=None):
    """GQA attention over the int8 cache (XLA path; prefill + fallback).

    q [B, T, Hq, Dh]; caches [B, Hkv, S, Dh]/[B, Hkv, S]; positions [B, T]
    (absolute position of each query); lengths [B] = valid cache length
    AFTER insertion. Causal: key s attends iff s <= position and s < length.

    Sequence parallelism (SURVEY.md §2.2 #11): with ``seq_axis`` set the
    caches hold only this shard's S-slice (global key positions start at
    ``key_offset``); each shard computes a partial softmax over its local
    keys and the shards merge with one log-sum-exp reduction (pmax + two
    psums) — queries are replicated over the axis, KV traffic stays local.
    """
    b, t, hq, dh = q.shape
    hkv, s = k_scale.shape[1], k_codes.shape[2]  # scales: per REAL head
    kv_bits = cfg.kv_bits if cfg is not None else 8
    rep = hq // hkv
    qf = q.astype(jnp.float32) * _q_scale(cfg, dh)
    # [B, T, Hq, Dh] x [B, Hkv, S, Dh] → [B, Hkv, rep, T, S]
    qg = qf.reshape(b, t, hkv, rep, dh)
    kf = dequant_kv(k_codes, kv_bits)
    logits = jnp.einsum("bthrd,bhsd->bhrts", qg, kf)
    logits = logits * k_scale[:, :, None, None, :]
    logits = _softcap_scores(logits, cfg)
    key_pos = key_offset + jnp.arange(s)[None, None, None, None, :]
    qpos = positions[:, None, None, :, None]
    valid = (key_pos <= qpos) & (key_pos < lengths[:, None, None, None, None])
    if window is not None:
        # traced per-layer window (Gemma-2 local/global alternation);
        # window <= 0 → full causal for this layer
        valid &= (window <= 0) | (key_pos > qpos - window)
    elif cfg is not None and cfg.sliding_window:
        valid &= key_pos > qpos - cfg.sliding_window
    logits = jnp.where(valid, logits, -1e30)
    # MLA passes v = a prefix slice of the latent keys, so the output
    # width follows V, not the query head dim.
    dv = v_codes.shape[-1] if kv_bits != 4 else dh
    if seq_axis is None:
        probs = jax.nn.softmax(logits, axis=-1)
        pv = probs * v_scale[:, :, None, None, :]
        out = jnp.einsum("bhrts,bhsd->bthrd", pv,
                         dequant_kv(v_codes, kv_bits))
        return out.reshape(b, t, hq, dv).astype(q.dtype)
    # Partial (flash-style) stats over the local shard, then LSE-merge.
    m_loc = jnp.max(logits, axis=-1, keepdims=True)          # [b,h,r,t,1]
    p = jnp.where(valid, jnp.exp(logits - m_loc), 0.0)
    l_loc = jnp.sum(p, axis=-1, keepdims=True)
    pv = p * v_scale[:, :, None, None, :]
    o_loc = jnp.einsum("bhrts,bhsd->bhrtd", pv, dequant_kv(v_codes, kv_bits))
    m_glob = jax.lax.pmax(m_loc, seq_axis)
    w = jnp.exp(m_loc - m_glob)
    l_glob = jax.lax.psum(l_loc * w, seq_axis)
    o_glob = jax.lax.psum(o_loc * w, seq_axis)
    out = o_glob / jnp.maximum(l_glob, 1e-20)
    # [b,h,r,t,d] → [b,t,h,r,d]
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, t, hq, dv)
    return out.astype(q.dtype)


def attention_blockwise(q, k_codes, k_scale, v_codes, v_scale, positions,
                        lengths, cfg, block: int = 1024, window=None):
    """Flash-style prefill attention in pure XLA: lax.scan over KV blocks
    with an online softmax, so peak memory is O(T·block) instead of the
    O(T·S) logits the one-shot einsum materializes — this is what makes
    long-context chunked prefill viable (SURVEY.md §5 long-context).

    Same contract as :func:`attention` (no seq_axis support — compose with
    the LSE-merge path instead).
    """
    b, t, hq, dh = q.shape
    hkv, s = k_scale.shape[1], k_codes.shape[2]  # scales: per REAL head
    hc = k_codes.shape[1]       # = hkv, or hkv/2 for head-pair int4
    kv_bits = cfg.kv_bits if cfg is not None else 8
    if s <= block:
        return attention(q, k_codes, k_scale, v_codes, v_scale, positions,
                         lengths, cfg, window=window)
    if s % block:
        block = s  # fall back to one-shot for awkward sizes
    rep = hq // hkv
    dc = k_codes.shape[-1]
    qg = (q.astype(jnp.float32) * _q_scale(cfg, dh)).reshape(
        b, t, hkv, rep, dh)
    n_blk = s // block
    kb = jnp.moveaxis(k_codes.reshape(b, hc, n_blk, block, dc), 2, 0)
    ksb = jnp.moveaxis(k_scale.reshape(b, hkv, n_blk, block), 2, 0)
    vb = jnp.moveaxis(
        v_codes.reshape(b, hc, n_blk, block, v_codes.shape[-1]), 2, 0)
    vsb = jnp.moveaxis(v_scale.reshape(b, hkv, n_blk, block), 2, 0)
    qpos = positions[:, None, None, :, None]
    lim = lengths[:, None, None, None, None]

    def body(carry, xs):
        m, l, o, blk_idx = carry
        kcb, kscb, vcb, vscb = xs
        logits = jnp.einsum("bthrd,bhsd->bhrts", qg,
                            dequant_kv(kcb, kv_bits))
        logits = logits * kscb[:, :, None, None, :]
        logits = _softcap_scores(logits, cfg)
        key_pos = blk_idx * block + jnp.arange(block)[None, None, None,
                                                      None, :]
        valid = (key_pos <= qpos) & (key_pos < lim)
        if window is not None:
            valid &= (window <= 0) | (key_pos > qpos - window)
        elif cfg.sliding_window:
            valid &= key_pos > qpos - cfg.sliding_window
        logits = jnp.where(valid, logits, -1e30)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.where(valid, jnp.exp(logits - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = p * vscb[:, :, None, None, :]
        o = o * alpha + jnp.einsum("bhrts,bhsd->bhrtd", pv,
                                   dequant_kv(vcb, kv_bits))
        return (m_new, l, o, blk_idx + 1), None

    dv = v_codes.shape[-1] if kv_bits != 4 else dh
    m0 = jnp.full((b, hkv, rep, t, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((b, hkv, rep, t, 1), jnp.float32)
    o0 = jnp.zeros((b, hkv, rep, t, dv), jnp.float32)
    (m, l, o, _), _ = jax.lax.scan(body, (m0, l0, o0, jnp.int32(0)),
                                   (kb, ksb, vb, vsb))
    out = o / jnp.maximum(l, 1e-20)
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, t, hq, dv)
    return out.astype(q.dtype)


# ── forward ─────────────────────────────────────────────────────────────


def forward(
    params: LlamaParams,
    tokens: jax.Array,       # int32 [B, T]
    cache: KVCache,
    cfg: ModelConfig,
    axis: str | None = None,
    seq_axis: str | None = None,
    expert_axis: str | None = None,
    adapter_ids: jax.Array | None = None,
    return_hidden: bool = False,
) -> tuple[jax.Array, KVCache]:
    """One model step (prefill if T>1, decode if T==1).

    Token t of slot b gets absolute position cache.lengths[b] + t; the cache
    is updated in place (functionally) and lengths advance by T. Returns
    (logits [B, T, V], new cache).

    ``axis``: mesh axis name for tensor parallelism. When set, the function
    runs INSIDE shard_map with column-split wq/wk/wv/gate/up and lm_head,
    row-split wo/down: head counts come from the local shard shapes, partial
    row-split outputs are psum'd, and logits are all-gathered over vocab
    (Megatron-style TP, XLA collectives over ICI — SURVEY.md §2.2 #9/#10).

    ``expert_axis``: mesh axis for expert parallelism (MoE models). Each
    shard holds an expert-major contiguous slice of we_gate_up/we_down,
    computes its local experts densely, and the routed combination psums
    over (expert_axis, axis) — attention and the router stay replicated
    over the expert axis.
    """
    mm = _mm(cfg)
    b, t = tokens.shape
    paged = isinstance(cache, PagedKVCache)
    if seq_axis is not None:
        # this shard's global S offset: contiguous caches S-shard their
        # [.., S, ..] dim; paged caches shard the TABLE columns
        # segment-major over seq (r5 paged x seq), so the local capacity
        # is columns * page
        s_loc = (cache.page_tbl.shape[1] * cache.k_codes.shape[3]
                 if paged else cache.k_codes.shape[3])
        s0 = jax.lax.axis_index(seq_axis) * s_loc
    else:
        s0 = 0
    dt = _act_dtype(cfg)
    positions = cache.lengths[:, None] + jnp.arange(t)[None, :]
    h = _embed_lookup(params.embed, tokens, dt, cfg)
    new_lengths = cache.lengths + t

    if params.lora is not None and adapter_ids is None:
        adapter_ids = jnp.zeros((b,), jnp.int32)  # all-base
    common = dict(
        page_tbl=cache.page_tbl if paged else None,
        expert_axis=expert_axis,
        lora=params.lora, adapter_ids=adapter_ids,
    )
    carry = (h, cache.k_codes, cache.k_scale, cache.v_codes, cache.v_scale)
    if cfg.first_k_dense and params.layers0 is not None:
        # DeepSeek dense-prefix layers: same attention, plain dense MLP —
        # a separate scan over the prefix stack (uniform scan leaves),
        # then the MoE stack with cache writes offset to global layers.
        cfg0 = dense_prefix_cfg(cfg)
        step0 = make_layer_step(
            params.layers0, cache.lengths, cfg0, mm, b, t, positions,
            new_lengths, s0, axis, dt, seq_axis, **common)
        carry, _ = jax.lax.scan(
            step0, carry, scan_xs(params.layers0, cfg0, layer0=0))
        layer_step = make_layer_step(
            params.layers, cache.lengths, cfg, mm, b, t, positions,
            new_lengths, s0, axis, dt, seq_axis,
            layer_off=cfg.first_k_dense, **common)
        carry, _ = jax.lax.scan(
            layer_step, carry,
            scan_xs(params.layers, cfg, layer0=cfg.first_k_dense))
    else:
        layer_step = make_layer_step(
            params.layers, cache.lengths, cfg, mm, b, t, positions,
            new_lengths, s0, axis, dt, seq_axis, **common)
        carry, _ = jax.lax.scan(layer_step, carry, scan_xs(params.layers,
                                                           cfg))
    h, kc, ks, vc, vs = carry
    h = rmsnorm(h, params.final_norm, cfg.norm_eps, cfg.norm_offset)
    if return_hidden:
        # final-norm hidden states instead of logits (embeddings API);
        # cache updates still apply
        if paged:
            hidden_cache = PagedKVCache(
                k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
                page_tbl=cache.page_tbl, lengths=new_lengths)
        else:
            hidden_cache = KVCache(
                k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
                lengths=new_lengths)
        return h.astype(jnp.float32), hidden_cache
    logits = mm(h, params.lm_head, out_dtype=jnp.float32)
    if axis:
        logits = jax.lax.all_gather(logits, axis, axis=2, tiled=True)
    logits = logits[..., :cfg.vocab_size]  # drop lm_head tile padding
    if cfg.final_softcap:
        # Gemma-2 final logit softcapping (elementwise — commutes with
        # the vocab all-gather/slice above)
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    if paged:
        new_cache = PagedKVCache(
            k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
            page_tbl=cache.page_tbl, lengths=new_lengths)
    else:
        new_cache = KVCache(
            k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
            lengths=new_lengths)
    return logits, new_cache


def dense_prefix_cfg(cfg: ModelConfig) -> ModelConfig:
    """Config variant for the first_k_dense prefix stack: same attention,
    plain dense MLP (no MoE knobs) — shared by forward and forward_pp."""
    return dataclasses.replace(
        cfg, n_experts=0, first_k_dense=0, n_shared_experts=0,
        router_bias=False, n_expert_groups=0, topk_groups=0)


def scan_xs(layers, cfg: ModelConfig, layer0=None) -> tuple:
    """Per-layer scan xs for :func:`make_layer_step` (and the SP/PP layer
    bodies): small leaves + the per-layer attention window + layer index.
    The post-norm slots fall back to attn_norm (statically ignored by the
    body) when cfg.post_norms is off, keeping the xs structure uniform
    across model families.

    ``layer0``: this shard's global layer offset (traced; PP stages) —
    the window alternation is indexed by GLOBAL layer, so a stage slices
    its stretch of the full window array. Leaf arrays are already the
    local stack inside shard_map."""
    l_stack = layers.attn_norm.shape[0]
    win = layer_windows(cfg)
    if layer0 is not None:
        win = jax.lax.dynamic_slice_in_dim(win, layer0, l_stack)
    # trailing MLA / DeepSeek-MoE leaves fall back to attn_norm (same
    # statically-ignored-placeholder trick as the post-norm slots)
    return (layers.attn_norm, layers.mlp_norm, layers.qkv_bias,
            layers.q_norm, layers.k_norm, layers.router,
            layers.post_attn_norm if cfg.post_norms else layers.attn_norm,
            layers.post_mlp_norm if cfg.post_norms else layers.attn_norm,
            win, jnp.arange(l_stack),
            (layers.q_a_norm if cfg.is_mla and cfg.q_lora_rank
             else layers.attn_norm),
            layers.kv_a_norm if cfg.is_mla else layers.attn_norm,
            layers.router_bias if cfg.router_bias else layers.attn_norm)


def make_layer_step(layers, lengths, cfg, mm, b, t, positions, new_lengths,
                    s0, axis, dt, seq_axis, batch0=None, page_tbl=None,
                    expert_axis=None, lora=None, adapter_ids=None,
                    layer_off: int = 0):
    """Scan body over the stacked layer axis, carrying the FULL caches.

    The carry is (h, k_codes, k_scale, v_codes, v_scale) with caches at
    their full [L, ...] shapes; xs supplies only the small per-layer leaves
    (norms, bias) plus the layer index. Packed weights and KV tiles are
    selected INSIDE the Pallas kernels via scalar-prefetched index maps —
    per-step HBM traffic is exactly codes-once + O(T) cache writes, with no
    per-layer weight/cache materialization (the dominant overhead of the
    naive scan-over-slices formulation, measured at >3x on the axon v5e).

    ``batch0``: traced batch offset for microbatched pipelining — h covers
    slots [batch0, batch0+b) of the full-batch caches; positions/lengths
    are the FULL-batch arrays and get sliced here.
    """
    psum = (lambda v: jax.lax.psum(v, axis)) if axis else (lambda v: v)
    mode = _resolve_mode(cfg)
    if batch0 is not None:
        lengths = jax.lax.dynamic_slice_in_dim(lengths, batch0, b)
        positions = jax.lax.dynamic_slice_in_dim(positions, batch0, b)
        new_lengths = jax.lax.dynamic_slice_in_dim(new_lengths, batch0, b)
        if adapter_ids is not None:
            adapter_ids = jax.lax.dynamic_slice_in_dim(
                adapter_ids, batch0, b)
        if page_tbl is not None:
            # microbatched PP over a paged pool: the table rows follow
            # the microbatch's slot window
            page_tbl = jax.lax.dynamic_slice_in_dim(page_tbl, batch0, b)

    def layer_step(carry, xs):
        h, kc, ks, vc, vs = carry
        (attn_norm, mlp_norm, qkv_bias, q_norm, k_norm, router,
         post_attn, post_mlp, win, idx, q_a_norm, kv_a_norm, r_bias) = xs
        # weights index with the LOCAL stack position (idx); caches index
        # with the GLOBAL layer (gidx) — they differ only for the MoE
        # stack of a first_k_dense model (layer_off = k).
        gidx = idx + layer_off if layer_off else idx
        # traced per-layer window only when the family uses one (static
        # gate keeps the mask out of Llama-style traces entirely)
        window = win if cfg.sliding_window else None
        x = rmsnorm(h, attn_norm, cfg.norm_eps, cfg.norm_offset)
        if cfg.is_mla:
            return _mla_attn(h, x, kc, ks, vc, vs, mlp_norm, idx, gidx,
                             router, post_attn, post_mlp, q_a_norm,
                             kv_a_norm, r_bias)
        qkv = mm(x, layers.wqkv, idx) + qkv_bias.astype(dt)
        if lora is not None:
            from quant_tpu.models.lora import lora_delta
            qkv = qkv + lora_delta(x, lora.a_qkv, lora.b_qkv, idx,
                                   adapter_ids).astype(qkv.dtype)
        units = cfg.n_heads + 2 * cfg.n_kv_heads
        nq = (qkv.shape[-1] * cfg.n_heads) // units
        nkv = (qkv.shape[-1] * cfg.n_kv_heads) // units
        q = qkv[..., :nq].reshape(b, t, -1, cfg.head_dim)
        k = qkv[..., nq:nq + nkv].reshape(b, t, -1, cfg.head_dim)
        v = qkv[..., nq + nkv:].reshape(b, t, -1, cfg.head_dim)
        if cfg.qk_norm:
            # Qwen3 / Gemma-3: per-head RMSNorm over Dh before RoPE
            # (Gemma-3 stores zero-centered gains — norm_offset applies)
            q = rmsnorm(q, q_norm, cfg.norm_eps, cfg.norm_offset)
            k = rmsnorm(k, k_norm, cfg.norm_eps, cfg.norm_offset)
        tov = _layer_theta(cfg, win)
        q = _rope(q, positions, cfg.rope_theta, cfg, theta_override=tov)
        k = _rope(k, positions, cfg.rope_theta, cfg, theta_override=tov)
        k_q, k_s = quantize_kv(k, cfg.kv_bits)
        v_q, v_s = quantize_kv(v, cfg.kv_bits)
        if page_tbl is not None:
            # Paged pool path (SURVEY #5/#15): page-table-addressed insert
            # + attention. Pallas kernels for the decode hot loop; the XLA
            # mode gathers the slot's pages (tests / prefill).
            ak = _resolve_attn_kernel(
                cfg, b, page_tbl.shape[1] * kc.shape[3], mode, paged=True)
            # kv4 Pallas pair Mosaic-validated on hardware 2026-08-18
            # (tpu_kv4_kernel_check.py: exact vs f64 oracle, 547 GB/s of
            # packed bytes) — auto mode may route kv4 through it.
            # seq-sharded pools (r5) take the gather + LSE-merge path —
            # same attention the contiguous seq>1 decode uses.
            pg_flash = (t == 1 and seq_axis is None
                        and ak in ("flash", "paged")
                        and cfg.kv_bits in (8, 4)
                        and mode in ("pallas", "pallas_interpret"))
            interp = mode == "pallas_interpret"
            if pg_flash:
                from quant_tpu.kernels.cache_insert import (
                    paged_cache_insert_int8,
                )
                from quant_tpu.kernels.paged_attention import (
                    paged_flash_decode_int8,
                )
                kc, ks, vc, vs = paged_cache_insert_int8(
                    kc, ks, vc, vs, k_q, k_s, v_q, v_s, lengths, gidx,
                    page_tbl, interpret=interp)
                # window/softcap run IN-KERNEL (r5): Mistral/Gemma-2/3
                # decode rides the flash path like everyone else
                attn = paged_flash_decode_int8(
                    q[:, 0], kc, ks, vc, vs, page_tbl, new_lengths, gidx,
                    window, interpret=interp,
                    softcap=cfg.attn_softcap or 0.0,
                    scale=_q_scale(cfg, cfg.head_dim))[:, None]
            else:
                from quant_tpu.kernels.paged_attention import paged_gather

                kc, ks = _paged_insert_at_layer(kc, ks, k_q, k_s, lengths,
                                                gidx, page_tbl, s0=s0)
                vc, vs = _paged_insert_at_layer(vc, vs, v_q, v_s, lengths,
                                                gidx, page_tbl, s0=s0)
                if seq_axis is not None:
                    # paged x seq (r5): each seq shard gathers its OWN
                    # segment's pages (local ids, local pool) and the
                    # shards LSE-merge — identical math to the
                    # contiguous S-sharded decode, with key_offset = s0
                    attn = attention(q, paged_gather(kc, page_tbl, gidx),
                                     paged_gather(ks, page_tbl, gidx),
                                     paged_gather(vc, page_tbl, gidx),
                                     paged_gather(vs, page_tbl, gidx),
                                     positions, new_lengths, cfg,
                                     seq_axis=seq_axis, key_offset=s0,
                                     window=window)
                else:
                    att = attention_blockwise if t > 1 else attention
                    attn = att(q, paged_gather(kc, page_tbl, gidx),
                               paged_gather(ks, page_tbl, gidx),
                               paged_gather(vc, page_tbl, gidx),
                               paged_gather(vs, page_tbl, gidx),
                               positions, new_lengths, cfg,
                               window=window)
            return _tail(h, attn, kc, ks, vc, vs, mlp_norm, idx, router,
                         post_attn, post_mlp, r_bias)
        ak = _resolve_attn_kernel(cfg, b, kc.shape[3], mode)
        flash = (t == 1 and seq_axis is None and batch0 is None
                 and ak == "flash" and cfg.kv_bits in (8, 4)
                 and mode in ("pallas", "pallas_interpret"))
        if flash:
            # Aliased Pallas insert: an XLA scatter feeding the (opaque)
            # flash kernel would force a full cache copy per layer — the
            # DMA kernel updates the buffers in place instead.
            from quant_tpu.kernels.cache_insert import cache_insert_int8
            kc, ks, vc, vs = cache_insert_int8(
                kc, ks, vc, vs, k_q, k_s, v_q, v_s, lengths, gidx, s0,
                interpret=(mode == "pallas_interpret"),
            )
        else:
            kc, ks = _cache_insert_at_layer(kc, ks, k_q, k_s, lengths, gidx,
                                            s0, batch0=batch0)
            vc, vs = _cache_insert_at_layer(vc, vs, v_q, v_s, lengths, gidx,
                                            s0, batch0=batch0)
        if flash:
            # Decode hot path: Pallas flash kernel streams the int8 cache
            # straight from the stacked buffer (layer via scalar prefetch).
            from quant_tpu.kernels.attention import flash_decode_int8
            attn = flash_decode_int8(
                q[:, 0], kc, ks, vc, vs, new_lengths, gidx, window,
                interpret=(mode == "pallas_interpret"),
                softcap=cfg.attn_softcap or 0.0,
                scale=_q_scale(cfg, cfg.head_dim),
            )[:, None]
        else:
            def sl(a):
                a = jax.lax.dynamic_index_in_dim(a, gidx, 0, False)
                if batch0 is not None:
                    a = jax.lax.dynamic_slice_in_dim(a, batch0, b, axis=0)
                return a
            if t > 1 and seq_axis is None:
                # chunked-prefill path: blockwise online softmax bounds
                # memory at O(T*block) regardless of context length
                attn = attention_blockwise(q, sl(kc), sl(ks), sl(vc),
                                           sl(vs), positions, new_lengths,
                                           cfg, window=window)
            else:
                attn = attention(q, sl(kc), sl(ks), sl(vc), sl(vs),
                                 positions, new_lengths, cfg,
                                 seq_axis=seq_axis, key_offset=s0,
                                 window=window)
        return _tail(h, attn, kc, ks, vc, vs, mlp_norm, idx, router,
                     post_attn, post_mlp, r_bias)

    def _mla_attn(h, x, kc, ks, vc, vs, mlp_norm, idx, gidx, router,
                  post_attn, post_mlp, q_a_norm, kv_a_norm, r_bias):
        """DeepSeek MLA attention in the ABSORBED form (HF DeepseekV2/V3
        attention semantics, TPU-first execution):

        * ONE fused down-projection matmul gives [q-part | c_kv | k_rope]
          (wqkv packs w_q(_a) with kv_a_proj_with_mqa).
        * The per-head key up-projection W_UK folds into the QUERY
          (q_abs[h] = W_UK[h]^T q_nope[h]), so attention is MQA over the
          quantized latent [c_kv | k_rope] — ONE shared r+dr row per
          token in the cache instead of H*(dn+dv) — and the score
          q_abs·c + q_pe·k_pe equals HF's q_nope·(W_UK c) + q_pe·k_pe.
        * The value read is a PREFIX SLICE of the key read
          (out_lat = probs @ c_kv); W_UV applies OUTSIDE attention.
        The latent is quantized per token with one joint scale over the
        r+dr row (kv_bits 8|16); vc/vs stay untouched (zero width).
        """
        r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
        dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
        akv = mm(x, layers.wqkv, idx)            # [B,T, qpart + r + dr]
        if lora is not None:
            # MLA LoRA (r5): adapters on q(-a)/kv_a ride the fused
            # down-projection exactly like GQA's fused qkv (b_qkv is
            # block-diagonal in the same tp-interleaved column layout);
            # o_proj adapts in _tail. q_b/kv_b are rejected at stack
            # build (absorbed form).
            from quant_tpu.models.lora import lora_delta
            akv = akv + lora_delta(x, lora.a_qkv, lora.b_qkv, idx,
                                   adapter_ids).astype(akv.dtype)
        if axis is not None:
            # MLA TP: wqkv is column-split (concat_columns interleave) —
            # each shard holds 1/tp of the q(-a) columns AND 1/tp of the
            # kv_a columns. The kv_a slice all-gathers back to the full
            # latent (it is shared MQA state — a few hundred floats per
            # token over ICI); the q side stays a head split. With
            # q_lora the a-projection also gathers (its RMSNorm runs
            # over the FULL low-rank dim) before the head-split q_b.
            qw_g = cfg.q_lora_rank or cfg.n_heads * (dn + dr)
            w_loc = akv.shape[-1]
            share = (r + dr) * w_loc // (qw_g + r + dr)
            qp = akv[..., :w_loc - share]
            ckv = jax.lax.all_gather(akv[..., w_loc - share:], axis,
                                     axis=2, tiled=True)
        else:
            qp = akv[..., :akv.shape[-1] - (r + dr)]
            ckv = akv[..., akv.shape[-1] - (r + dr):]
        if cfg.q_lora_rank:
            if axis is not None:
                qp = jax.lax.all_gather(qp, axis, axis=2, tiled=True)
            qp = rmsnorm(qp, q_a_norm, cfg.norm_eps)
            qp = mm(qp, layers.w_q_b, idx)
        qh = qp.reshape(b, t, -1, dn + dr)       # [B,T,Hloc,dn+dr]
        q_nope, q_pe = qh[..., :dn], qh[..., dn:]
        c = rmsnorm(ckv[..., :r], kv_a_norm, cfg.norm_eps)
        k_pe = ckv[..., r:][:, :, None, :]       # [B,T,1,dr] (MQA rope)
        q_pe = _rope(q_pe, positions, cfg.rope_theta, cfg)
        k_pe = _rope(k_pe, positions, cfg.rope_theta, cfg)
        w_uk = jax.lax.dynamic_index_in_dim(layers.w_uk, idx, 0, False)
        w_uv = jax.lax.dynamic_index_in_dim(layers.w_uv, idx, 0, False)
        # absorbed up-projections run in the activation dtype (bf16 →
        # native MXU dots; f32 in the parity tests). CPU XLA cannot even
        # lower a bf16xbf16->f32 dot, and the latent quantization right
        # after bounds the precision this could buy.
        q_abs = jnp.einsum("bthn,hnr->bthr", q_nope,
                           w_uk.astype(q_nope.dtype))
        pad = cfg.mla_cache_dim - cfg.mla_kv_dim
        q_eff = jnp.concatenate([q_abs.astype(dt), q_pe.astype(dt)],
                                axis=-1)
        lat = jnp.concatenate([c, k_pe[:, :, 0].astype(c.dtype)],
                              axis=-1)[:, :, None, :]    # [B,T,1,r+dr]
        if pad:
            # physical cache rows carry zero lanes up to a 128 multiple
            # (cfg.mla_cache_dim) — queries pad identically, so scores
            # and the value prefix slice are exact
            q_eff = jnp.pad(q_eff, ((0, 0), (0, 0), (0, 0), (0, pad)))
            lat = jnp.pad(lat, ((0, 0), (0, 0), (0, 0), (0, pad)))
        k_q, k_s = quantize_kv(lat.astype(dt), cfg.kv_bits)
        if page_tbl is not None:
            # paged latent pool (XLA path: page-table insert + per-slot
            # page gather; a Pallas paged MLA kernel can slot in here
            # once hardware-validated like the GQA pair)
            from quant_tpu.kernels.paged_attention import paged_gather

            kc, ks = _paged_insert_at_layer(kc, ks, k_q, k_s, lengths,
                                            gidx, page_tbl)
            kcl = paged_gather(kc, page_tbl, gidx)
            ksl = paged_gather(ks, page_tbl, gidx)
            att = attention_blockwise if t > 1 else attention
            o_lat = att(q_eff, kcl, ksl, kcl[..., :r], ksl, positions,
                        new_lengths, cfg)
            out = jnp.einsum("bthr,hrv->bthv", o_lat.astype(dt),
                             w_uv.astype(dt))
            return _tail(h, out, kc, ks, vc, vs, mlp_norm, idx, router,
                         post_attn, post_mlp, r_bias)
        ak = _resolve_attn_kernel(cfg, b, kc.shape[3], mode)
        flash = (t == 1 and seq_axis is None and batch0 is None
                 and ak == "flash")
        if flash:
            # Pallas pair: aliased in-place latent insert + the MLA
            # flash kernel (one HBM read feeds both dots; an XLA
            # scatter into an opaque Pallas consumer would copy the
            # cache per layer — same rationale as the GQA pair).
            from quant_tpu.kernels.cache_insert import (
                mla_cache_insert_int8,
            )
            from quant_tpu.kernels.mla_attention import (
                mla_flash_decode_int8,
            )
            interp = mode == "pallas_interpret"
            kc, ks = mla_cache_insert_int8(
                kc, ks, k_q, k_s, lengths, gidx, s0, interpret=interp)
            o_lat = mla_flash_decode_int8(
                q_eff[:, 0], kc, ks, new_lengths, gidx, r=r,
                scale=_q_scale(cfg, cfg.head_dim),
                interpret=interp)[:, None]
        else:
            kc, ks = _cache_insert_at_layer(kc, ks, k_q, k_s, lengths,
                                            gidx, s0, batch0=batch0)

            def sl(a):
                a = jax.lax.dynamic_index_in_dim(a, gidx, 0, False)
                if batch0 is not None:
                    a = jax.lax.dynamic_slice_in_dim(a, batch0, b,
                                                     axis=0)
                return a
            kcl, ksl = sl(kc), sl(ks)
            if t > 1 and seq_axis is None:
                o_lat = attention_blockwise(q_eff, kcl, ksl,
                                            kcl[..., :r], ksl,
                                            positions, new_lengths, cfg)
            else:
                o_lat = attention(q_eff, kcl, ksl, kcl[..., :r], ksl,
                                  positions, new_lengths, cfg,
                                  seq_axis=seq_axis, key_offset=s0)
        out = jnp.einsum("bthr,hrv->bthv", o_lat.astype(dt),
                         w_uv.astype(dt))
        return _tail(h, out, kc, ks, vc, vs, mlp_norm, idx, router,
                     post_attn, post_mlp, r_bias)

    def _tail(h, attn, kc, ks, vc, vs, mlp_norm, idx, router,
              post_attn, post_mlp, r_bias=None):
        # Row-split partials psum in f32 (casting to bf16 before the
        # cross-shard sum would make TP results drift from single-device).
        attn2 = attn.reshape(b, t, -1)
        o_part = mm(attn2, layers.wo, idx, out_dtype=jnp.float32)
        if lora is not None:
            # row-split input → shard-local partial delta joins the psum
            from quant_tpu.models.lora import lora_delta
            o_part = o_part + lora_delta(attn2, lora.a_o, lora.b_o, idx,
                                         adapter_ids)
        o = psum(o_part)
        if cfg.post_norms:
            # Gemma-2: norm the block OUTPUT (after the full TP psum —
            # RMSNorm is nonlinear) before the residual add
            o = rmsnorm(o, post_attn, cfg.norm_eps, cfg.norm_offset)
        h = h + o.astype(dt)
        x = rmsnorm(h, mlp_norm, cfg.norm_eps, cfg.norm_offset)
        m = mlp_block(x, layers, idx, cfg, mm, dt, axis=axis,
                      router=router, expert_axis=expert_axis,
                      lora=lora, adapter_ids=adapter_ids,
                      router_bias=r_bias if cfg.router_bias else None)
        if cfg.post_norms:
            m = rmsnorm(m, post_mlp, cfg.norm_eps, cfg.norm_offset)
        h = h + m.astype(dt)
        return (h, kc, ks, vc, vs), None

    return layer_step
