"""Model / quantization configs (frozen dataclasses — SURVEY.md §5 config).

Presets cover the BASELINE.json config ladder: TinyLlama-1.1B (config 3),
Llama-3-8B (config 4), Llama-3-70B (config 5), plus tiny test shapes.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    intermediate: int
    # 0 → derive dim // n_heads; models with a decoupled head_dim (some
    # newer Qwen/Llama variants) set it explicitly (ADVICE r1).
    head_dim: int = 0
    rope_theta: float = 10000.0
    # RoPE frequency scaling for long-context models:
    # * "none": plain RoPE.
    # * "linear": positions effectively divided by rope_factor.
    # * "llama3" (Llama-3.1/3.2): NTK-by-parts — low-frequency bands
    #   scale by 1/factor, high-frequency bands stay, with a smooth
    #   ramp between rope_low_freq_factor and rope_high_freq_factor
    #   wavelength thresholds of rope_orig_max_pos.
    rope_scaling: str = "none"
    rope_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_orig_max_pos: int = 8192
    norm_eps: float = 1e-5
    qkv_bias: bool = False  # Qwen2 family
    # Mistral-v0.1-style sliding-window attention: key s is visible to
    # query position p iff p - window < s <= p (0 = full causal). Mask-only
    # (cache layout unchanged); forces the XLA attention path.
    sliding_window: int = 0
    # Gemma family: RMSNorm multiplies by (1 + w), the MLP gate is
    # tanh-approx GeLU, and embeddings are scaled by sqrt(dim).
    norm_offset: float = 0.0
    act_fn: str = "silu"          # "silu" | "gelu_tanh"
    embed_scale: bool = False
    # Qwen3 family: per-head RMSNorm on q and k (over head_dim, learned
    # [Dh] weights shared across heads) after projection, before RoPE.
    qk_norm: bool = False
    # Gemma-2 family:
    # * sliding_pattern p alternates local/global attention: layer i is
    #   GLOBAL iff (i + 1) % p == 0, else it uses sliding_window
    #   (p=2 → Gemma-2's local/global alternation; p=0 → every layer
    #   sliding, the Mistral default).
    # * attn_softcap / final_softcap: tanh softcapping c·tanh(x/c) on
    #   attention scores (before masking) / LM logits (0 = off).
    # * post_norms: extra RMSNorms on the attention and MLP block
    #   OUTPUTS (before the residual add), on top of the pre-norms.
    # * query_pre_attn_scalar s: attention scores scale by s^-0.5
    #   instead of head_dim^-0.5 (0 = head_dim).
    sliding_pattern: int = 0
    attn_softcap: float = 0.0
    final_softcap: float = 0.0
    post_norms: bool = False
    query_pre_attn_scalar: float = 0.0
    # Gemma-3: sliding layers use a DIFFERENT rope base (local theta);
    # global layers keep rope_theta. 0 = off (uniform theta). With
    # rope_scaling="linear", the factor applies to GLOBAL layers only
    # (the HF Gemma-3 semantics); other scaling types are rejected.
    rope_local_theta: float = 0.0
    # Mixtral-style sparse MoE MLP: n_experts > 0 replaces the dense MLP
    # with a top-k routed mixture (router = linear [D, E], softmax over
    # ALL experts, top ``experts_per_token`` kept; ``norm_topk`` renorms
    # the kept weights to sum to 1 — Mixtral semantics). Inference
    # computes every expert densely and combines with the (mostly-zero)
    # routing weights: static shapes, no token dropping, and at decode
    # batch sizes it is HBM-optimal — each expert's packed weights are
    # read once per step, exactly like routed dispatch once B >= E.
    n_experts: int = 0
    experts_per_token: int = 2
    norm_topk: bool = True
    # MoE prefill dispatch. "dense" (default): every expert runs on every
    # token — EXACT (no drops) and HBM-optimal at decode, but prefill
    # pays ~E/k x the routed FLOPs on the MXU-bound phase. "capacity":
    # GShard-style fixed-capacity gather/scatter dispatch for prefill
    # calls (T>1) — each expert processes at most
    # ceil(tokens*k/E * moe_capacity_factor) tokens; overflow tokens
    # LOSE that expert's contribution (standard capacity semantics), so
    # this is an opt-in throughput mode, never used for decode.
    moe_prefill: str = "dense"
    moe_capacity_factor: float = 1.5
    # quantization
    bits: int = 4
    group_size: int = 128
    # codebook ("bin-lookup") weight quantization: None = linear RTN;
    # "nf4" = the oracle's normative 16-entry NF4 table; "lloyd" =
    # per-tensor Lloyd-Max fit (host converters only). int4-only. The
    # kernels gather the table in VMEM (word4 int8-requant fast path /
    # sel15 exact) — a QUALITY mode: hardware-measured 181 GB/s of packed
    # bytes vs ~520 linear (scripts/tpu_lut_probe.py, 2026-08-19).
    codebook: str | None = None
    # 8 → int8 KV cache; 4 → int4 (head-pair nibble-packed, halves KV
    # HBM traffic/footprint — llama._kv_code_dims); 16 → unquantized
    # (quality ablation; XLA attn only)
    kv_bits: int = 8
    embed_bits: int = 16  # 8 → int8 per-row quantized embedding table
    # execution
    kernel_mode: str = "auto"  # auto | pallas | pallas_interpret | xla
    # W8A8/W4A8: dynamically quantize activations to int8 inside the
    # matmul kernels (2x MXU rate, no weight cast) — small accuracy cost;
    # mostly a prefill-throughput lever (prefill is MXU-bound).
    act_quant: bool = False
    # decode attention: "xla" fuses the int8-cache read into the dot and
    # keeps the cache-insert scatter in-place; "flash" uses the Pallas
    # flash-decode kernel + the aliased in-place insert kernel
    # (kernels/cache_insert.py). With a PagedKVCache, "flash" (or "paged")
    # selects the page-table Pallas pair. "auto" picks per static shard
    # shape at trace time from the hardware crossover measured in
    # scripts/tpu_attn_compare.py (README table): Pallas pair always for a
    # paged pool, flash at S>=8k (or the measured B=16 XLA pathology), the
    # fused XLA path at short/mid context.
    attn_kernel: str = "auto"
    dtype: str = "bfloat16"

    def __post_init__(self):
        if self.head_dim == 0:
            object.__setattr__(self, "head_dim", self.dim // self.n_heads)
        if self.act_fn not in ("silu", "gelu_tanh"):
            raise ValueError(f"act_fn must be silu|gelu_tanh, "
                             f"got {self.act_fn!r}")
        if self.codebook is not None:
            if self.codebook not in ("nf4", "lloyd"):
                raise ValueError(f"codebook must be nf4|lloyd|None, "
                                 f"got {self.codebook!r}")
            if self.bits != 4:
                raise ValueError("codebook quantization is int4-only")
        if self.kv_bits not in (4, 8, 16):
            raise ValueError(
                f"kv_bits must be 4, 8 or 16, got {self.kv_bits}")
        if self.kv_bits == 4 and self.n_kv_heads % 2:
            raise ValueError(
                "kv_bits=4 packs nibbles across head pairs and needs an "
                "even n_kv_heads")
        if self.attn_kernel not in ("auto", "xla", "flash", "paged"):
            raise ValueError(f"attn_kernel must be auto|xla|flash|paged, "
                             f"got {self.attn_kernel!r}")
        if self.n_experts and not (
                0 < self.experts_per_token <= self.n_experts):
            raise ValueError(
                f"experts_per_token {self.experts_per_token} must be in "
                f"[1, n_experts={self.n_experts}]")
        if self.moe_prefill not in ("dense", "capacity"):
            raise ValueError(f"moe_prefill must be dense|capacity, "
                             f"got {self.moe_prefill!r}")
        if self.sliding_pattern and not self.sliding_window:
            raise ValueError("sliding_pattern needs sliding_window > 0")
        if self.rope_scaling not in ("none", "linear", "llama3"):
            raise ValueError(f"rope_scaling must be none|linear|llama3, "
                             f"got {self.rope_scaling!r}")
        if self.rope_local_theta:
            if not self.sliding_window:
                raise ValueError("rope_local_theta needs sliding_window")
            if self.rope_scaling not in ("none", "linear"):
                raise ValueError("rope_local_theta composes only with "
                                 "none/linear rope_scaling")


PRESETS: dict[str, ModelConfig] = {
    # 2-layer toy for unit tests (dims aligned to 128 lanes).
    "test-tiny": ModelConfig(
        vocab_size=512, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
        intermediate=512, group_size=64, kernel_mode="xla",
    ),
    "tinyllama-1.1b": ModelConfig(
        vocab_size=32000, dim=2048, n_layers=22, n_heads=32, n_kv_heads=4,
        intermediate=5632, rope_theta=10000.0, embed_bits=8,
    ),
    # Llama-3.2 small models: natural DRAFT models for speculative
    # decoding against the 8B/70B targets (same tokenizer/vocab).
    # 128k-context via the llama3 NTK-by-parts rope scaling (factor 32).
    "llama-3.2-1b": ModelConfig(
        vocab_size=128256, dim=2048, n_layers=16, n_heads=32, n_kv_heads=8,
        intermediate=8192, head_dim=64, rope_theta=500000.0, embed_bits=8,
        rope_scaling="llama3", rope_factor=32.0,
        rope_low_freq_factor=1.0, rope_high_freq_factor=4.0,
        rope_orig_max_pos=8192,
    ),
    "llama-3.2-3b": ModelConfig(
        vocab_size=128256, dim=3072, n_layers=28, n_heads=24, n_kv_heads=8,
        intermediate=8192, head_dim=128, rope_theta=500000.0, embed_bits=8,
        rope_scaling="llama3", rope_factor=32.0,
        rope_low_freq_factor=1.0, rope_high_freq_factor=4.0,
        rope_orig_max_pos=8192,
    ),
    "llama-3-8b": ModelConfig(
        vocab_size=128256, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
        intermediate=14336, rope_theta=500000.0, embed_bits=8,
    ),
    "qwen2-7b": ModelConfig(
        vocab_size=152064, dim=3584, n_layers=28, n_heads=28, n_kv_heads=4,
        intermediate=18944, rope_theta=1000000.0, norm_eps=1e-6,
        qkv_bias=True, embed_bits=8,
    ),
    "llama-3-70b": ModelConfig(
        vocab_size=128256, dim=8192, n_layers=80, n_heads=64, n_kv_heads=8,
        intermediate=28672, rope_theta=500000.0, embed_bits=8,
    ),
    # Phi-3-mini-4k (fused qkv/gate_up in the HF checkpoint — split by
    # the converter; MHA, silu, plain RoPE).
    "phi-3-mini-4k": ModelConfig(
        vocab_size=32064, dim=3072, n_layers=32, n_heads=32,
        n_kv_heads=32, intermediate=8192, rope_theta=10000.0,
        embed_bits=8,
    ),
    # Mistral-7B-v0.1 (sliding-window attention, window 4096).
    "mistral-7b": ModelConfig(
        vocab_size=32000, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
        intermediate=14336, rope_theta=10000.0, sliding_window=4096,
        embed_bits=8,
    ),
    # Gemma-7B (GeGLU, (1+w) RMSNorm, sqrt(dim)-scaled embeddings, tied
    # lm_head, decoupled head_dim=256).
    "gemma-7b": ModelConfig(
        vocab_size=256000, dim=3072, n_layers=28, n_heads=16, n_kv_heads=16,
        intermediate=24576, head_dim=256, rope_theta=10000.0,
        norm_eps=1e-6, norm_offset=1.0, act_fn="gelu_tanh",
        embed_scale=True, embed_bits=8,
    ),
    # Gemma-2 (alternating local/global attention, attn+final logit
    # softcapping, post-block norms, query_pre_attn_scalar, tied head).
    "gemma-2-2b": ModelConfig(
        vocab_size=256000, dim=2304, n_layers=26, n_heads=8, n_kv_heads=4,
        intermediate=9216, head_dim=256, rope_theta=10000.0,
        norm_eps=1e-6, norm_offset=1.0, act_fn="gelu_tanh",
        embed_scale=True, embed_bits=8, sliding_window=4096,
        sliding_pattern=2, attn_softcap=50.0, final_softcap=30.0,
        post_norms=True, query_pre_attn_scalar=256.0,
    ),
    "gemma-2-9b": ModelConfig(
        vocab_size=256000, dim=3584, n_layers=42, n_heads=16, n_kv_heads=8,
        intermediate=14336, head_dim=256, rope_theta=10000.0,
        norm_eps=1e-6, norm_offset=1.0, act_fn="gelu_tanh",
        embed_scale=True, embed_bits=8, sliding_window=4096,
        sliding_pattern=2, attn_softcap=50.0, final_softcap=30.0,
        post_norms=True, query_pre_attn_scalar=256.0,
    ),
    # Gemma-3-1B (5:1 local/global alternation with per-type rope bases,
    # zero-centered QK-RMSNorm, post-norms, no softcaps, tied head).
    "gemma-3-1b": ModelConfig(
        vocab_size=262144, dim=1152, n_layers=26, n_heads=4, n_kv_heads=1,
        intermediate=6912, head_dim=256, rope_theta=1000000.0,
        rope_local_theta=10000.0, norm_eps=1e-6, norm_offset=1.0,
        act_fn="gelu_tanh", embed_scale=True, embed_bits=8,
        sliding_window=512, sliding_pattern=6, post_norms=True,
        qk_norm=True, query_pre_attn_scalar=256.0,
    ),
    # Qwen3-8B (QK-RMSNorm, no qkv bias, decoupled head_dim=128).
    "qwen3-8b": ModelConfig(
        vocab_size=151936, dim=4096, n_layers=36, n_heads=32, n_kv_heads=8,
        intermediate=12288, head_dim=128, rope_theta=1000000.0,
        norm_eps=1e-6, qk_norm=True, embed_bits=8,
    ),
    # 2-layer 4-expert toy for MoE unit tests.
    "test-tiny-moe": ModelConfig(
        vocab_size=512, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
        intermediate=512, group_size=64, kernel_mode="xla",
        n_experts=4, experts_per_token=2,
    ),
    # Mixtral-8x7B-v0.1 (8-expert top-2 sparse MLP; full causal attention
    # — the HF config's sliding_window was dropped in v0.1 updates).
    "mixtral-8x7b": ModelConfig(
        vocab_size=32000, dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
        intermediate=14336, rope_theta=1000000.0, embed_bits=8,
        n_experts=8, experts_per_token=2,
    ),
    # Qwen3-30B-A3B (128-expert top-8, per-expert intermediate 768,
    # QK-RMSNorm, renormed top-k probs).
    "qwen3-30b-a3b": ModelConfig(
        vocab_size=151936, dim=2048, n_layers=48, n_heads=32, n_kv_heads=4,
        intermediate=768, head_dim=128, rope_theta=1000000.0,
        norm_eps=1e-6, qk_norm=True, embed_bits=8,
        n_experts=128, experts_per_token=8, norm_topk=True,
    ),
}
