"""HF Llama checkpoint → packed quantized checkpoint (SURVEY.md §3a).

STREAMING conversion (VERDICT r1 #6): safetensors tensors are read lazily,
one at a time, quantized, entropy-packed and appended to the checkpoint via
:class:`CheckpointWriter` — peak RSS stays at a couple of tensors, so the
70B path (BASELINE.json:11, ~140 GB dense) converts on an ordinary host.
Transposes torch's [out, in] linear layout to our [K, N] (y = x @ W)
convention; the hot loop is the entropy coder (C++ ``libquantref`` when
available).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from quant_tpu.checkpoint.format import CheckpointWriter
from quant_tpu.core.qtensor import concat_columns, quantize_tensor
from quant_tpu.models.config import ModelConfig
from quant_tpu.models.llama import (QEmbed, _pad_cols,
                                    _pad_moe_down_k, _pad_vocab)

_LAYER_MAP = {
    "wq": "self_attn.q_proj",
    "wk": "self_attn.k_proj",
    "wv": "self_attn.v_proj",
    "wo": "self_attn.o_proj",
    "w_gate": "mlp.gate_proj",
    "w_up": "mlp.up_proj",
    "w_down": "mlp.down_proj",
}


class _HFReader:
    """Lazy safetensors reader: one tensor in RAM at a time."""

    def __init__(self, model_dir: pathlib.Path):
        from safetensors import safe_open

        files = sorted(model_dir.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"no .safetensors under {model_dir}")
        self._handles = [safe_open(str(f), framework="np") for f in files]
        self._index = {}
        for h in self._handles:
            for key in h.keys():
                self._index[key] = h

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def get(self, name: str) -> np.ndarray:
        return self._index[name].get_tensor(name)


def _rope_scaling_kw(rs) -> dict:
    """HF config.rope_scaling → ModelConfig rope fields. Supports the
    llama3 NTK-by-parts (Llama-3.1/3.2) and linear types."""
    if not rs:
        return {}
    rtype = rs.get("rope_type") or rs.get("type")
    if rtype == "llama3":
        return dict(
            rope_scaling="llama3",
            rope_factor=float(rs.get("factor", 8.0)),
            rope_low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            rope_high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            rope_orig_max_pos=int(
                rs.get("original_max_position_embeddings", 8192)),
        )
    if rtype == "linear":
        return dict(rope_scaling="linear",
                    rope_factor=float(rs.get("factor", 1.0)))
    if rtype == "yarn":
        return dict(
            rope_scaling="yarn",
            rope_factor=float(rs.get("factor", 1.0)),
            rope_orig_max_pos=int(
                rs.get("original_max_position_embeddings", 4096)),
            rope_mscale=float(rs.get("mscale") or 0.0),
            rope_mscale_all_dim=float(rs.get("mscale_all_dim") or 0.0),
            rope_beta_fast=float(rs.get("beta_fast") or 32.0),
            rope_beta_slow=float(rs.get("beta_slow") or 1.0),
            rope_attn_factor=float(rs.get("attention_factor") or 0.0),
        )
    if rtype in (None, "default"):
        return {}
    raise ValueError(f"unsupported rope_scaling type {rtype!r} "
                     "(supported: llama3, linear, yarn)")


def config_from_hf(model_dir, **overrides) -> ModelConfig:
    hf = json.loads((pathlib.Path(model_dir) / "config.json").read_text())
    mtype = hf.get("model_type", "llama")
    if mtype == "gemma3":
        raise ValueError(
            "multimodal gemma3 checkpoints (nested text_config + vision "
            "tower) are not supported; convert a gemma3_text checkpoint")
    if mtype == "gemma3_text":
        # HF stores the pattern explicitly and DEFAULTS the local rope
        # base to 10000 when absent — mirror both (a silent uniform-theta
        # fallback would wrong every sliding layer's rotation)
        pat = hf.get("sliding_window_pattern")
        if pat is not None and int(pat) != 6:
            raise ValueError(
                f"gemma3_text sliding_window_pattern {pat} != 6 is not "
                "supported")
        lts = hf.get("layer_types")
        if lts is not None and any(
                (t == "full_attention") != ((i + 1) % 6 == 0)
                for i, t in enumerate(lts)):
            raise ValueError("gemma3_text layer_types deviate from the "
                             "5:1 local/global pattern")
    # Gemma: (1+w) norms, tanh-GeLU gate, sqrt(dim)-scaled embeddings. HF
    # spells the activation gelu/gelu_pytorch_tanh under
    # hidden_act/hidden_activation depending on version.
    act = (hf.get("hidden_activation") or hf.get("hidden_act") or "silu")
    kw = dict(
        qkv_bias=bool(hf.get("attention_bias", False) or mtype == "qwen2"),
        vocab_size=hf["vocab_size"],
        dim=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=hf["num_attention_heads"],
        n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        intermediate=hf["intermediate_size"],
        head_dim=int(hf.get("head_dim") or 0),
        rope_theta=hf.get("rope_theta", 10000.0),
        **_rope_scaling_kw(hf.get("rope_scaling")),
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        # Mistral v0.1 sets sliding_window=4096; v0.2+ stores null
        sliding_window=int(hf.get("sliding_window") or 0)
        if hf.get("use_sliding_window", True) else 0,
        norm_offset=1.0 if mtype.startswith("gemma") else 0.0,
        act_fn="gelu_tanh" if "gelu" in act else "silu",
        embed_scale=mtype.startswith("gemma"),
        # Gemma-2: local/global alternation (layer 0 sliding), tanh
        # softcapping on attention scores + final logits, post-block
        # norms, decoupled attention score scale. Gemma-3 (text): 5:1
        # alternation, per-layer-type rope bases, QK-RMSNorm, no caps.
        sliding_pattern=(2 if mtype == "gemma2"
                         else 6 if mtype == "gemma3_text" else 0),
        attn_softcap=float(hf.get("attn_logit_softcapping") or 0.0),
        final_softcap=float(hf.get("final_logit_softcapping") or 0.0),
        post_norms=mtype in ("gemma2", "gemma3_text"),
        query_pre_attn_scalar=float(
            hf.get("query_pre_attn_scalar") or 0.0),
        rope_local_theta=(
            float(hf.get("rope_local_base_freq", 10000.0) or 10000.0)
            if mtype == "gemma3_text" else 0.0),
        qk_norm=mtype in ("qwen3", "qwen3_moe", "gemma3_text"),
        # Sparse MoE: Mixtral (num_local_experts) / Qwen3-MoE (num_experts)
        n_experts=(int(hf.get("num_local_experts", 0))
                   if mtype == "mixtral"
                   else int(hf.get("num_experts", 0))
                   if mtype == "qwen3_moe" else 0),
        experts_per_token=int(hf.get("num_experts_per_tok", 2) or 2),
        norm_topk=bool(hf.get("norm_topk_prob", True)),
    )
    if mtype == "qwen3_moe":
        # our MoE layer stack is uniformly sparse; Qwen3-MoE supports
        # interleaving dense layers — reject configs that use it
        if hf.get("mlp_only_layers") or hf.get("decoder_sparse_step", 1) != 1:
            raise ValueError("qwen3_moe with dense/interleaved MLP layers "
                             "(mlp_only_layers / decoder_sparse_step != 1) "
                             "is not supported")
        kw["intermediate"] = hf["moe_intermediate_size"]
    if mtype in ("deepseek_v2", "deepseek_v3"):
        v3 = mtype == "deepseek_v3"
        n_exp = int(hf.get("n_routed_experts") or 0)
        if not v3 and hf.get("topk_method") not in (
                None, "greedy", "group_limited_greedy") and n_exp:
            raise ValueError(
                f"deepseek_v2 topk_method {hf.get('topk_method')!r} is "
                "not supported (greedy | group_limited_greedy)")
        grouped = (v3 or hf.get("topk_method") == "group_limited_greedy")
        kw.update(
            n_kv_heads=1,           # MLA: one shared latent per token
            head_dim=0,             # derive qk_nope + qk_rope (the HF
                                    # config's head_dim is the ROPE dim)
            kv_lora_rank=int(hf["kv_lora_rank"]),
            q_lora_rank=int(hf.get("q_lora_rank") or 0),
            qk_nope_head_dim=int(hf["qk_nope_head_dim"]),
            qk_rope_head_dim=int(hf["qk_rope_head_dim"]),
            v_head_dim=int(hf["v_head_dim"]),
            # V2 always rotates interleaved pairs (complex rope); V3
            # stores the choice (rope_interleave, default true)
            rope_interleaved=bool(hf.get("rope_interleave", True))
            if v3 else True,
            n_experts=n_exp,
            experts_per_token=int(hf.get("num_experts_per_tok") or 2),
            # the HF V2 gate IGNORES norm_topk_prob; V3 honors it
            norm_topk=bool(hf.get("norm_topk_prob", v3)) if v3 else False,
            n_shared_experts=int(hf.get("n_shared_experts") or 0),
            first_k_dense=(int(hf.get("first_k_dense_replace") or 0)
                           if n_exp else 0),
            dense_intermediate=hf["intermediate_size"] if n_exp else 0,
            intermediate=(hf["moe_intermediate_size"] if n_exp
                          else hf["intermediate_size"]),
            routed_scaling=float(hf.get("routed_scaling_factor") or 1.0),
            score_fn="sigmoid" if v3 else "softmax",
            router_bias=v3,
            n_expert_groups=int(hf.get("n_group") or 0) if grouped else 0,
            topk_groups=int(hf.get("topk_group") or 0) if grouped else 0,
            group_score="top2sum" if v3 else "max",
            qkv_bias=False,
        )
        if bool(hf.get("attention_bias", False)):
            raise ValueError("deepseek attention_bias is not supported")
        rs = hf.get("rope_scaling") or {}
        if (rs.get("rope_type") or rs.get("type")) == "yarn" and \
                rs.get("mscale_all_dim"):
            # BOTH DeepSeek generations were trained/released with the
            # yarn mscale^2 softmax scale (deepseek-ai modeling code;
            # vLLM/sglang mirror it). transformers' integrated
            # DeepseekV2 OMITS it — we follow the original semantics
            # for converted checkpoints; the V2 architecture parity
            # tests run without yarn so they still pin vs transformers.
            kw["score_mscale"] = True
    if float(hf.get("partial_rotary_factor") or 1.0) != 1.0:
        raise ValueError("partial_rotary_factor != 1 is not supported")
    kw.update(overrides)
    return ModelConfig(**kw)


def _qkv_parts(hf, cfg, pre: str, t) -> list[np.ndarray]:
    """[wq, wk, wv] as [K, N] parts — from separate q/k/v projections or
    Phi-3's fused qkv_proj ([q | k | v] columns, the same part order as
    our fusion)."""
    if pre + "self_attn.qkv_proj.weight" in hf:
        fused = t(pre + "self_attn.qkv_proj.weight")
        nq = cfg.n_heads * cfg.head_dim
        nkv = cfg.n_kv_heads * cfg.head_dim
        return [fused[:, :nq], fused[:, nq:nq + nkv],
                fused[:, nq + nkv:]]
    return [t(pre + "self_attn.q_proj.weight"),
            t(pre + "self_attn.k_proj.weight"),
            t(pre + "self_attn.v_proj.weight")]


def _gu_parts(hf, cfg, pre: str, t) -> list[np.ndarray]:
    """[w_gate, w_up] — separate projections or Phi-3's fused
    gate_up_proj ([gate | up] columns)."""
    if pre + "mlp.gate_up_proj.weight" in hf:
        fused = t(pre + "mlp.gate_up_proj.weight")
        half = fused.shape[1] // 2
        return [fused[:, :half], fused[:, half:]]
    return [t(pre + "mlp.gate_proj.weight"),
            t(pre + "mlp.up_proj.weight")]


def _embed_host(table: np.ndarray, cfg: ModelConfig):
    """Numpy mirror of llama._make_embed (the converter must stay off the
    accelerator — host→device paths can be MB/s-slow on relayed setups)."""
    if cfg.embed_bits == 8:
        t = table.astype(np.float32)
        absmax = np.max(np.abs(t), axis=1)
        scales = np.where(absmax == 0, 1.0, absmax / 127.0).astype(
            np.float32)
        codes = np.round(t / scales[:, None]).astype(np.int8)
        return QEmbed(codes=codes, scales=scales)
    return table.astype(np.dtype(cfg.dtype))


def convert_hf_llama(
    model_dir,
    out_dir,
    bits: int = 4,
    group_size: int = 128,
    tp: int = 1,
    cfg: ModelConfig | None = None,
    algo: str = "rtn",
    calib_tokens: np.ndarray | None = None,
    codebook: str | None = None,
) -> ModelConfig:
    """Convert a HF Llama directory to a packed quantized checkpoint,
    streaming tensor-by-tensor (bounded RSS).

    ``tp``: intended tensor-parallel degree — column-fused tensors are
    interleaved per shard, int4 row-split tensors packed with kshards=tp,
    and the checkpoint's blobs are split per TP rank (see format.py).

    ``algo="gptq"`` runs the sequential error-compensated calibration
    (core/calibrate.py) over ``calib_tokens`` [B, T] int ids: each
    layer's projections are quantized against the running float32
    activations and the quantized layer's outputs feed the next — same
    streaming order, same checkpoint format, smarter codes. lm_head is
    then quantized LAST (against the final-norm output), re-reading its
    tensor instead of holding it across the pass.
    """
    model_dir = pathlib.Path(model_dir)
    if cfg is None:
        cfg = config_from_hf(model_dir, bits=bits, group_size=group_size)
    if codebook is not None:
        import dataclasses as _dc
        cfg = _dc.replace(cfg, codebook=codebook)
    if algo not in ("rtn", "gptq", "awq", "awq+gptq"):
        raise ValueError(
            f"algo must be rtn|gptq|awq|awq+gptq, got {algo!r}")
    if algo != "rtn" and calib_tokens is None:
        raise ValueError(f"algo={algo!r} needs calib_tokens [B, T] ids")
    hf = _HFReader(model_dir)
    hf_cfg = json.loads((model_dir / "config.json").read_text())
    w = CheckpointWriter(out_dir, cfg, tp=tp)

    def t(name):  # [out, in] -> [K, N]
        return np.ascontiguousarray(hf.get(name).astype(np.float32).T)

    if cfg.codebook is not None and algo != "rtn":
        raise ValueError(
            "codebook quantization composes with algo='rtn' only (GPTQ's "
            "error-compensated rounding assumes the uniform grid)")

    def qz(arr, kshards=1):
        return quantize_tensor(arr, cfg.bits, cfg.group_size,
                               kshards=kshards, codebook=cfg.codebook)

    def read_lm_head():
        if hf_cfg.get("tie_word_embeddings") or "lm_head.weight" not in hf:
            return np.ascontiguousarray(
                hf.get("model.embed_tokens.weight").astype(np.float32).T)
        return t("lm_head.weight")

    embed = hf.get("model.embed_tokens.weight").astype(np.float32)
    w.add("embed", _embed_host(embed, cfg))
    w.add("final_norm", hf.get("model.norm.weight").astype(np.float32))
    cal = None
    if algo != "rtn":
        from quant_tpu.core.calibrate import GPTQCalibrator

        cal = GPTQCalibrator(
            cfg, calib_tokens, embed, tp=tp,
            algo=("rtn" if algo == "awq" else "gptq"),
            awq=algo in ("awq", "awq+gptq"))
    else:
        w.add("lm_head",
              qz(_pad_cols(read_lm_head(), _pad_vocab(cfg.vocab_size))))
    del embed

    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        if cfg.is_mla:
            if cal is not None:
                _convert_layer_deepseek_gptq(w, hf, cfg, cal, i, t)
            else:
                _convert_layer_deepseek(w, hf, cfg, i, t, qz, tp)
            continue
        if cal is not None:
            _convert_layer_gptq(w, hf, cfg, cal, i, t, tp)
            continue
        w.add(f"layers.{i}.wqkv", qz(concat_columns(
            _qkv_parts(hf, cfg, pre, t), tp)))
        w.add(f"layers.{i}.wo",
              qz(t(pre + "self_attn.o_proj.weight"), kshards=tp))
        if cfg.n_experts:
            # Sparse MoE: router [D, E] raw; per-expert fused gate|up and
            # down, one blob per (layer, expert) — streaming-RSS stays one
            # expert tensor. Two HF namings: Mixtral block_sparse_moe
            # (gate / experts.N.{w1,w3,w2}) and Qwen3-MoE mlp
            # (gate / experts.N.{gate_proj,up_proj,down_proj}).
            mixtral = pre + "block_sparse_moe.gate.weight" in hf
            moe_pre = pre + ("block_sparse_moe." if mixtral else "mlp.")
            names = (("w1", "w3", "w2") if mixtral
                     else ("gate_proj", "up_proj", "down_proj"))
            w.add(f"layers.{i}.router", t(moe_pre + "gate.weight"))
            for e in range(cfg.n_experts):
                epre = moe_pre + f"experts.{e}."
                w.add(f"layers.{i}.we_gate_up.{e}", qz(concat_columns(
                    [t(f"{epre}{names[0]}.weight"),
                     t(f"{epre}{names[1]}.weight")], tp)))
                w.add(f"layers.{i}.we_down.{e}",
                      qz(_pad_moe_down_k(
                          t(f"{epre}{names[2]}.weight"), tp),
                         kshards=tp))
        else:
            w.add(f"layers.{i}.w_gate_up", qz(concat_columns(
                _gu_parts(hf, cfg, pre, t), tp)))
            w.add(f"layers.{i}.w_down",
                  qz(t(pre + "mlp.down_proj.weight"), kshards=tp))
        w.add(f"layers.{i}.attn_norm",
              hf.get(pre + "input_layernorm.weight").astype(np.float32))
        if cfg.post_norms:
            # Gemma-2 four-norm layout: HF's post_attention_layernorm is
            # the POST norm on the attention output; the pre-MLP norm is
            # pre_feedforward_layernorm (in Llama-likes,
            # post_attention_layernorm IS the pre-MLP norm).
            w.add(f"layers.{i}.mlp_norm",
                  hf.get(pre + "pre_feedforward_layernorm.weight").astype(
                      np.float32))
            w.add(f"layers.{i}.post_attn_norm",
                  hf.get(pre + "post_attention_layernorm.weight").astype(
                      np.float32))
            w.add(f"layers.{i}.post_mlp_norm",
                  hf.get(pre + "post_feedforward_layernorm.weight").astype(
                      np.float32))
        else:
            w.add(f"layers.{i}.mlp_norm",
                  hf.get(pre + "post_attention_layernorm.weight").astype(
                      np.float32))
        if pre + "self_attn.q_proj.bias" in hf:  # Qwen2 family
            bias = concat_columns(
                [hf.get(pre + "self_attn.q_proj.bias")[None, :].astype(
                    np.float32),
                 hf.get(pre + "self_attn.k_proj.bias")[None, :].astype(
                     np.float32),
                 hf.get(pre + "self_attn.v_proj.bias")[None, :].astype(
                     np.float32)], tp)[0]
        else:
            nq = cfg.n_heads * cfg.head_dim
            nkv = cfg.n_kv_heads * cfg.head_dim
            bias = np.zeros((nq + 2 * nkv,), np.float32)
        w.add(f"layers.{i}.qkv_bias", bias)
        for field, hf_name in (("q_norm", "self_attn.q_norm.weight"),
                               ("k_norm", "self_attn.k_norm.weight")):
            w.add(f"layers.{i}.{field}",
                  hf.get(pre + hf_name).astype(np.float32)
                  if pre + hf_name in hf  # Qwen3 QK-RMSNorm
                  else np.ones((cfg.head_dim,), np.float32))
    if cal is not None:
        w.add("lm_head", cal.finish(
            hf.get("model.norm.weight").astype(np.float32),
            _pad_cols(read_lm_head(), _pad_vocab(cfg.vocab_size))))
    w.finish()
    return cfg


def _convert_layer_deepseek(w, hf, cfg, i, t, qz, tp=1):
    """One DeepseekV2/V3 layer → our MLA blob set. Layer i lands in the
    ``layers0`` stack (dense prefix, local index i) when
    i < first_k_dense, else in ``layers`` at local index
    i - first_k_dense. HF's per-head kv_b_proj [H*(dn+dv), r] splits
    into the ABSORBED w_uk [H, dn, r] / w_uv [H, r, dv] (stored raw
    f32 — they fold into query/output einsums, not the 2-D stacked
    matmul kernel)."""
    pre = f"model.layers.{i}."
    k0 = cfg.first_k_dense
    dst = (f"layers0.{i}" if i < k0 else f"layers.{i - k0}")
    r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim

    if cfg.q_lora_rank:
        qpart = t(pre + "self_attn.q_a_proj.weight")
        w.add(f"{dst}.q_a_norm",
              hf.get(pre + "self_attn.q_a_layernorm.weight").astype(
                  np.float32))
        w.add(f"{dst}.w_q_b", qz(t(pre + "self_attn.q_b_proj.weight")))
    else:
        qpart = t(pre + "self_attn.q_proj.weight")
    kv_a = t(pre + "self_attn.kv_a_proj_with_mqa.weight")
    w.add(f"{dst}.wqkv", qz(concat_columns([qpart, kv_a], tp)))
    w.add(f"{dst}.qkv_bias",
          np.zeros((qpart.shape[1] + r + dr,), np.float32))
    w.add(f"{dst}.kv_a_norm",
          hf.get(pre + "self_attn.kv_a_layernorm.weight").astype(
              np.float32))
    kvb = hf.get(pre + "self_attn.kv_b_proj.weight").astype(
        np.float32).reshape(cfg.n_heads, dn + dv, r)
    w.add(f"{dst}.w_uk", np.ascontiguousarray(kvb[:, :dn, :]))
    w.add(f"{dst}.w_uv",
          np.ascontiguousarray(kvb[:, dn:, :].transpose(0, 2, 1)))
    w.add(f"{dst}.wo", qz(t(pre + "self_attn.o_proj.weight"),
                          kshards=tp))
    w.add(f"{dst}.attn_norm",
          hf.get(pre + "input_layernorm.weight").astype(np.float32))
    w.add(f"{dst}.mlp_norm",
          hf.get(pre + "post_attention_layernorm.weight").astype(
              np.float32))
    w.add(f"{dst}.q_norm", np.ones((cfg.head_dim,), np.float32))
    w.add(f"{dst}.k_norm", np.ones((cfg.head_dim,), np.float32))
    if i < k0 or not cfg.n_experts:
        w.add(f"{dst}.w_gate_up", qz(concat_columns(
            [t(pre + "mlp.gate_proj.weight"),
             t(pre + "mlp.up_proj.weight")], tp)))
        w.add(f"{dst}.w_down", qz(t(pre + "mlp.down_proj.weight"),
                                  kshards=tp))
        return
    w.add(f"{dst}.router", t(pre + "mlp.gate.weight"))
    if cfg.router_bias:
        w.add(f"{dst}.router_bias",
              hf.get(pre + "mlp.gate.e_score_correction_bias").astype(
                  np.float32))
    if cfg.n_shared_experts:
        w.add(f"{dst}.ws_gate_up", qz(concat_columns(
            [t(pre + "mlp.shared_experts.gate_proj.weight"),
             t(pre + "mlp.shared_experts.up_proj.weight")], tp)))
        w.add(f"{dst}.ws_down",
              qz(t(pre + "mlp.shared_experts.down_proj.weight"),
                 kshards=tp))
    for e in range(cfg.n_experts):
        epre = pre + f"mlp.experts.{e}."
        w.add(f"{dst}.we_gate_up.{e}", qz(concat_columns(
            [t(epre + "gate_proj.weight"),
             t(epre + "up_proj.weight")], tp)))
        w.add(f"{dst}.we_down.{e}",
              qz(_pad_moe_down_k(t(epre + "down_proj.weight"), tp),
                 kshards=tp))


def _convert_layer_deepseek_gptq(w, hf, cfg, cal, i, t):
    """GPTQ variant of :func:`_convert_layer_deepseek`: assemble the
    MLA layer dict in the calibrator's naming, run the sequential step,
    write the same blob set (absorbed w_uk/w_uv pass through raw)."""
    pre = f"model.layers.{i}."
    k0 = cfg.first_k_dense
    dst = (f"layers0.{i}" if i < k0 else f"layers.{i - k0}")
    r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    dn, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
    kvb = hf.get(pre + "self_attn.kv_b_proj.weight").astype(
        np.float32).reshape(cfg.n_heads, dn + dv, r)
    dense = {
        "w_kv_a": t(pre + "self_attn.kv_a_proj_with_mqa.weight"),
        "kv_a_norm": hf.get(
            pre + "self_attn.kv_a_layernorm.weight").astype(np.float32),
        "w_uk": np.ascontiguousarray(kvb[:, :dn, :]),
        "w_uv": np.ascontiguousarray(kvb[:, dn:, :].transpose(0, 2, 1)),
        "wo": t(pre + "self_attn.o_proj.weight"),
        "attn_norm": hf.get(
            pre + "input_layernorm.weight").astype(np.float32),
        "mlp_norm": hf.get(
            pre + "post_attention_layernorm.weight").astype(np.float32),
    }
    if cfg.q_lora_rank:
        dense["w_q_a"] = t(pre + "self_attn.q_a_proj.weight")
        dense["q_a_norm"] = hf.get(
            pre + "self_attn.q_a_layernorm.weight").astype(np.float32)
        dense["w_q_b"] = t(pre + "self_attn.q_b_proj.weight")
    else:
        dense["wq"] = t(pre + "self_attn.q_proj.weight")
    moe_l = cfg.n_experts and i >= k0
    if not moe_l:
        dense["w_gate"] = t(pre + "mlp.gate_proj.weight")
        dense["w_up"] = t(pre + "mlp.up_proj.weight")
        dense["w_down"] = t(pre + "mlp.down_proj.weight")
    else:
        dense["router"] = t(pre + "mlp.gate.weight")
        if cfg.router_bias:
            dense["router_bias"] = hf.get(
                pre + "mlp.gate.e_score_correction_bias").astype(
                    np.float32)
        dense["shared.w_gate"] = t(
            pre + "mlp.shared_experts.gate_proj.weight")
        dense["shared.w_up"] = t(
            pre + "mlp.shared_experts.up_proj.weight")
        dense["shared.w_down"] = t(
            pre + "mlp.shared_experts.down_proj.weight")
        for e in range(cfg.n_experts):
            epre = pre + f"mlp.experts.{e}."
            dense[f"expert{e}.w_gate"] = t(epre + "gate_proj.weight")
            dense[f"expert{e}.w_up"] = t(epre + "up_proj.weight")
            dense[f"expert{e}.w_down"] = t(epre + "down_proj.weight")

    qd = cal.layer(dense)
    qw = dense.get("wq", dense.get("w_q_a")).shape[1]
    w.add(f"{dst}.wqkv", qd["wqkv"])
    w.add(f"{dst}.qkv_bias", np.zeros((qw + r + dr,), np.float32))
    if cfg.q_lora_rank:
        w.add(f"{dst}.w_q_b", qd["w_q_b"])
        w.add(f"{dst}.q_a_norm", qd["q_a_norm"])
    w.add(f"{dst}.kv_a_norm", qd["kv_a_norm"])
    w.add(f"{dst}.w_uk", qd["w_uk"])
    w.add(f"{dst}.w_uv", qd["w_uv"])
    w.add(f"{dst}.wo", qd["wo"])
    w.add(f"{dst}.attn_norm", qd["attn_norm"])
    w.add(f"{dst}.mlp_norm", qd["mlp_norm"])
    w.add(f"{dst}.q_norm", np.ones((cfg.head_dim,), np.float32))
    w.add(f"{dst}.k_norm", np.ones((cfg.head_dim,), np.float32))
    if not moe_l:
        w.add(f"{dst}.w_gate_up", qd["w_gate_up"])
        w.add(f"{dst}.w_down", qd["w_down"])
        return
    w.add(f"{dst}.router", qd["router"])
    if cfg.router_bias:
        w.add(f"{dst}.router_bias", qd["router_bias"])
    w.add(f"{dst}.ws_gate_up", qd["ws_gate_up"])
    w.add(f"{dst}.ws_down", qd["ws_down"])
    for e in range(cfg.n_experts):
        w.add(f"{dst}.we_gate_up.{e}", qd[f"we_gate_up.{e}"])
        w.add(f"{dst}.we_down.{e}", qd[f"we_down.{e}"])


def _convert_layer_gptq(w, hf, cfg, cal, i, t, tp):
    """One layer of the algo="gptq" conversion: assemble the dense layer
    dict in the calibrator's naming, run the sequential GPTQ step, and
    write the exact tensor set the RTN path writes."""
    pre = f"model.layers.{i}."

    def norm(name, default_shape=None):
        if pre + name in hf:
            return hf.get(pre + name).astype(np.float32)
        return np.ones(default_shape, np.float32)

    wq, wk, wv = _qkv_parts(hf, cfg, pre, t)
    dense = {
        "wq": wq, "wk": wk, "wv": wv,
        "wo": t(pre + "self_attn.o_proj.weight"),
        "attn_norm": norm("input_layernorm.weight"),
    }
    if cfg.post_norms:
        dense["mlp_norm"] = norm("pre_feedforward_layernorm.weight")
        dense["post_attn_norm"] = norm("post_attention_layernorm.weight")
        dense["post_mlp_norm"] = norm("post_feedforward_layernorm.weight")
    else:
        dense["mlp_norm"] = norm("post_attention_layernorm.weight")
    if pre + "self_attn.q_proj.bias" in hf:
        for f, n in (("q_bias", "q_proj"), ("k_bias", "k_proj"),
                     ("v_bias", "v_proj")):
            dense[f] = hf.get(
                pre + f"self_attn.{n}.bias").astype(np.float32)
    if cfg.qk_norm:
        dense["q_norm"] = norm("self_attn.q_norm.weight",
                               (cfg.head_dim,))
        dense["k_norm"] = norm("self_attn.k_norm.weight",
                               (cfg.head_dim,))
    if cfg.n_experts:
        mixtral = pre + "block_sparse_moe.gate.weight" in hf
        moe_pre = pre + ("block_sparse_moe." if mixtral else "mlp.")
        names = (("w1", "w3", "w2") if mixtral
                 else ("gate_proj", "up_proj", "down_proj"))
        dense["router"] = t(moe_pre + "gate.weight")
        for e in range(cfg.n_experts):
            epre = moe_pre + f"experts.{e}."
            dense[f"expert{e}.w_gate"] = t(f"{epre}{names[0]}.weight")
            dense[f"expert{e}.w_up"] = t(f"{epre}{names[1]}.weight")
            dense[f"expert{e}.w_down"] = t(f"{epre}{names[2]}.weight")
    else:
        dense["w_gate"], dense["w_up"] = _gu_parts(hf, cfg, pre, t)
        dense["w_down"] = t(pre + "mlp.down_proj.weight")

    qd = cal.layer(dense)
    # AWQ may fold equalization scales into the norm gains
    dense["attn_norm"] = np.asarray(qd["attn_norm"], np.float32)
    dense["mlp_norm"] = np.asarray(qd["mlp_norm"], np.float32)
    w.add(f"layers.{i}.wqkv", qd["wqkv"])
    w.add(f"layers.{i}.wo", qd["wo"])
    if cfg.n_experts:
        w.add(f"layers.{i}.router", dense["router"])
        for e in range(cfg.n_experts):
            w.add(f"layers.{i}.we_gate_up.{e}", qd[f"we_gate_up.{e}"])
            w.add(f"layers.{i}.we_down.{e}", qd[f"we_down.{e}"])
    else:
        w.add(f"layers.{i}.w_gate_up", qd["w_gate_up"])
        w.add(f"layers.{i}.w_down", qd["w_down"])
    w.add(f"layers.{i}.attn_norm", dense["attn_norm"])
    w.add(f"layers.{i}.mlp_norm", dense["mlp_norm"])
    if cfg.post_norms:
        w.add(f"layers.{i}.post_attn_norm", dense["post_attn_norm"])
        w.add(f"layers.{i}.post_mlp_norm", dense["post_mlp_norm"])
    nq = cfg.n_heads * cfg.head_dim
    nkv = cfg.n_kv_heads * cfg.head_dim
    if "q_bias" in dense:
        from quant_tpu.core.qtensor import concat_columns as _cc
        bias = _cc([dense["q_bias"][None, :], dense["k_bias"][None, :],
                    dense["v_bias"][None, :]], tp)[0]
    else:
        bias = np.zeros((nq + 2 * nkv,), np.float32)
    w.add(f"layers.{i}.qkv_bias", bias)
    w.add(f"layers.{i}.q_norm",
          dense.get("q_norm", np.ones((cfg.head_dim,), np.float32)))
    w.add(f"layers.{i}.k_norm",
          dense.get("k_norm", np.ones((cfg.head_dim,), np.float32)))
