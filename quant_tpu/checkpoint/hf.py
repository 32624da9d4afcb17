"""HF Llama checkpoint → packed quantized checkpoint (SURVEY.md §3a).

Reads safetensors shards from a HuggingFace model directory, transposes
torch's [out, in] linear layout to our [K, N] (y = x @ W) convention,
quantizes each projection with the oracle-contract codec, and writes the
entropy-packed checkpoint. Offline, host-only; the hot loop is the entropy
coder (C++ ``libquantref`` when available).
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from quant_tpu.checkpoint.format import save_checkpoint
from quant_tpu.models.config import ModelConfig
from quant_tpu.models.llama import quantize_dense_params

_LAYER_MAP = {
    "wq": "self_attn.q_proj",
    "wk": "self_attn.k_proj",
    "wv": "self_attn.v_proj",
    "wo": "self_attn.o_proj",
    "w_gate": "mlp.gate_proj",
    "w_up": "mlp.up_proj",
    "w_down": "mlp.down_proj",
}


def _load_hf_tensors(model_dir: pathlib.Path) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    files = sorted(model_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {model_dir}")
    out: dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for key in sf.keys():
                out[key] = sf.get_tensor(key)
    return out


def config_from_hf(model_dir, **overrides) -> ModelConfig:
    hf = json.loads((pathlib.Path(model_dir) / "config.json").read_text())
    kw = dict(
        qkv_bias=bool(hf.get("attention_bias", False)
                      or hf.get("model_type") == "qwen2"),
        vocab_size=hf["vocab_size"],
        dim=hf["hidden_size"],
        n_layers=hf["num_hidden_layers"],
        n_heads=hf["num_attention_heads"],
        n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        intermediate=hf["intermediate_size"],
        head_dim=int(hf.get("head_dim") or 0),
        rope_theta=hf.get("rope_theta", 10000.0),
        norm_eps=hf.get("rms_norm_eps", 1e-5),
    )
    kw.update(overrides)
    return ModelConfig(**kw)


def convert_hf_llama(
    model_dir,
    out_dir,
    bits: int = 4,
    group_size: int = 128,
    tp: int = 1,
    cfg: ModelConfig | None = None,
) -> ModelConfig:
    """Convert a HF Llama directory to a packed quantized checkpoint.

    ``tp``: intended tensor-parallel degree (int4 row-split tensors are
    packed with kshards=tp; see QTensor.kshards).
    """
    model_dir = pathlib.Path(model_dir)
    if cfg is None:
        cfg = config_from_hf(model_dir, bits=bits, group_size=group_size)
    hf = _load_hf_tensors(model_dir)
    hf_cfg = json.loads((model_dir / "config.json").read_text())

    def t(name):  # [out, in] -> [K, N]
        return np.ascontiguousarray(
            hf[name].astype(np.float32).T
        )

    dense: dict[str, np.ndarray] = {
        "embed": hf["model.embed_tokens.weight"].astype(np.float32),
        "final_norm": hf["model.norm.weight"].astype(np.float32),
    }
    if hf_cfg.get("tie_word_embeddings") or "lm_head.weight" not in hf:
        dense["lm_head"] = np.ascontiguousarray(
            dense["embed"].T
        )
    else:
        dense["lm_head"] = t("lm_head.weight")
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        for ours, theirs in _LAYER_MAP.items():
            dense[f"layers.{i}.{ours}"] = t(pre + theirs + ".weight")
        if pre + "self_attn.q_proj.bias" in hf:  # Qwen2 family
            for ours, theirs in (("q_bias", "q_proj"), ("k_bias", "k_proj"),
                                 ("v_bias", "v_proj")):
                dense[f"layers.{i}.{ours}"] = hf[
                    pre + f"self_attn.{theirs}.bias"
                ].astype(np.float32)
        dense[f"layers.{i}.attn_norm"] = hf[
            pre + "input_layernorm.weight"
        ].astype(np.float32)
        dense[f"layers.{i}.mlp_norm"] = hf[
            pre + "post_attention_layernorm.weight"
        ].astype(np.float32)

    params = quantize_dense_params(dense, cfg, tp=tp)
    save_checkpoint(out_dir, params, cfg)
    return cfg
