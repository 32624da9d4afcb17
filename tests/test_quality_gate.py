"""Quantization quality gate (BASELINE.json:9-shaped, dataset-free).

The real config-3 gate is WikiText-2 perplexity Δ vs an fp baseline; this
box has no datasets or tokenizers (zero egress), so the same structure runs
on a natural byte stream (this repo's README) with a tiny random-init
model: our INT4+INT8-KV runtime's perplexity must sit within a few percent
of a torch fp32 model running the ORIGINAL dense weights. Catches both
quantization-quality regressions and runtime NLL bugs.
"""

import dataclasses
import pathlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from quant_tpu.eval import perplexity
from quant_tpu.models import PRESETS, llama

CFG = dataclasses.replace(PRESETS["test-tiny"], bits=4, group_size=64,
                          dtype="float32")
WINDOW = 96


def _dense_weights(cfg, seed=0):
    rng = np.random.default_rng(seed)
    d, hd, it, v = cfg.dim, cfg.head_dim, cfg.intermediate, cfg.vocab_size

    def w(k, n):
        return rng.standard_normal((k, n)).astype(np.float32) / np.sqrt(k)

    dense = {
        "embed": rng.standard_normal((v, d)).astype(np.float32) * 0.05,
        "final_norm": np.ones(d, np.float32),
        "lm_head": w(d, v),
    }
    for i in range(cfg.n_layers):
        dense[f"layers.{i}.wq"] = w(d, cfg.n_heads * hd)
        dense[f"layers.{i}.wk"] = w(d, cfg.n_kv_heads * hd)
        dense[f"layers.{i}.wv"] = w(d, cfg.n_kv_heads * hd)
        dense[f"layers.{i}.wo"] = w(cfg.n_heads * hd, d)
        dense[f"layers.{i}.w_gate"] = w(d, it)
        dense[f"layers.{i}.w_up"] = w(d, it)
        dense[f"layers.{i}.w_down"] = w(it, d)
        dense[f"layers.{i}.attn_norm"] = np.ones(d, np.float32)
        dense[f"layers.{i}.mlp_norm"] = np.ones(d, np.float32)
    return dense


def _torch_fp_model(dense, cfg):
    from transformers import LlamaConfig, LlamaForCausalLM

    model = LlamaForCausalLM(LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads,
        rms_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        attention_bias=False, tie_word_embeddings=False,
    ))
    model.eval()
    t = lambda x: torch.from_numpy(np.ascontiguousarray(x.T))
    sd = {
        "model.embed_tokens.weight": torch.from_numpy(dense["embed"]),
        "model.norm.weight": torch.from_numpy(dense["final_norm"]),
        "lm_head.weight": t(dense["lm_head"]),
    }
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        g = lambda n: dense[f"layers.{i}.{n}"]
        sd[pre + "self_attn.q_proj.weight"] = t(g("wq"))
        sd[pre + "self_attn.k_proj.weight"] = t(g("wk"))
        sd[pre + "self_attn.v_proj.weight"] = t(g("wv"))
        sd[pre + "self_attn.o_proj.weight"] = t(g("wo"))
        sd[pre + "mlp.gate_proj.weight"] = t(g("w_gate"))
        sd[pre + "mlp.up_proj.weight"] = t(g("w_up"))
        sd[pre + "mlp.down_proj.weight"] = t(g("w_down"))
        sd[pre + "input_layernorm.weight"] = torch.from_numpy(g("attn_norm"))
        sd[pre + "post_attention_layernorm.weight"] = torch.from_numpy(
            g("mlp_norm"))
    model.load_state_dict(sd, strict=False)
    return model


def _torch_ppl(model, toks, window):
    import math
    total, count = 0.0, 0
    n_win = (toks.size - 1) // window
    with torch.no_grad():
        for i in range(n_win):
            win = toks[i * window: i * window + window + 1]
            inp = torch.from_numpy(win[None, :-1].astype(np.int64))
            logits = model(inp).logits[0]
            lp = torch.log_softmax(logits.float(), dim=-1)
            tgt = torch.from_numpy(win[1:].astype(np.int64))
            total += float(-lp[torch.arange(window), tgt].sum())
            count += window
    return math.exp(total / count)


def test_int4_ppl_within_delta_of_fp():
    dense = _dense_weights(CFG)
    params = llama.quantize_dense_params(dense, CFG)
    text = (pathlib.Path(__file__).resolve().parents[1] / "README.md"
            ).read_bytes()
    toks = np.frombuffer(text, dtype=np.uint8).astype(np.int32)[:2000]
    assert toks.max() < CFG.vocab_size

    ours = perplexity(params, CFG, toks, window=WINDOW)
    fp = _torch_ppl(_torch_fp_model(dense, CFG), toks, WINDOW)
    delta = abs(ours["ppl"] - fp) / fp
    # INT4 (gs=64) + INT8 KV on a tiny random model: small perturbation
    assert delta < 0.05, (ours["ppl"], fp, delta)
