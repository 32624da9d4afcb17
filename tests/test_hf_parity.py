"""Architecture parity vs transformers' LlamaForCausalLM (torch CPU).

Both models run the SAME dequantized weights, so any disagreement is an
architecture-semantics bug (RoPE convention, GQA head mapping, norm
placement, SwiGLU wiring) rather than quantization error. This pins our
pure-JAX Llama to the de-facto reference implementation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from quant_tpu.models import PRESETS, llama

CFG = dataclasses.replace(PRESETS["test-tiny"], bits=8, dtype="float32",
                          group_size=64)


def _hf_model_from_params(params, cfg):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers,
        num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads,
        rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg)
    model.eval()

    def t(x):  # [K, N] -> torch [N, K]
        return torch.from_numpy(np.asarray(x, np.float32).T.copy())

    units = cfg.n_heads + 2 * cfg.n_kv_heads
    sd = {}
    sd["model.embed_tokens.weight"] = torch.from_numpy(
        np.asarray(params.embed, np.float32))
    sd["model.norm.weight"] = torch.from_numpy(
        np.asarray(params.final_norm, np.float32))
    sd["lm_head.weight"] = t(params.lm_head.dequantize())
    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params.layers)
        wqkv = np.asarray(lp.wqkv.local_view().dequantize())
        nq = (wqkv.shape[1] * cfg.n_heads) // units
        nkv = (wqkv.shape[1] * cfg.n_kv_heads) // units
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.q_proj.weight"] = t(wqkv[:, :nq])
        sd[pre + "self_attn.k_proj.weight"] = t(wqkv[:, nq:nq + nkv])
        sd[pre + "self_attn.v_proj.weight"] = t(wqkv[:, nq + nkv:])
        sd[pre + "self_attn.o_proj.weight"] = t(
            lp.wo.local_view().dequantize())
        wgu = np.asarray(lp.w_gate_up.local_view().dequantize())
        half = wgu.shape[1] // 2
        sd[pre + "mlp.gate_proj.weight"] = t(wgu[:, :half])
        sd[pre + "mlp.up_proj.weight"] = t(wgu[:, half:])
        sd[pre + "mlp.down_proj.weight"] = t(
            lp.w_down.local_view().dequantize())
        sd[pre + "input_layernorm.weight"] = torch.from_numpy(
            np.asarray(lp.attn_norm, np.float32))
        sd[pre + "post_attention_layernorm.weight"] = torch.from_numpy(
            np.asarray(lp.mlp_norm, np.float32))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # rotary inv_freq buffers may be "missing" — they are computed, fine
    assert all("inv_freq" in m for m in missing), missing
    return model


def test_logits_match_transformers():
    params = llama.init_params(CFG, seed=0)
    hf = _hf_model_from_params(params, CFG)
    toks = np.random.default_rng(0).integers(2, CFG.vocab_size, (2, 7))

    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(toks)).logits.numpy()

    cache = llama.init_cache(CFG, 2, 16)
    ours, _ = llama.forward(params, jnp.asarray(toks, jnp.int32), cache, CFG)
    ours = np.asarray(ours, np.float32)

    # fp32 KV would match tightly; our int8 KV quantization adds small noise
    # on the attention path, so compare with a modest tolerance AND require
    # identical greedy tokens everywhere.
    np.testing.assert_allclose(ours, hf_logits, rtol=0.1, atol=0.15)
    # int8-KV noise may flip the occasional near-tie argmax; require the
    # overwhelming majority to agree plus near-perfect logit correlation.
    agree = np.mean(np.argmax(ours, -1) == np.argmax(hf_logits, -1))
    assert agree >= 0.85, agree
    c = np.corrcoef(ours.reshape(-1), hf_logits.reshape(-1))[0, 1]
    assert c > 0.999, c


def test_logits_match_transformers_kv_unquantized():
    """kv_bits=16 (KV quantization OFF) must match torch TIGHTLY: the only
    remaining error source is the int8 weights both sides share — this
    pins the bf16-KV fallback path and isolates the int8-KV noise the
    main parity test tolerates."""
    cfg = dataclasses.replace(CFG, kv_bits=16)
    params = llama.init_params(cfg, seed=0)
    hf = _hf_model_from_params(params, cfg)
    toks = np.random.default_rng(0).integers(2, cfg.vocab_size, (2, 7))

    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(toks)).logits.numpy()

    cache = llama.init_cache(cfg, 2, 16)
    ours, _ = llama.forward(params, jnp.asarray(toks, jnp.int32), cache, cfg)
    ours = np.asarray(ours, np.float32)

    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))


def test_qwen2_logits_match_transformers():
    """Qwen2 family (QKV bias) parity on identical dequantized weights."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = dataclasses.replace(CFG, qkv_bias=True)
    params = llama.init_params(cfg, seed=3)

    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        use_sliding_window=False,
    )
    model = Qwen2ForCausalLM(hf_cfg)
    model.eval()

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32).T.copy())

    units = cfg.n_heads + 2 * cfg.n_kv_heads
    sd = {
        "model.embed_tokens.weight": torch.from_numpy(
            np.asarray(params.embed, np.float32)),
        "model.norm.weight": torch.from_numpy(
            np.asarray(params.final_norm, np.float32)),
        "lm_head.weight": t(params.lm_head.dequantize()),
    }
    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params.layers)
        wqkv = np.asarray(lp.wqkv.local_view().dequantize())
        bias = np.asarray(lp.qkv_bias, np.float32)
        nq = (wqkv.shape[1] * cfg.n_heads) // units
        nkv = (wqkv.shape[1] * cfg.n_kv_heads) // units
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.q_proj.weight"] = t(wqkv[:, :nq])
        sd[pre + "self_attn.k_proj.weight"] = t(wqkv[:, nq:nq + nkv])
        sd[pre + "self_attn.v_proj.weight"] = t(wqkv[:, nq + nkv:])
        sd[pre + "self_attn.q_proj.bias"] = torch.from_numpy(bias[:nq].copy())
        sd[pre + "self_attn.k_proj.bias"] = torch.from_numpy(
            bias[nq:nq + nkv].copy())
        sd[pre + "self_attn.v_proj.bias"] = torch.from_numpy(
            bias[nq + nkv:].copy())
        sd[pre + "self_attn.o_proj.weight"] = t(
            lp.wo.local_view().dequantize())
        wgu = np.asarray(lp.w_gate_up.local_view().dequantize())
        half = wgu.shape[1] // 2
        sd[pre + "mlp.gate_proj.weight"] = t(wgu[:, :half])
        sd[pre + "mlp.up_proj.weight"] = t(wgu[:, half:])
        sd[pre + "mlp.down_proj.weight"] = t(
            lp.w_down.local_view().dequantize())
        sd[pre + "input_layernorm.weight"] = torch.from_numpy(
            np.asarray(lp.attn_norm, np.float32))
        sd[pre + "post_attention_layernorm.weight"] = torch.from_numpy(
            np.asarray(lp.mlp_norm, np.float32))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected

    toks = np.random.default_rng(3).integers(2, cfg.vocab_size, (1, 6))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()
    cache = llama.init_cache(cfg, 1, 8)
    ours, _ = llama.forward(params, jnp.asarray(toks, jnp.int32), cache, cfg)
    ours = np.asarray(ours, np.float32)
    c = np.corrcoef(ours.reshape(-1), hf_logits.reshape(-1))[0, 1]
    assert c > 0.999, c
    agree = np.mean(np.argmax(ours, -1) == np.argmax(hf_logits, -1))
    assert agree >= 0.8, agree
