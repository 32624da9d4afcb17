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


def _dense_weights(cfg, seed):
    """Random dense weight dict for quantize_dense_params + an HF state
    dict view of the same values."""
    rng = np.random.default_rng(seed)
    d, hd = cfg.dim, cfg.head_dim
    nq, nkv = cfg.n_heads * hd, cfg.n_kv_heads * hd

    def w(k, n):
        return (rng.standard_normal((k, n)) * 0.05).astype(np.float32)

    dense = {
        "embed": (rng.standard_normal((cfg.vocab_size, d)) * 0.05
                  ).astype(np.float32),
        "final_norm": rng.standard_normal(d).astype(np.float32) * 0.1,
    }
    for i in range(cfg.n_layers):
        p = f"layers.{i}."
        dense[p + "wq"] = w(d, nq)
        dense[p + "wk"] = w(d, nkv)
        dense[p + "wv"] = w(d, nkv)
        dense[p + "wo"] = w(nq, d)
        dense[p + "w_gate"] = w(d, cfg.intermediate)
        dense[p + "w_up"] = w(d, cfg.intermediate)
        dense[p + "w_down"] = w(cfg.intermediate, d)
        dense[p + "attn_norm"] = rng.standard_normal(d).astype(
            np.float32) * 0.1
        dense[p + "mlp_norm"] = rng.standard_normal(d).astype(
            np.float32) * 0.1
        if cfg.qk_norm:
            dense[p + "q_norm"] = 1.0 + 0.2 * rng.standard_normal(
                hd).astype(np.float32)
            dense[p + "k_norm"] = 1.0 + 0.2 * rng.standard_normal(
                hd).astype(np.float32)
        if cfg.post_norms:
            dense[p + "post_attn_norm"] = rng.standard_normal(d).astype(
                np.float32) * 0.1
            dense[p + "post_mlp_norm"] = rng.standard_normal(d).astype(
                np.float32) * 0.1
    return dense


def _hf_state_dict_from_params(params, cfg):
    """HF view of OUR params' dequantized weights (both models then run
    identical effective weights — any disagreement is semantics)."""
    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32).T.copy())

    units = cfg.n_heads + 2 * cfg.n_kv_heads
    sd = {
        "model.embed_tokens.weight": torch.from_numpy(
            np.asarray(params.embed, np.float32)),
        "model.norm.weight": torch.from_numpy(
            np.asarray(params.final_norm, np.float32)),
        "lm_head.weight": t(
            params.lm_head.dequantize()[:, :cfg.vocab_size]),
    }
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
        if cfg.post_norms:
            # Gemma-2 four-norm naming: HF's post_attention_layernorm is
            # the POST norm; the pre-MLP norm is pre_feedforward_layernorm
            sd[pre + "pre_feedforward_layernorm.weight"] = torch.from_numpy(
                np.asarray(lp.mlp_norm, np.float32))
            sd[pre + "post_attention_layernorm.weight"] = torch.from_numpy(
                np.asarray(lp.post_attn_norm, np.float32))
            sd[pre + "post_feedforward_layernorm.weight"] = \
                torch.from_numpy(np.asarray(lp.post_mlp_norm, np.float32))
        else:
            sd[pre + "post_attention_layernorm.weight"] = torch.from_numpy(
                np.asarray(lp.mlp_norm, np.float32))
        if cfg.qk_norm:
            sd[pre + "self_attn.q_norm.weight"] = torch.from_numpy(
                np.asarray(lp.q_norm, np.float32))
            sd[pre + "self_attn.k_norm.weight"] = torch.from_numpy(
                np.asarray(lp.k_norm, np.float32))
    return sd


def _run_both(model, params, cfg, toks, max_seq=64):
    model.eval()
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()
    cache = llama.init_cache(cfg, toks.shape[0], max_seq)
    ours, _ = llama.forward(params, jnp.asarray(toks, jnp.int32), cache, cfg)
    return np.asarray(ours, np.float32), hf_logits


def test_mistral_sliding_window_matches_transformers():
    """Mistral family: the sliding-window mask must agree with HF exactly.
    window(8) < prompt(16) so distant keys are actually masked; kv_bits=16
    isolates architecture semantics at tight tolerance."""
    from transformers import MistralConfig, MistralForCausalLM

    cfg = dataclasses.replace(CFG, sliding_window=8, kv_bits=16)
    dense = _dense_weights(cfg, seed=21)
    dense["lm_head"] = np.ascontiguousarray(
        (np.random.default_rng(22).standard_normal(
            (cfg.dim, cfg.vocab_size)) * 0.05).astype(np.float32))
    params = llama.quantize_dense_params(dense, cfg)
    hf_cfg = MistralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, sliding_window=cfg.sliding_window,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    model = MistralForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(
        _hf_state_dict_from_params(params, cfg), strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(23).integers(2, cfg.vocab_size, (2, 16))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # and the mask genuinely matters: full attention must NOT match
    cfg_full = dataclasses.replace(cfg, sliding_window=0)
    ours_full, _ = _run_both(model, params, cfg_full, toks)
    assert not np.allclose(ours_full, hf_logits, rtol=2e-3, atol=2e-3)


def test_qwen3_qk_norm_matches_transformers():
    """Qwen3 family: per-head QK-RMSNorm before RoPE, no qkv bias,
    decoupled head_dim. kv_bits=16 isolates semantics at tight
    tolerance; a run with the norm disabled must NOT match, proving the
    test exercises it."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = dataclasses.replace(CFG, qk_norm=True, head_dim=128,
                              kv_bits=16)
    dense = _dense_weights(cfg, seed=41)
    dense["lm_head"] = np.ascontiguousarray(
        (np.random.default_rng(42).standard_normal(
            (cfg.dim, cfg.vocab_size)) * 0.05).astype(np.float32))
    params = llama.quantize_dense_params(dense, cfg)
    hf_cfg = Qwen3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        tie_word_embeddings=False, attn_implementation="eager",
        use_sliding_window=False,
    )
    model = Qwen3ForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(
        _hf_state_dict_from_params(params, cfg), strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(43).integers(2, cfg.vocab_size, (2, 7))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # the norm genuinely matters: disabling it must break parity
    cfg_off = dataclasses.replace(cfg, qk_norm=False)
    ours_off, _ = _run_both(model, params, cfg_off, toks)
    assert not np.allclose(ours_off, hf_logits, rtol=2e-3, atol=2e-3)


def test_gemma_matches_transformers():
    """Gemma family: (1+w) RMSNorm, tanh-GeLU GLU, sqrt(dim)-scaled
    embeddings, tied lm_head, decoupled head_dim."""
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = dataclasses.replace(
        CFG, head_dim=128, norm_offset=1.0, act_fn="gelu_tanh",
        embed_scale=True, kv_bits=16)
    dense = _dense_weights(cfg, seed=31)
    dense["lm_head"] = np.ascontiguousarray(dense["embed"].T)  # tied
    params = llama.quantize_dense_params(dense, cfg)
    hf_cfg = GemmaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        hidden_activation="gelu_pytorch_tanh", tie_word_embeddings=False,
        attn_implementation="eager",
    )
    # untied HF head loaded with OUR dequantized (tied-then-quantized)
    # lm_head, so both sides run identical effective weights and the
    # comparison stays tight; converter-level tying is covered by
    # test_checkpoint.py
    model = GemmaForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(
        _hf_state_dict_from_params(params, cfg), strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(33).integers(2, cfg.vocab_size, (2, 7))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))


def test_llama3_rope_scaling_matches_transformers():
    """Llama-3.1/3.2 NTK-by-parts rope scaling: our per-band frequency
    scaling must match HF's ROPE_INIT llama3 implementation (and the
    run must actually exercise scaled bands — unscaled must differ)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = dataclasses.replace(
        CFG, kv_bits=16, rope_theta=500000.0, rope_scaling="llama3",
        rope_factor=32.0, rope_low_freq_factor=1.0,
        rope_high_freq_factor=4.0, rope_orig_max_pos=64)
    dense = _dense_weights(cfg, seed=61)
    dense["lm_head"] = np.ascontiguousarray(
        (np.random.default_rng(62).standard_normal(
            (cfg.dim, cfg.vocab_size)) * 0.05).astype(np.float32))
    params = llama.quantize_dense_params(dense, cfg)
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager",
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
    )
    model = LlamaForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(
        _hf_state_dict_from_params(params, cfg), strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(63).integers(2, cfg.vocab_size, (2, 48))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # the scaling genuinely matters: with it off, the error must be
    # orders of magnitude above the scaled-parity error (tiny random
    # weights damp absolute logit shifts, so compare errors directly)
    cfg_off = dataclasses.replace(cfg, rope_scaling="none")
    ours_off, _ = _run_both(model, params, cfg_off, toks)
    err_on = float(np.max(np.abs(ours - hf_logits)))
    err_off = float(np.max(np.abs(ours_off - hf_logits)))
    assert err_off > 50 * max(err_on, 1e-7), (err_on, err_off)


def test_gemma2_matches_transformers():
    """Gemma-2 family: alternating local/global attention (layer 0
    sliding, layer 1 global), attention-score + final-logit tanh
    softcapping, post-block norms, query_pre_attn_scalar. kv_bits=16
    isolates architecture semantics at tight tolerance; ablations prove
    each mechanism is actually exercised."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = dataclasses.replace(
        CFG, head_dim=128, norm_offset=1.0, act_fn="gelu_tanh",
        embed_scale=True, kv_bits=16, sliding_window=8, sliding_pattern=2,
        attn_softcap=20.0, final_softcap=10.0, post_norms=True,
        query_pre_attn_scalar=64.0)
    dense = _dense_weights(cfg, seed=51)
    dense["lm_head"] = np.ascontiguousarray(
        (np.random.default_rng(52).standard_normal(
            (cfg.dim, cfg.vocab_size)) * 0.05).astype(np.float32))
    params = llama.quantize_dense_params(dense, cfg)
    hf_cfg = Gemma2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        hidden_activation="gelu_pytorch_tanh",
        sliding_window=cfg.sliding_window,
        attn_logit_softcapping=cfg.attn_softcap,
        final_logit_softcapping=cfg.final_softcap,
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    assert hf_cfg.layer_types == ["sliding_attention", "full_attention"]
    model = Gemma2ForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(
        _hf_state_dict_from_params(params, cfg), strict=False)
    assert not unexpected, unexpected
    # window(8) < prompt(16): the sliding mask genuinely cuts keys
    toks = np.random.default_rng(53).integers(2, cfg.vocab_size, (2, 16))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # each mechanism matters: disabling it must break parity
    for off in (dict(sliding_window=0, sliding_pattern=0),
                dict(attn_softcap=0.0),
                dict(final_softcap=0.0),
                dict(query_pre_attn_scalar=0.0)):
        ours_off, _ = _run_both(
            model, params, dataclasses.replace(cfg, **off), toks)
        assert not np.allclose(ours_off, hf_logits, rtol=2e-3,
                               atol=2e-3), off
    # ...and the alternation itself: all-layers-sliding must differ
    cfg_all = dataclasses.replace(cfg, sliding_pattern=0)
    ours_all, _ = _run_both(model, params, cfg_all, toks)
    assert not np.allclose(ours_all, hf_logits, rtol=2e-3, atol=2e-3)


def test_gemma2_decode_matches_prefill():
    """Gemma-2 per-layer windows through the DECODE path: token-by-token
    forward must equal the one-shot prefill logits (the window mask is
    position-indexed, not cache-slot-indexed)."""
    cfg = dataclasses.replace(
        CFG, head_dim=64, norm_offset=1.0, act_fn="gelu_tanh",
        embed_scale=True, sliding_window=4, sliding_pattern=2,
        attn_softcap=20.0, final_softcap=10.0, post_norms=True,
        query_pre_attn_scalar=32.0)
    params = llama.init_params(cfg, seed=55)
    toks = np.random.default_rng(55).integers(2, cfg.vocab_size, (1, 10))

    cache = llama.init_cache(cfg, 1, 16)
    full, _ = llama.forward(params, jnp.asarray(toks, jnp.int32), cache,
                            cfg)
    cache = llama.init_cache(cfg, 1, 16)
    steps = []
    for i in range(toks.shape[1]):
        lg, cache = llama.forward(
            params, jnp.asarray(toks[:, i:i + 1], jnp.int32), cache, cfg)
        steps.append(np.asarray(lg[:, 0], np.float32))
    np.testing.assert_allclose(
        np.stack(steps, axis=1), np.asarray(full, np.float32),
        rtol=2e-3, atol=2e-3)


def test_gemma3_matches_transformers():
    """Gemma-3 (text): 5:1 local/global alternation with PER-TYPE rope
    bases (local theta on sliding layers), zero-centered QK-RMSNorm,
    post-norms, query_pre_attn_scalar, no softcaps. 6 layers so the
    global layer (index 5) is exercised; ablations prove the per-layer
    theta and the QK-norm both matter."""
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    cfg = dataclasses.replace(
        CFG, n_layers=6, head_dim=64, norm_offset=1.0,
        act_fn="gelu_tanh", embed_scale=True, kv_bits=16,
        rope_theta=1000000.0, rope_local_theta=10000.0,
        sliding_window=8, sliding_pattern=6, post_norms=True,
        qk_norm=True, query_pre_attn_scalar=32.0, norm_eps=1e-6)
    dense = _dense_weights(cfg, seed=66)
    dense["lm_head"] = np.ascontiguousarray(
        (np.random.default_rng(67).standard_normal(
            (cfg.dim, cfg.vocab_size)) * 0.05).astype(np.float32))
    params = llama.quantize_dense_params(dense, cfg)
    hf_cfg = Gemma3TextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        rope_local_base_freq=cfg.rope_local_theta,
        sliding_window=cfg.sliding_window,
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        hidden_activation="gelu_pytorch_tanh",
        tie_word_embeddings=False, attn_implementation="eager",
    )
    assert hf_cfg.layer_types[5] == "full_attention"
    assert all(t == "sliding_attention"
               for t in hf_cfg.layer_types[:5])
    model = Gemma3ForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(
        _hf_state_dict_from_params(params, cfg), strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(68).integers(2, cfg.vocab_size, (2, 16))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # per-layer rope base and the QK-norm must both matter
    err_on = float(np.max(np.abs(ours - hf_logits)))
    for off in (dict(rope_local_theta=0.0), dict(qk_norm=False),
                dict(sliding_window=0, sliding_pattern=0,
                     rope_local_theta=0.0)):
        ours_off, _ = _run_both(
            model, params, dataclasses.replace(cfg, **off), toks)
        err_off = float(np.max(np.abs(ours_off - hf_logits)))
        assert err_off > 50 * max(err_on, 1e-7), (off, err_on, err_off)


def test_phi3_matches_transformers(tmp_path):
    """Phi-3 family: fused qkv_proj / gate_up_proj in the HF layout —
    parity through the CONVERTER (fused tensors split back to our part
    fusion) at kv_bits=16 tight tolerance."""
    import json as _json

    from safetensors.numpy import save_file
    from transformers import Phi3Config, Phi3ForCausalLM

    from quant_tpu.checkpoint import convert_hf_llama, load_checkpoint

    cfg = dataclasses.replace(CFG, kv_bits=16)
    hf_cfg = Phi3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager", sliding_window=None,
        pad_token_id=0,  # Phi3Config defaults 32000 > tiny test vocab
    )
    model = Phi3ForCausalLM(hf_cfg)
    model.eval()

    # HF-layout safetensors dir straight from the torch model
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()
          if "rotary" not in k}
    save_file(sd, str(hf_dir / "model.safetensors"))
    (hf_dir / "config.json").write_text(_json.dumps({
        "model_type": "phi3", "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.dim, "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "intermediate_size": cfg.intermediate,
        "rope_theta": cfg.rope_theta, "rms_norm_eps": cfg.norm_eps,
        "tie_word_embeddings": False,
    }))
    convert_hf_llama(hf_dir, tmp_path / "out", bits=8, group_size=64)
    params, lcfg = load_checkpoint(tmp_path / "out")
    lcfg = dataclasses.replace(lcfg, kv_bits=16, dtype="float32")

    toks = np.random.default_rng(91).integers(2, cfg.vocab_size, (2, 7))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()
    cache = llama.init_cache(lcfg, 2, 16)
    ours, _ = llama.forward(params, jnp.asarray(toks, jnp.int32), cache,
                            lcfg)
    ours = np.asarray(ours, np.float32)
    # int8 weights on our side only (HF runs fp32) → modest tolerance,
    # near-perfect correlation and overwhelming argmax agreement
    c = np.corrcoef(ours.reshape(-1), hf_logits.reshape(-1))[0, 1]
    assert c > 0.999, c
    agree = np.mean(np.argmax(ours, -1) == np.argmax(hf_logits, -1))
    assert agree >= 0.85, agree


def test_mixtral_logits_match_transformers():
    """Mixtral sparse-MoE parity on identical dequantized weights
    (router semantics, top-k renorm, expert wiring). kv_bits=16 so the
    only error source is shared-weight quantization → tight tolerance."""
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = dataclasses.replace(PRESETS["test-tiny-moe"], bits=8,
                              dtype="float32", group_size=64, kv_bits=16)
    params = llama.init_params(cfg, seed=5)

    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        num_local_experts=cfg.n_experts,
        num_experts_per_tok=cfg.experts_per_token,
        sliding_window=None, attention_bias=False,
        router_jitter_noise=0.0,
    )
    model = MixtralForCausalLM(hf_cfg)
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
    import dataclasses as dc
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        wqkv_qt = dc.replace(params.layers.wqkv,
                             codes=params.layers.wqkv.codes[i],
                             scales=params.layers.wqkv.scales[i])
        wqkv = np.asarray(wqkv_qt.dequantize())
        nq = (wqkv.shape[1] * cfg.n_heads) // units
        nkv = (wqkv.shape[1] * cfg.n_kv_heads) // units
        sd[pre + "self_attn.q_proj.weight"] = t(wqkv[:, :nq])
        sd[pre + "self_attn.k_proj.weight"] = t(wqkv[:, nq:nq + nkv])
        sd[pre + "self_attn.v_proj.weight"] = t(wqkv[:, nq + nkv:])
        sd[pre + "self_attn.o_proj.weight"] = t(dc.replace(
            params.layers.wo, codes=params.layers.wo.codes[i],
            scales=params.layers.wo.scales[i]).dequantize())
        sd[pre + "input_layernorm.weight"] = torch.from_numpy(
            np.asarray(params.layers.attn_norm[i], np.float32))
        sd[pre + "post_attention_layernorm.weight"] = torch.from_numpy(
            np.asarray(params.layers.mlp_norm[i], np.float32))
        # router [D, E] → HF gate.weight [E, D]
        sd[pre + "block_sparse_moe.gate.weight"] = t(
            params.layers.router[i])
        for e in range(cfg.n_experts):
            epre = pre + f"block_sparse_moe.experts.{e}."
            wgu = np.asarray(dc.replace(
                params.layers.we_gate_up,
                codes=params.layers.we_gate_up.codes[e, i],
                scales=params.layers.we_gate_up.scales[e, i]).dequantize())
            half = wgu.shape[1] // 2
            sd[epre + "w1.weight"] = t(wgu[:, :half])   # gate
            sd[epre + "w3.weight"] = t(wgu[:, half:])   # up
            sd[epre + "w2.weight"] = t(dc.replace(
                params.layers.we_down,
                codes=params.layers.we_down.codes[e, i],
                scales=params.layers.we_down.scales[e, i]
            ).dequantize()[:half])  # drop the K-pad zero rows (r5)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("inv_freq" in m for m in missing), missing

    toks = np.random.default_rng(5).integers(2, cfg.vocab_size, (2, 6))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()
    cache = llama.init_cache(cfg, 2, 8)
    ours, _ = llama.forward(params, jnp.asarray(toks, jnp.int32), cache, cfg)
    ours = np.asarray(ours, np.float32)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))


def test_qwen3_moe_logits_match_transformers():
    """Qwen3-MoE parity (per-head QK-RMSNorm + top-k routed MLP with
    norm_topk_prob) on identical dequantized weights, kv_bits=16."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg = dataclasses.replace(
        PRESETS["test-tiny-moe"], bits=8, dtype="float32", group_size=64,
        kv_bits=16, qk_norm=True, norm_topk=True)
    params = llama.init_params(cfg, seed=6)

    hf_cfg = Qwen3MoeConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        moe_intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.norm_eps, rope_theta=cfg.rope_theta,
        tie_word_embeddings=False, attention_bias=False,
        num_experts=cfg.n_experts,
        num_experts_per_tok=cfg.experts_per_token,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
        router_aux_loss_coef=0.0,
    )
    model = Qwen3MoeForCausalLM(hf_cfg)
    model.eval()

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32).T.copy())

    import dataclasses as dc
    units = cfg.n_heads + 2 * cfg.n_kv_heads
    sd = {
        "model.embed_tokens.weight": torch.from_numpy(
            np.asarray(params.embed, np.float32)),
        "model.norm.weight": torch.from_numpy(
            np.asarray(params.final_norm, np.float32)),
        "lm_head.weight": t(params.lm_head.dequantize()),
    }
    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        wqkv = np.asarray(dc.replace(
            params.layers.wqkv, codes=params.layers.wqkv.codes[i],
            scales=params.layers.wqkv.scales[i]).dequantize())
        nq = (wqkv.shape[1] * cfg.n_heads) // units
        nkv = (wqkv.shape[1] * cfg.n_kv_heads) // units
        sd[pre + "self_attn.q_proj.weight"] = t(wqkv[:, :nq])
        sd[pre + "self_attn.k_proj.weight"] = t(wqkv[:, nq:nq + nkv])
        sd[pre + "self_attn.v_proj.weight"] = t(wqkv[:, nq + nkv:])
        sd[pre + "self_attn.o_proj.weight"] = t(dc.replace(
            params.layers.wo, codes=params.layers.wo.codes[i],
            scales=params.layers.wo.scales[i]).dequantize())
        sd[pre + "self_attn.q_norm.weight"] = torch.from_numpy(
            np.asarray(params.layers.q_norm[i], np.float32))
        sd[pre + "self_attn.k_norm.weight"] = torch.from_numpy(
            np.asarray(params.layers.k_norm[i], np.float32))
        sd[pre + "input_layernorm.weight"] = torch.from_numpy(
            np.asarray(params.layers.attn_norm[i], np.float32))
        sd[pre + "post_attention_layernorm.weight"] = torch.from_numpy(
            np.asarray(params.layers.mlp_norm[i], np.float32))
        sd[pre + "mlp.gate.weight"] = t(params.layers.router[i])
        for e in range(cfg.n_experts):
            epre = pre + f"mlp.experts.{e}."
            wgu = np.asarray(dc.replace(
                params.layers.we_gate_up,
                codes=params.layers.we_gate_up.codes[e, i],
                scales=params.layers.we_gate_up.scales[e, i]).dequantize())
            half = wgu.shape[1] // 2
            sd[epre + "gate_proj.weight"] = t(wgu[:, :half])
            sd[epre + "up_proj.weight"] = t(wgu[:, half:])
            sd[epre + "down_proj.weight"] = t(dc.replace(
                params.layers.we_down,
                codes=params.layers.we_down.codes[e, i],
                scales=params.layers.we_down.scales[e, i]
            ).dequantize()[:half])  # drop the K-pad zero rows (r5)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("inv_freq" in m for m in missing), missing

    toks = np.random.default_rng(6).integers(2, cfg.vocab_size, (2, 6))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(toks)).logits.numpy()
    cache = llama.init_cache(cfg, 2, 8)
    ours, _ = llama.forward(params, jnp.asarray(toks, jnp.int32), cache, cfg)
    ours = np.asarray(ours, np.float32)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))


# ── DeepSeek-V2/V3 MLA family ───────────────────────────────────────────


def _deepseek_sd(params, cfg):
    """HF DeepseekV2/V3 state dict from OUR params (dequantized — both
    sides then run identical effective weights). The absorbed w_uk/w_uv
    are re-assembled into HF's per-head kv_b_proj [H*(dn+dv), r]."""
    import dataclasses as dc

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32).T.copy())

    def f(x):
        return torch.from_numpy(np.asarray(x, np.float32).copy())

    r, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
    k0 = cfg.first_k_dense
    sd = {
        "model.embed_tokens.weight": f(params.embed),
        "model.norm.weight": f(params.final_norm),
        "lm_head.weight": t(params.lm_head.dequantize()[:, :cfg.vocab_size]),
    }
    for i in range(cfg.n_layers):
        stack = params.layers0 if i < k0 else params.layers
        j = i if i < k0 else i - k0
        lp = jax.tree.map(lambda a: a[j], stack)
        pre = f"model.layers.{i}."
        wqkv = np.asarray(lp.wqkv.local_view().dequantize())
        qw = wqkv.shape[1] - (r + dr)
        if cfg.q_lora_rank:
            sd[pre + "self_attn.q_a_proj.weight"] = t(wqkv[:, :qw])
            sd[pre + "self_attn.q_a_layernorm.weight"] = f(lp.q_a_norm)
            sd[pre + "self_attn.q_b_proj.weight"] = t(
                lp.w_q_b.local_view().dequantize())
        else:
            sd[pre + "self_attn.q_proj.weight"] = t(wqkv[:, :qw])
        sd[pre + "self_attn.kv_a_proj_with_mqa.weight"] = t(wqkv[:, qw:])
        sd[pre + "self_attn.kv_a_layernorm.weight"] = f(lp.kv_a_norm)
        kvb = np.concatenate(
            [np.concatenate([np.asarray(lp.w_uk, np.float32)[h],
                             np.asarray(lp.w_uv, np.float32)[h].T], axis=0)
             for h in range(cfg.n_heads)], axis=0)   # [H*(dn+dv), r]
        sd[pre + "self_attn.kv_b_proj.weight"] = torch.from_numpy(kvb)
        sd[pre + "self_attn.o_proj.weight"] = t(
            lp.wo.local_view().dequantize())
        sd[pre + "input_layernorm.weight"] = f(lp.attn_norm)
        sd[pre + "post_attention_layernorm.weight"] = f(lp.mlp_norm)
        if i < k0 or not cfg.n_experts:
            wgu = np.asarray(lp.w_gate_up.local_view().dequantize())
            half = wgu.shape[1] // 2
            sd[pre + "mlp.gate_proj.weight"] = t(wgu[:, :half])
            sd[pre + "mlp.up_proj.weight"] = t(wgu[:, half:])
            sd[pre + "mlp.down_proj.weight"] = t(
                lp.w_down.local_view().dequantize())
            continue
        sd[pre + "mlp.gate.weight"] = t(params.layers.router[j])
        if cfg.router_bias:
            sd[pre + "mlp.gate.e_score_correction_bias"] = f(
                params.layers.router_bias[j])
        swgu = np.asarray(lp.ws_gate_up.local_view().dequantize())
        shalf = swgu.shape[1] // 2
        sd[pre + "mlp.shared_experts.gate_proj.weight"] = t(swgu[:, :shalf])
        sd[pre + "mlp.shared_experts.up_proj.weight"] = t(swgu[:, shalf:])
        sd[pre + "mlp.shared_experts.down_proj.weight"] = t(
            lp.ws_down.local_view().dequantize())
        for e in range(cfg.n_experts):
            epre = pre + f"mlp.experts.{e}."
            wgu = np.asarray(dc.replace(
                params.layers.we_gate_up,
                codes=params.layers.we_gate_up.codes[e, j],
                scales=params.layers.we_gate_up.scales[e, j]).dequantize())
            half = wgu.shape[1] // 2
            sd[epre + "gate_proj.weight"] = t(wgu[:, :half])
            sd[epre + "up_proj.weight"] = t(wgu[:, half:])
            sd[epre + "down_proj.weight"] = t(dc.replace(
                params.layers.we_down,
                codes=params.layers.we_down.codes[e, j],
                scales=params.layers.we_down.scales[e, j]
            ).dequantize()[:half])  # drop the K-pad zero rows (r5)
    return sd


def test_deepseek_v2_mla_matches_transformers():
    """DeepSeek MLA attention parity vs HF DeepseekV2 (dense MLP —
    first_k_dense_replace = n_layers keeps every HF layer dense): the
    ABSORBED decode form (q_abs = W_UK^T q_nope, out = W_UV (p @ c))
    must reproduce HF's materialized k/v attention, including the
    interleaved rope and the kv_a/q layernorms. kv_bits=16 → tight."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = dataclasses.replace(PRESETS["test-tiny-mla"], bits=8,
                              dtype="float32", kv_bits=16)
    params = llama.init_params(cfg, seed=71)
    hf_cfg = DeepseekV2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager", q_lora_rank=None,
        kv_lora_rank=cfg.kv_lora_rank,
        qk_nope_head_dim=cfg.qk_nope_head_dim,
        qk_rope_head_dim=cfg.qk_rope_head_dim, v_head_dim=cfg.v_head_dim,
        n_routed_experts=None, first_k_dense_replace=cfg.n_layers,
    )
    model = DeepseekV2ForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(_deepseek_sd(params, cfg),
                                                strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(72).integers(2, cfg.vocab_size, (2, 9))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # the interleaved-pair rope layout genuinely matters: rotate-half on
    # the raw (non-permuted) slices must NOT match
    err_on = float(np.max(np.abs(ours - hf_logits)))
    cfg_off = dataclasses.replace(cfg, rope_interleaved=False)
    ours_off, _ = _run_both(model, params, cfg_off, toks)
    err_off = float(np.max(np.abs(ours_off - hf_logits)))
    assert err_off > 50 * max(err_on, 1e-7), (err_on, err_off)


def test_deepseek_v2_moe_matches_transformers():
    """DeepSeek-V2 MoE parity: softmax scores, group-limited greedy
    routing (group score = MAX), NO top-k renorm (the HF V2 gate ignores
    norm_topk_prob), routed_scaling, 2 shared experts, dense first
    layer."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    # topk_groups=1 so the group limit BITES: with group_score=max and
    # topk_groups >= experts_per_token the top-k experts' groups always
    # rank highest by max, making the limit a no-op for any weights.
    cfg = dataclasses.replace(
        PRESETS["test-tiny-dsv3"], bits=8, dtype="float32", kv_bits=16,
        q_lora_rank=0, score_fn="softmax", router_bias=False,
        group_score="max", norm_topk=False, routed_scaling=1.5,
        topk_groups=1)
    params = llama.init_params(cfg, seed=73)
    hf_cfg = DeepseekV2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.dense_intermediate,
        moe_intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager", q_lora_rank=None,
        kv_lora_rank=cfg.kv_lora_rank,
        qk_nope_head_dim=cfg.qk_nope_head_dim,
        qk_rope_head_dim=cfg.qk_rope_head_dim, v_head_dim=cfg.v_head_dim,
        n_routed_experts=cfg.n_experts,
        num_experts_per_tok=cfg.experts_per_token,
        n_shared_experts=cfg.n_shared_experts,
        first_k_dense_replace=cfg.first_k_dense,
        topk_method="group_limited_greedy",
        n_group=cfg.n_expert_groups, topk_group=cfg.topk_groups,
        routed_scaling_factor=cfg.routed_scaling,
        norm_topk_prob=False, aux_loss_alpha=0.0,
    )
    model = DeepseekV2ForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(_deepseek_sd(params, cfg),
                                                strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(74).integers(2, cfg.vocab_size, (2, 8))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # break-parity ablations: each routing mechanism must matter
    err_on = float(np.max(np.abs(ours - hf_logits)))
    for off in (dict(n_expert_groups=0, topk_groups=0),
                dict(routed_scaling=1.0),
                dict(n_shared_experts=0),
                dict(norm_topk=True)):
        if "n_shared_experts" in off:
            # structurally different params — skip rebuild, covered by V3
            continue
        ours_off, _ = _run_both(
            model, params, dataclasses.replace(cfg, **off), toks)
        err_off = float(np.max(np.abs(ours_off - hf_logits)))
        assert err_off > 50 * max(err_on, 1e-7), (off, err_on, err_off)


def test_deepseek_v3_matches_transformers():
    """DeepSeek-V3 parity: low-rank q (q_a norm + q_b), sigmoid scores
    with e_score_correction_bias for SELECTION only, 4-group top-2
    group-limited routing with top-2-SUM group scores, top-k renorm,
    routed_scaling 2.5, shared expert, dense first layer, interleaved
    rope (rope_interleave=True is the V3 default)."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = dataclasses.replace(PRESETS["test-tiny-dsv3"], bits=8,
                              dtype="float32", kv_bits=16)
    params = llama.init_params(cfg, seed=75)
    hf_cfg = DeepseekV3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.dense_intermediate,
        moe_intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager", q_lora_rank=cfg.q_lora_rank,
        kv_lora_rank=cfg.kv_lora_rank,
        qk_nope_head_dim=cfg.qk_nope_head_dim,
        qk_rope_head_dim=cfg.qk_rope_head_dim, v_head_dim=cfg.v_head_dim,
        n_routed_experts=cfg.n_experts,
        num_experts_per_tok=cfg.experts_per_token,
        n_shared_experts=cfg.n_shared_experts,
        first_k_dense_replace=cfg.first_k_dense,
        n_group=cfg.n_expert_groups, topk_group=cfg.topk_groups,
        routed_scaling_factor=cfg.routed_scaling,
        norm_topk_prob=True, rope_interleave=True,
    )
    model = DeepseekV3ForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(_deepseek_sd(params, cfg),
                                                strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(76).integers(2, cfg.vocab_size, (2, 8))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # selection-bias / group-score / sigmoid semantics each matter
    err_on = float(np.max(np.abs(ours - hf_logits)))
    for off in (dict(router_bias=False),
                dict(group_score="max"),
                dict(score_fn="softmax")):
        ours_off, _ = _run_both(
            model, params, dataclasses.replace(cfg, **off), toks)
        err_off = float(np.max(np.abs(ours_off - hf_logits)))
        assert err_off > 50 * max(err_on, 1e-7), (off, err_on, err_off)


def test_yarn_rope_scaling_matches_transformers():
    """Yarn NTK-by-parts rope (DeepSeek/Qwen long context): per-dim
    interpolation ramp + attention_factor on cos/sin must match HF's
    _compute_yarn_parameters; unscaled must differ by orders."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = dataclasses.replace(
        CFG, kv_bits=16, rope_theta=10000.0, rope_scaling="yarn",
        rope_factor=8.0, rope_orig_max_pos=16,
        rope_beta_fast=32.0, rope_beta_slow=1.0)
    dense = _dense_weights(cfg, seed=81)
    dense["lm_head"] = np.ascontiguousarray(
        (np.random.default_rng(82).standard_normal(
            (cfg.dim, cfg.vocab_size)) * 0.05).astype(np.float32))
    params = llama.quantize_dense_params(dense, cfg)
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager",
        rope_scaling={"rope_type": "yarn", "factor": 8.0,
                      "original_max_position_embeddings": 16,
                      "beta_fast": 32.0, "beta_slow": 1.0},
    )
    model = LlamaForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(
        _hf_state_dict_from_params(params, cfg), strict=False)
    assert not unexpected, unexpected
    # prompt longer than the original context so scaled bands matter
    toks = np.random.default_rng(83).integers(2, cfg.vocab_size, (2, 48))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    err_on = float(np.max(np.abs(ours - hf_logits)))
    cfg_off = dataclasses.replace(cfg, rope_scaling="none")
    ours_off, _ = _run_both(model, params, cfg_off, toks)
    err_off = float(np.max(np.abs(ours_off - hf_logits)))
    assert err_off > 50 * max(err_on, 1e-7), (err_on, err_off)


def test_deepseek_v3_yarn_mscale_matches_transformers():
    """DeepSeek-V3 with the real checkpoints' yarn config (factor 40,
    mscale = mscale_all_dim = 1): attention_factor cancels to 1 but the
    SCORE scale carries yarn_mscale^2 (HF DeepseekV3Attention) — our
    score_mscale knob. Dropping it must break parity."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = dataclasses.replace(
        PRESETS["test-tiny-dsv3"], bits=8, dtype="float32", kv_bits=16,
        rope_scaling="yarn", rope_factor=40.0, rope_orig_max_pos=16,
        rope_mscale=1.0, rope_mscale_all_dim=1.0, score_mscale=True)
    params = llama.init_params(cfg, seed=85)
    hf_cfg = DeepseekV3Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.dense_intermediate,
        moe_intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager", q_lora_rank=cfg.q_lora_rank,
        kv_lora_rank=cfg.kv_lora_rank,
        qk_nope_head_dim=cfg.qk_nope_head_dim,
        qk_rope_head_dim=cfg.qk_rope_head_dim, v_head_dim=cfg.v_head_dim,
        n_routed_experts=cfg.n_experts,
        num_experts_per_tok=cfg.experts_per_token,
        n_shared_experts=cfg.n_shared_experts,
        first_k_dense_replace=cfg.first_k_dense,
        n_group=cfg.n_expert_groups, topk_group=cfg.topk_groups,
        routed_scaling_factor=cfg.routed_scaling,
        norm_topk_prob=True, rope_interleave=True,
        rope_scaling={"rope_type": "yarn", "factor": 40.0,
                      "original_max_position_embeddings": 16,
                      "mscale": 1.0, "mscale_all_dim": 1.0,
                      "beta_fast": 32.0, "beta_slow": 1.0},
    )
    model = DeepseekV3ForCausalLM(hf_cfg)
    missing, unexpected = model.load_state_dict(_deepseek_sd(params, cfg),
                                                strict=False)
    assert not unexpected, unexpected
    toks = np.random.default_rng(86).integers(2, cfg.vocab_size, (2, 24))
    ours, hf_logits = _run_both(model, params, cfg, toks)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    err_on = float(np.max(np.abs(ours - hf_logits)))
    for off in (dict(score_mscale=False),
                dict(rope_scaling="none", score_mscale=False)):
        ours_off, _ = _run_both(
            model, params, dataclasses.replace(cfg, **off), toks)
        err_off = float(np.max(np.abs(ours_off - hf_logits)))
        assert err_off > 50 * max(err_on, 1e-7), (off, err_on, err_off)
