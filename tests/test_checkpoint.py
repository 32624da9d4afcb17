"""Checkpoint round-trip + HF conversion tests (CPU)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.checkpoint import (
    convert_hf_llama, load_checkpoint, save_checkpoint,
)
from quant_tpu.models import PRESETS, llama

CFG = PRESETS["test-tiny"]


def test_save_load_roundtrip(tmp_path):
    params = llama.init_params(CFG, seed=0, tp=2)
    manifest = save_checkpoint(tmp_path / "ckpt", params, CFG)
    loaded, cfg2 = load_checkpoint(tmp_path / "ckpt")
    assert cfg2 == CFG
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32)
        )
    # entropy stage must actually shrink the int4 code payloads
    wqkv = manifest["tensors"]["layers.wqkv"]
    assert wqkv["codes"]["size"] < np.prod(wqkv["codes"]["shape"])


def test_loaded_params_forward_identical(tmp_path):
    params = llama.init_params(CFG, seed=1)
    save_checkpoint(tmp_path / "c", params, CFG)
    loaded, cfg = load_checkpoint(tmp_path / "c")
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    ref, _ = llama.forward(params, toks, llama.init_cache(CFG, 1, 8), CFG)
    out, _ = llama.forward(loaded, toks, llama.init_cache(cfg, 1, 8), cfg)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def _write_fake_hf(path, cfg):
    """Synthesize a HF-Llama-layout safetensors dir for the tiny config."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    d, it, v = cfg.dim, cfg.intermediate, cfg.vocab_size
    hd = cfg.head_dim

    def w(o, i):
        return rng.standard_normal((o, i)).astype(np.float32) / np.sqrt(i)

    tensors = {
        "model.embed_tokens.weight": w(v, d),
        "model.norm.weight": np.ones(d, np.float32),
        "lm_head.weight": w(v, d),
    }
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = w(cfg.n_heads * hd, d)
        tensors[p + "self_attn.k_proj.weight"] = w(cfg.n_kv_heads * hd, d)
        tensors[p + "self_attn.v_proj.weight"] = w(cfg.n_kv_heads * hd, d)
        tensors[p + "self_attn.o_proj.weight"] = w(d, cfg.n_heads * hd)
        tensors[p + "mlp.gate_proj.weight"] = w(it, d)
        tensors[p + "mlp.up_proj.weight"] = w(it, d)
        tensors[p + "mlp.down_proj.weight"] = w(d, it)
        tensors[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
    path.mkdir(parents=True)
    save_file(tensors, str(path / "model.safetensors"))
    (path / "config.json").write_text(json.dumps({
        "vocab_size": v, "hidden_size": d, "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "intermediate_size": it, "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.norm_eps, "tie_word_embeddings": False,
    }))
    return tensors


def test_hf_convert_and_generate(tmp_path):
    hf_dir = tmp_path / "hf"
    tensors = _write_fake_hf(hf_dir, CFG)
    cfg = convert_hf_llama(hf_dir, tmp_path / "out", bits=4, group_size=64)
    assert cfg.dim == CFG.dim and cfg.n_layers == CFG.n_layers
    params, cfg2 = load_checkpoint(tmp_path / "out")
    # Dequantized wq must be close to the HF dense weight (int4 error bound:
    # |err| <= scale/2, scale = absmax/7 per group).
    w_hf = tensors["model.layers.0.self_attn.q_proj.weight"].T
    wqkv = jax.tree.map(lambda a: a[0], params.layers.wqkv)  # layer 0
    deq = np.asarray(wqkv.local_view().dequantize())[:, :w_hf.shape[1]]
    assert np.max(np.abs(deq - w_hf)) <= np.max(np.abs(w_hf)) / 7.0
    # And the model must actually run end-to-end.
    from quant_tpu.engine import Engine
    eng = Engine(params, cfg2, max_slots=1, max_seq=16, eos_id=-1)
    out = eng.generate([[1, 2, 3]], max_new_tokens=3)[0]
    assert len(out) == 3


def test_hf_tied_embeddings(tmp_path):
    hf_dir = tmp_path / "hf"
    _write_fake_hf(hf_dir, CFG)
    # Rewrite config with tied embeddings and drop lm_head.
    cfgj = json.loads((hf_dir / "config.json").read_text())
    cfgj["tie_word_embeddings"] = True
    (hf_dir / "config.json").write_text(json.dumps(cfgj))
    cfg = convert_hf_llama(hf_dir, tmp_path / "out2", bits=8, group_size=64)
    params, _ = load_checkpoint(tmp_path / "out2")
    assert params.lm_head.shape == (CFG.dim, CFG.vocab_size)


def test_hf_convert_padded_vocab_e2e(tmp_path):
    """Converter + vocab padding + engine compose at awkward vocab sizes."""
    cfg_big = dataclasses.replace(CFG, vocab_size=4224)
    hf_dir = tmp_path / "hf"
    _write_fake_hf(hf_dir, cfg_big)
    cfg = convert_hf_llama(hf_dir, tmp_path / "out3", bits=4, group_size=64)
    params, cfg2 = load_checkpoint(tmp_path / "out3")
    assert params.lm_head.shape == (cfg_big.dim, 8192)  # padded
    from quant_tpu.engine import Engine
    eng = Engine(params, cfg2, max_slots=1, max_seq=16, eos_id=-1)
    out = eng.generate([[1, 2, 3]], max_new_tokens=3)[0]
    assert len(out) == 3 and all(t < 4224 for t in out)
