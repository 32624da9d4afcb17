"""Checkpoint round-trip + HF conversion tests (CPU)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    wqkv = manifest["tensors"]["layers.0.wqkv"]
    packed = sum(s["size"] for s in wqkv["codes"]["shards"])
    assert packed < np.prod(wqkv["codes"]["shape"])


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


def test_sharded_save_mesh_load_forward(tmp_path):
    """tp-sharded blobs + load_checkpoint(mesh=...) == single-device
    forward (VERDICT r1 #6: per-host shard loading)."""
    from quant_tpu.parallel import make_mesh, shard_cache
    from quant_tpu.parallel.tp import sharded_forward_fn

    params_ref = llama.init_params(CFG, seed=3, tp=1)
    params = llama.init_params(CFG, seed=3, tp=2)
    save_checkpoint(tmp_path / "s", params, CFG, tp=2)

    mesh = make_mesh(data=2, model=2)
    loaded, cfg = load_checkpoint(tmp_path / "s", mesh=mesh)
    # every TP-shardable leaf must actually be sharded over `model`
    assert "model" in str(loaded.layers.wqkv.codes.sharding.spec)
    assert "model" in str(loaded.layers.w_down.codes.sharding.spec)

    toks = jnp.asarray(
        np.random.default_rng(3).integers(0, CFG.vocab_size, (2, 4)),
        jnp.int32)
    cache = shard_cache(llama.init_cache(cfg, 2, 16), mesh)
    step = jax.jit(sharded_forward_fn(cfg, mesh, loaded, cache))
    out, _ = step(loaded, toks, cache)
    ref, _ = llama.forward(params_ref, toks, llama.init_cache(CFG, 2, 16),
                           CFG)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)


def test_mesh_load_pp(tmp_path):
    """pipe-sharded load: layer stack split over the pipe axis."""
    from quant_tpu.parallel import make_mesh, make_pp_forward, shard_cache_pp

    params_ref = llama.init_params(CFG, seed=4, tp=1)
    save_checkpoint(tmp_path / "p", params_ref, CFG, tp=1)
    mesh = make_mesh(pipe=2, model=1)
    loaded, cfg = load_checkpoint(tmp_path / "p", mesh=mesh)
    assert "pipe" in str(loaded.layers.wqkv.codes.sharding.spec)
    toks = jnp.asarray([[1, 5, 9]], jnp.int32)
    sc = shard_cache_pp(llama.init_cache(cfg, 1, 16), mesh)
    step = make_pp_forward(cfg, mesh, loaded, sc)
    out, _ = step(loaded, toks, sc)
    ref, _ = llama.forward(params_ref, toks, llama.init_cache(CFG, 1, 16),
                           CFG)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-4, atol=2e-4)


def test_convert_qwen3_qk_norm(tmp_path):
    """Fake Qwen3 HF dir (q/k_norm tensors + model_type=qwen3): converter
    must set cfg.qk_norm, carry the norm weights, and the loaded model's
    logits must differ from a qk_norm=False interpretation."""
    from safetensors.numpy import save_file

    from quant_tpu.checkpoint.hf import config_from_hf

    hf = tmp_path / "hf"
    tensors = _write_fake_hf(hf, CFG)
    rng = np.random.default_rng(7)
    extra = {}
    for i in range(CFG.n_layers):
        p = f"model.layers.{i}."
        extra[p + "self_attn.q_norm.weight"] = (
            1 + 0.2 * rng.standard_normal(CFG.head_dim)).astype(np.float32)
        extra[p + "self_attn.k_norm.weight"] = (
            1 + 0.2 * rng.standard_normal(CFG.head_dim)).astype(np.float32)
    save_file({**tensors, **extra}, str(hf / "model.safetensors"))
    hf_cfg = json.loads((hf / "config.json").read_text())
    hf_cfg["model_type"] = "qwen3"
    (hf / "config.json").write_text(json.dumps(hf_cfg))

    assert config_from_hf(hf).qk_norm
    convert_hf_llama(hf, tmp_path / "q3", bits=8, group_size=64)
    params, cfg = load_checkpoint(tmp_path / "q3")
    assert cfg.qk_norm
    np.testing.assert_allclose(
        np.asarray(params.layers.q_norm[0]),
        extra["model.layers.0.self_attn.q_norm.weight"])
    toks = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    out, _ = llama.forward(params, toks, llama.init_cache(cfg, 1, 8), cfg)
    cfg_off = dataclasses.replace(cfg, qk_norm=False)
    out_off, _ = llama.forward(params, toks,
                               llama.init_cache(cfg_off, 1, 8), cfg_off)
    assert not np.allclose(np.asarray(out), np.asarray(out_off), atol=1e-3)


def test_host_load_canonicalizes_tp_packing(tmp_path):
    """Host-loading (no mesh) a tp-packed checkpoint must return params
    in EXACT tp=1 layout: fused columns de-interleaved, split-K int4
    blocks repacked — bit-identical to converting with tp=1 (quantization
    is per (K-group, column), so packing commutes with it)."""
    from tests.test_checkpoint import _write_fake_hf  # self-import ok

    hf = tmp_path / "hf"
    _write_fake_hf(hf, CFG)
    convert_hf_llama(hf, tmp_path / "t1", bits=4, group_size=64, tp=1)
    convert_hf_llama(hf, tmp_path / "t4", bits=4, group_size=64, tp=2)
    p1, _ = load_checkpoint(tmp_path / "t1", device=False)
    p4, _ = load_checkpoint(tmp_path / "t4", device=False)
    for x, y in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # and kshards metadata is canonical
    assert p4.layers.wo.kshards == 1
    assert p4.layers.w_down.kshards == 1


def test_mesh_load_rejects_tp_mismatch(tmp_path):
    from quant_tpu.parallel import make_mesh
    import pytest

    params = llama.init_params(CFG, seed=0, tp=2)
    save_checkpoint(tmp_path / "m", params, CFG, tp=2)
    with pytest.raises(ValueError, match="packed for tp=2"):
        load_checkpoint(tmp_path / "m", mesh=make_mesh(model=1))


def test_streaming_convert_bounded_rss(tmp_path):
    """The converter must stream: RSS growth during convert stays within a
    few tensors, NOT the whole model (70B feasibility, VERDICT r1 #6)."""
    import resource

    cfg = dataclasses.replace(
        CFG, n_layers=8, dim=512, intermediate=1024, vocab_size=2048)
    hf_dir = tmp_path / "hf"
    _write_fake_hf(hf_dir, cfg)
    model_bytes = sum(
        a.nbytes for a in _read_all_safetensors(hf_dir).values())
    largest = max(
        a.nbytes for a in _read_all_safetensors(hf_dir).values())
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    convert_hf_llama(hf_dir, tmp_path / "out", bits=4, group_size=64)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    growth = rss1 - rss0
    # Streaming bound: well under the full model; generous multiple of the
    # largest tensor to absorb allocator slack at this tiny scale.
    assert growth < max(8 * largest, model_bytes // 2), (
        growth, largest, model_bytes)


def _read_all_safetensors(path):
    from safetensors import safe_open

    out = {}
    for f in sorted(path.glob("*.safetensors")):
        with safe_open(str(f), framework="np") as sf:
            for k in sf.keys():
                out[k] = sf.get_tensor(k)
    return out


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


def test_load_pre_qknorm_checkpoint(tmp_path):
    """Checkpoints written before q_norm/k_norm existed must still load
    (host AND mesh paths default the missing tensors to ones)."""
    from quant_tpu.parallel import make_mesh

    params = llama.init_params(CFG, seed=9)
    params_tp = llama.init_params(CFG, seed=9, tp=2)
    save_checkpoint(tmp_path / "old", params, CFG)
    save_checkpoint(tmp_path / "old2", params_tp, CFG, tp=2)
    for man_path in (tmp_path / "old" / "manifest.json",
                     tmp_path / "old2" / "manifest.json"):
        man = json.loads(man_path.read_text())
        for k in [k for k in man["tensors"]
                  if k.endswith(".q_norm") or k.endswith(".k_norm")]:
            del man["tensors"][k]
        man_path.write_text(json.dumps(man))
    loaded, cfg = load_checkpoint(tmp_path / "old", device=False)
    np.testing.assert_array_equal(
        np.asarray(loaded.layers.q_norm),
        np.ones((CFG.n_layers, CFG.head_dim), np.float32))
    toks = jnp.asarray([[1, 5, 9]], jnp.int32)
    out, _ = llama.forward(jax.tree.map(jnp.asarray, loaded), toks,
                           llama.init_cache(cfg, 1, 8), cfg)
    ref, _ = llama.forward(params, toks, llama.init_cache(CFG, 1, 8), CFG)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-5)

    # mesh path: the checkpoint's packing tp must MATCH the mesh
    # (a tp=1 blob column-split over model>1 hands shard 0 all-q
    # columns — silent corruption, now refused)
    mesh = make_mesh(model=2)
    with pytest.raises(ValueError, match="repack"):
        load_checkpoint(tmp_path / "old", mesh=mesh)
    loaded_m, _ = load_checkpoint(tmp_path / "old2", mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(loaded_m.layers.k_norm),
        np.ones((CFG.n_layers, CFG.head_dim), np.float32))


def test_config_from_hf_gemma3_text(tmp_path):
    """gemma3_text field mapping (pattern 6, local rope base incl. the
    HF default, qk/post norms) and the multimodal/deviant rejections."""
    import json as _json

    import pytest as _pytest

    from quant_tpu.checkpoint.hf import config_from_hf

    base = {
        "model_type": "gemma3_text", "vocab_size": 512,
        "hidden_size": 256, "num_hidden_layers": 6,
        "num_attention_heads": 4, "num_key_value_heads": 1,
        "intermediate_size": 512, "head_dim": 64,
        "rope_theta": 1000000.0, "rope_local_base_freq": 10000.0,
        "rms_norm_eps": 1e-6, "sliding_window": 512,
        "query_pre_attn_scalar": 256,
        "hidden_activation": "gelu_pytorch_tanh",
    }
    (tmp_path / "config.json").write_text(_json.dumps(base))
    cfg = config_from_hf(tmp_path)
    assert cfg.sliding_pattern == 6 and cfg.sliding_window == 512
    assert cfg.rope_local_theta == 10000.0 and cfg.rope_theta == 1e6
    assert cfg.qk_norm and cfg.post_norms and cfg.embed_scale
    assert cfg.norm_offset == 1.0 and cfg.act_fn == "gelu_tanh"
    assert cfg.query_pre_attn_scalar == 256

    # absent rope_local_base_freq → the HF DEFAULT (10000), never 0
    b2 = dict(base)
    del b2["rope_local_base_freq"]
    (tmp_path / "config.json").write_text(_json.dumps(b2))
    assert config_from_hf(tmp_path).rope_local_theta == 10000.0

    # deviant layer pattern and multimodal wrapper are rejected
    b3 = dict(base, sliding_window_pattern=4)
    (tmp_path / "config.json").write_text(_json.dumps(b3))
    with _pytest.raises(ValueError, match="pattern"):
        config_from_hf(tmp_path)
    (tmp_path / "config.json").write_text(
        _json.dumps({"model_type": "gemma3"}))
    with _pytest.raises(ValueError, match="multimodal"):
        config_from_hf(tmp_path)


def test_codebook_checkpoint_roundtrip_and_mesh_load(tmp_path):
    """Codebook (lut) QTensors survive save→load bit-exactly, host and
    mesh-native (the tables live inline in the manifest)."""
    cfg = dataclasses.replace(CFG, codebook="lloyd")
    params = llama.init_params(cfg, seed=3)
    save_checkpoint(tmp_path / "cb", params, cfg)
    # lut_runtime="word4" keeps the stored codebook form (the default
    # "int8" transcodes at load — covered by test_lut_transcode_at_load)
    loaded, cfg2 = load_checkpoint(tmp_path / "cb", lut_runtime="word4")
    assert cfg2.codebook == "lloyd"
    assert loaded.layers.wqkv.lut is not None
    np.testing.assert_array_equal(
        np.asarray(params.layers.wqkv.lut),
        np.asarray(loaded.layers.wqkv.lut))
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    ref, _ = llama.forward(params, toks, llama.init_cache(cfg, 1, 8), cfg)
    out, _ = llama.forward(loaded, toks, llama.init_cache(cfg2, 1, 8),
                           cfg2)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    # mesh-native load + sharded forward equality (tp-packed save)
    from quant_tpu.parallel import make_mesh, shard_cache
    from quant_tpu.parallel.tp import sharded_forward_fn

    params2 = llama.init_params(cfg, seed=3, tp=2)
    np.testing.assert_array_equal(
        np.asarray(params.layers.wqkv.lut),
        np.asarray(params2.layers.wqkv.lut))  # fit is column-order-free
    save_checkpoint(tmp_path / "cb2", params2, cfg, tp=2)
    mesh = make_mesh(data=1, model=2)
    mp, mcfg = load_checkpoint(tmp_path / "cb2", mesh=mesh,
                               lut_runtime="word4")
    assert mp.layers.wqkv.lut is not None
    cache = shard_cache(llama.init_cache(mcfg, 1, 8), mesh)
    fwd = jax.jit(sharded_forward_fn(mcfg, mesh, mp, cache))
    out2, _ = fwd(mp, toks, cache)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_lut_transcode_at_load(tmp_path):
    """r5 codebook fast path (VERDICT r4 weak #3): the default
    lut_runtime="int8" transcodes codebook QTensors at load into plain
    linear int8 whose dequant is EXACTLY the word4 kernel's math
    (round(lut*127)[idx] * scale/127) — so codebook checkpoints stream
    at linear-kernel speed with no in-kernel table gather."""
    from quant_tpu.core.qtensor import transcode_lut_int8

    cfg = dataclasses.replace(CFG, codebook="nf4")
    params = llama.init_params(cfg, seed=5)
    save_checkpoint(tmp_path / "cb", params, cfg)

    loaded, cfg2 = load_checkpoint(tmp_path / "cb")   # default: int8
    qt = loaded.layers.wqkv
    assert qt.lut is None and qt.bits == 8
    # dequant == the word4 kernel's effective weights, bit-for-bit
    orig = params.layers.wqkv
    lut = np.asarray(orig.lut, np.float32)       # [L, 16] stacked tables
    lq = np.round(lut * 127.0)
    pk = np.asarray(orig.codes)
    li = np.concatenate([(pk & 0xF).astype(np.int32),
                         (pk >> 4).astype(np.int32)], axis=-2)
    want = np.stack([
        lq[i][li[i]] * (np.asarray(orig.scales[i], np.float32)
                        * np.float32(1 / 127.0)
                        ).repeat(orig.group_size, axis=-2)
        for i in range(cfg.n_layers)])
    got = np.stack([np.asarray(
        dataclasses.replace(
            qt, codes=qt.codes[i], scales=qt.scales[i]
        ).local_view().dequantize()) for i in range(cfg.n_layers)])
    np.testing.assert_array_equal(got, want.astype(np.float32))

    # forward through the linear kernel == the word4 KERNEL's forward
    # (the transcode bakes word4's int8-requant table in; the XLA
    # reference path instead consumes the exact f32 table and sits a
    # requant-error away — so hold the kernel backend constant)
    w4, cfg_w4 = load_checkpoint(tmp_path / "cb", lut_runtime="word4")
    assert w4.layers.wqkv.lut is not None
    toks = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cfg2i = dataclasses.replace(cfg2, kernel_mode="pallas_interpret")
    cfg_w4i = dataclasses.replace(cfg_w4, kernel_mode="pallas_interpret")
    lg8, _ = llama.forward(loaded, toks, llama.init_cache(cfg2i, 1, 8),
                           cfg2i)
    lgw, _ = llama.forward(w4, toks, llama.init_cache(cfg_w4i, 1, 8),
                           cfg_w4i)
    np.testing.assert_allclose(np.asarray(lg8), np.asarray(lgw),
                               rtol=1e-3, atol=1e-3)

    lg8x, _ = llama.forward(loaded, toks, llama.init_cache(cfg2, 1, 8),
                            cfg2)  # XLA-path baseline for the legs below

    # kshards (tp-packed) transcode: unpacked rows land in natural K
    # order — host canonicalized load must agree with the tp=1 one
    params2 = llama.init_params(cfg, seed=5, tp=2)
    save_checkpoint(tmp_path / "cb2", params2, cfg, tp=2)
    l2, c2 = load_checkpoint(tmp_path / "cb2")
    assert l2.layers.wqkv.lut is None and l2.layers.wqkv.bits == 8
    lg2, _ = llama.forward(l2, toks, llama.init_cache(c2, 1, 8), c2)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg8x),
                               rtol=1e-4, atol=1e-4)

    # mesh-native load transcodes too, preserving shardings
    from quant_tpu.parallel import make_mesh, shard_cache
    from quant_tpu.parallel.tp import sharded_forward_fn

    mesh = make_mesh(data=1, model=2)
    mp, mcfg = load_checkpoint(tmp_path / "cb2", mesh=mesh)
    assert mp.layers.wqkv.lut is None and mp.layers.wqkv.bits == 8
    cache = shard_cache(llama.init_cache(mcfg, 1, 8), mesh)
    fwd = jax.jit(sharded_forward_fn(mcfg, mesh, mp, cache))
    out2, _ = fwd(mp, toks, cache)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(lg8x),
                               rtol=2e-4, atol=2e-4)

    # direct unit: interpret-mode word4 kernel == linear kernel on the
    # transcoded QTensor (the whole point: same numbers, faster stream)
    from quant_tpu.kernels.dequant_matmul import dequant_matmul

    qt1 = params.layers.wqkv
    qt1 = dataclasses.replace(qt1, codes=qt1.codes[0],
                              scales=qt1.scales[0],
                              lut=qt1.lut[0]).local_view()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, qt1.shape[0])), jnp.float32)
    y_w4 = dequant_matmul(x, qt1, interpret=True)
    y_i8 = dequant_matmul(x, transcode_lut_int8(qt1), interpret=True)
    np.testing.assert_allclose(np.asarray(y_w4), np.asarray(y_i8),
                               rtol=2e-5, atol=2e-5)
