"""Multi-LoRA serving (models/lora.py + engine integration).

Numerics pinned against HF PEFT on identical base weights; per-slot
masking, TP-mesh composition and the PEFT-checkpoint loader covered.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.engine import Engine, Request
from quant_tpu.models import PRESETS, llama
from quant_tpu.models.lora import (
    load_hf_adapter,
    lora_delta,
    make_lora_stack,
)

CFG = dataclasses.replace(PRESETS["test-tiny"], bits=8, dtype="float32",
                          group_size=64, kv_bits=16)


def _adapter(cfg, seed, r=4, alpha=8.0, projs=("wq", "wk", "wv", "wo",
                                               "w_gate", "w_up",
                                               "w_down")):
    rng = np.random.default_rng(seed)
    d, hd, it = cfg.dim, cfg.head_dim, cfg.intermediate
    k_in = {"wq": d, "wk": d, "wv": d, "wo": cfg.n_heads * hd,
            "w_gate": d, "w_up": d, "w_down": it}
    n_out = {"wq": cfg.n_heads * hd, "wk": cfg.n_kv_heads * hd,
             "wv": cfg.n_kv_heads * hd, "wo": d, "w_gate": it,
             "w_up": it, "w_down": d}
    ad = {"alpha": alpha}
    for i in range(cfg.n_layers):
        for p in projs:
            ad[f"layers.{i}.{p}.a"] = (rng.standard_normal(
                (k_in[p], r)) * 0.1).astype(np.float32)
            ad[f"layers.{i}.{p}.b"] = (rng.standard_normal(
                (r, n_out[p])) * 0.1).astype(np.float32)
    return ad


def test_lora_delta_masking():
    """Adapter id 0 contributes nothing; other ids select their own
    delta per slot."""
    cfg = CFG
    ads = [_adapter(cfg, 1, r=2), _adapter(cfg, 2, r=3)]
    stack = make_lora_stack(ads, cfg)
    assert stack.n_adapters == 3
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 1, cfg.dim)), jnp.float32)
    ids = jnp.asarray([0, 1, 2], jnp.int32)
    d = lora_delta(x, stack.a_qkv, stack.b_qkv, jnp.int32(0), ids)
    assert np.allclose(np.asarray(d[0]), 0.0)
    d1 = lora_delta(x, stack.a_qkv, stack.b_qkv, jnp.int32(0),
                    jnp.asarray([1, 1, 1], jnp.int32))
    d2 = lora_delta(x, stack.a_qkv, stack.b_qkv, jnp.int32(0),
                    jnp.asarray([2, 2, 2], jnp.int32))
    np.testing.assert_allclose(np.asarray(d[1]), np.asarray(d1[1]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d[2]), np.asarray(d2[2]),
                               rtol=1e-6)
    assert not np.allclose(np.asarray(d[1]), np.asarray(d[2]))


def test_lora_logits_match_peft():
    """Our per-slot LoRA forward must match HF PEFT applied to a Llama
    loaded with OUR dequantized base weights (both sides then share the
    base exactly; the delta math is the difference under test)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("peft")
    from peft import LoraConfig, get_peft_model
    from test_hf_parity import _dense_weights, _hf_state_dict_from_params
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = CFG
    dense = _dense_weights(cfg, seed=71)
    dense["lm_head"] = np.ascontiguousarray(
        (np.random.default_rng(72).standard_normal(
            (cfg.dim, cfg.vocab_size)) * 0.05).astype(np.float32))
    params = llama.quantize_dense_params(dense, cfg)
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.dim,
        intermediate_size=cfg.intermediate,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        num_key_value_heads=cfg.n_kv_heads, rms_norm_eps=cfg.norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    base = LlamaForCausalLM(hf_cfg)
    missing, unexpected = base.load_state_dict(
        _hf_state_dict_from_params(params, cfg), strict=False)
    assert not unexpected, unexpected

    peft_model = get_peft_model(base, LoraConfig(
        r=4, lora_alpha=8, lora_dropout=0.0, bias="none",
        target_modules=["q_proj", "k_proj", "v_proj", "o_proj",
                        "gate_proj", "up_proj", "down_proj"]))
    rng = np.random.default_rng(73)
    ad = {"alpha": 8.0}
    hf2us = {"q_proj": "wq", "k_proj": "wk", "v_proj": "wv",
             "o_proj": "wo", "gate_proj": "w_gate", "up_proj": "w_up",
             "down_proj": "w_down"}
    with torch.no_grad():
        for name, mod in peft_model.named_modules():
            if not hasattr(mod, "lora_A") or "default" not in getattr(
                    mod, "lora_A", {}):
                continue
            a = rng.standard_normal(
                tuple(mod.lora_A["default"].weight.shape)) * 0.2
            b = rng.standard_normal(
                tuple(mod.lora_B["default"].weight.shape)) * 0.2
            mod.lora_A["default"].weight.copy_(
                torch.from_numpy(a.astype(np.float32)))
            mod.lora_B["default"].weight.copy_(
                torch.from_numpy(b.astype(np.float32)))
            proj = hf2us[name.split(".")[-1]]
            li = next(p for p in name.split(".") if p.isdigit())
            # torch stores A [r, K], B [N, r] → ours [K, r], [r, N]
            ad[f"layers.{li}.{proj}.a"] = np.ascontiguousarray(
                a.T.astype(np.float32))
            ad[f"layers.{li}.{proj}.b"] = np.ascontiguousarray(
                b.T.astype(np.float32))
    peft_model.eval()

    toks = np.random.default_rng(74).integers(2, cfg.vocab_size, (2, 7))
    with torch.no_grad():
        hf_logits = peft_model(torch.from_numpy(toks)).logits.numpy()

    stack = make_lora_stack([ad], cfg)
    params_l = dataclasses.replace(params, lora=stack)
    cache = llama.init_cache(cfg, 2, 16)
    ours, _ = llama.forward(params_l, jnp.asarray(toks, jnp.int32),
                            cache, cfg,
                            adapter_ids=jnp.asarray([1, 1], jnp.int32))
    ours = np.asarray(ours, np.float32)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)
    assert np.array_equal(np.argmax(ours, -1), np.argmax(hf_logits, -1))

    # id 0 must equal the base model (peft disabled)
    with torch.no_grad(), peft_model.disable_adapter():
        base_logits = peft_model(torch.from_numpy(toks)).logits.numpy()
    ours0, _ = llama.forward(params_l, jnp.asarray(toks, jnp.int32),
                             llama.init_cache(cfg, 2, 16), cfg,
                             adapter_ids=jnp.asarray([0, 0], jnp.int32))
    np.testing.assert_allclose(np.asarray(ours0), base_logits,
                               rtol=2e-3, atol=2e-3)
    # and save_pretrained → load_hf_adapter round-trips the PEFT format
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        peft_model.save_pretrained(td)
        loaded = load_hf_adapter(td)
        stack2 = make_lora_stack([loaded], cfg)
        ours2, _ = llama.forward(
            dataclasses.replace(params, lora=stack2),
            jnp.asarray(toks, jnp.int32), llama.init_cache(cfg, 2, 16),
            cfg, adapter_ids=jnp.asarray([1, 1], jnp.int32))
        np.testing.assert_allclose(np.asarray(ours2), ours, rtol=1e-5,
                                   atol=1e-5)


def test_engine_multi_lora_co_batching():
    """Base + two adapters co-batched must equal three single-adapter
    engines run separately (greedy)."""
    cfg = CFG
    params = llama.init_params(cfg, seed=75)
    ads = {"a1": _adapter(cfg, 76, r=2), "a2": _adapter(cfg, 77, r=4)}
    rng = np.random.default_rng(78)
    prompts = [list(map(int, rng.integers(3, cfg.vocab_size, 5)))
               for _ in range(3)]

    def solo(lora):
        eng = Engine(params, cfg, max_slots=1, max_seq=32, eos_id=-1,
                     loras=ads)
        return eng.generate([prompts[0 if lora is None else
                                     (1 if lora == "a1" else 2)]],
                            max_new_tokens=5, lora=lora)[0]

    expect = [solo(None), solo("a1"), solo("a2")]
    eng = Engine(params, cfg, max_slots=3, max_seq=32, eos_id=-1,
                 loras=ads)
    reqs = [Request(req_id=0, prompt=prompts[0], max_new_tokens=5),
            Request(req_id=1, prompt=prompts[1], max_new_tokens=5,
                    lora="a1"),
            Request(req_id=2, prompt=prompts[2], max_new_tokens=5,
                    lora="a2")]
    for r in reqs:
        eng.add_request(r)
    while eng.has_work():
        eng.step()
    for r, e in zip(reqs, expect):
        assert r.output == e, (r.req_id, r.output, e)
    # adapters actually change the stream vs base
    base_out = Engine(params, cfg, max_slots=1, max_seq=32,
                      eos_id=-1).generate([prompts[1]], 5)[0]
    assert reqs[1].output != base_out

    with pytest.raises(ValueError, match="unknown lora"):
        eng.add_request(Request(req_id=9, prompt=[1], max_new_tokens=1,
                                lora="nope"))


def test_lora_tp_mesh_matches_single_device():
    """Mixed adapter ids through a (data, model) mesh equal the
    single-device forward (column-split B's, row-split A partials join
    the TP psums)."""
    from quant_tpu.parallel import (
        make_mesh, make_sharded_forward, shard_cache, shard_params,
    )

    cfg = CFG
    ads = [_adapter(cfg, 80, r=2), _adapter(cfg, 81, r=3)]
    toks = np.random.default_rng(82).integers(
        2, cfg.vocab_size, (4, 6)).astype(np.int32)
    ids = jnp.asarray([0, 1, 2, 1], jnp.int32)

    # reference: tp=1 packing of the SAME dense draws + tp=1 stack
    params_ref = dataclasses.replace(
        llama.init_params(cfg, seed=79, tp=1),
        lora=make_lora_stack(ads, cfg, tp=1))
    cache = llama.init_cache(cfg, 4, 16)
    ref, _ = llama.forward(params_ref, jnp.asarray(toks), cache, cfg,
                           adapter_ids=ids)

    params = dataclasses.replace(
        llama.init_params(cfg, seed=79, tp=2),
        lora=make_lora_stack(ads, cfg, tp=2))
    mesh = make_mesh(data=2, model=2)
    p_sh = shard_params(params, mesh)
    c_sh = shard_cache(llama.init_cache(cfg, 4, 16), mesh)
    step = make_sharded_forward(cfg, mesh, p_sh, c_sh)
    out, _ = step(p_sh, jnp.asarray(toks), c_sh, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_lora_rejects_bad_compositions():
    # n-gram speculation COMPOSES with loras (covered in
    # test_lora_with_ngram_speculation; draft-model rejection there
    # too) — only MoE stays rejected at stack build
    moe_cfg = dataclasses.replace(PRESETS["test-tiny-moe"], bits=8,
                                  group_size=64)
    with pytest.raises(ValueError, match="MoE"):
        make_lora_stack([_adapter(CFG, 85)], moe_cfg)


def test_lora_layer_varying_rank():
    """PEFT layers_to_transform-style adapters (some layers untouched,
    ranks varying per layer) must build and apply."""
    cfg = CFG
    ad = {"alpha": 8.0}
    rng = np.random.default_rng(90)
    # only layer 1 adapted, r=4 — layer 0 gets dummy rank-1 zeros
    d = cfg.dim
    ad["layers.1.wq.a"] = rng.standard_normal(
        (d, 4)).astype(np.float32) * 0.2
    ad["layers.1.wq.b"] = rng.standard_normal(
        (4, cfg.n_heads * cfg.head_dim)).astype(np.float32) * 0.2
    stack = make_lora_stack([ad], cfg)
    params = dataclasses.replace(llama.init_params(cfg, seed=91),
                                 lora=stack)
    toks = jnp.asarray([[5, 6, 7]], jnp.int32)
    base, _ = llama.forward(params, toks, llama.init_cache(cfg, 1, 8),
                            cfg, adapter_ids=jnp.asarray([0], jnp.int32))
    with_l, _ = llama.forward(params, toks, llama.init_cache(cfg, 1, 8),
                              cfg,
                              adapter_ids=jnp.asarray([1], jnp.int32))
    assert not np.allclose(np.asarray(base), np.asarray(with_l))


def test_lora_with_ngram_speculation():
    """LoRA composes with n-gram speculative decoding: spec output is
    bit-identical to plain LoRA greedy decode; draft-MODEL proposers
    stay rejected."""
    cfg = CFG
    params = llama.init_params(cfg, seed=95)
    ads = {"a": _adapter(cfg, 96, r=4)}
    rng = np.random.default_rng(97)
    base = list(map(int, rng.integers(3, cfg.vocab_size, 4)))
    prompt = base + base + base  # repetitive → proposer proposes

    plain = Engine(params, cfg, max_slots=2, max_seq=64, eos_id=-1,
                   loras=ads)
    expect = plain.generate([prompt], max_new_tokens=8, lora="a")[0]

    eng = Engine(params, cfg, max_slots=2, max_seq=64, eos_id=-1,
                 loras=ads, spec_gamma=2)
    r = Request(req_id=0, prompt=list(prompt), max_new_tokens=8,
                lora="a")
    eng.add_request(r)
    while eng.has_work():
        eng.step()
    assert r.output == expect, (r.output, expect)
    # the adapter mattered (different from base-model spec decode)
    eng2 = Engine(params, cfg, max_slots=2, max_seq=64, eos_id=-1,
                  spec_gamma=2)
    r2 = Request(req_id=0, prompt=list(prompt), max_new_tokens=8)
    eng2.add_request(r2)
    while eng2.has_work():
        eng2.step()
    assert r2.output != expect

    from quant_tpu.engine.spec import DraftModelProposer

    draft = DraftModelProposer(params, cfg, gamma=2, max_slots=2,
                               max_seq=64)
    with pytest.raises(ValueError, match="draft-MODEL"):
        Engine(params, cfg, max_slots=2, max_seq=64, eos_id=-1,
               loras=ads, spec_gamma=2, spec_proposer=draft)


def test_lora_pp_mesh_matches_single_device():
    """LoRA x PP (VERDICT r3 #9): the adapter stacks' layer dim slices
    over pipe (each stage applies its own layers' deltas); a (pipe,
    model) engine with mixed adapters equals the single-device engine."""
    from quant_tpu.engine import Engine, Request
    from quant_tpu.parallel import make_mesh

    cfg = CFG
    ads = {"a": _adapter(cfg, 90, r=2), "b": _adapter(cfg, 91, r=3)}

    def run(mesh, tp):
        params = llama.init_params(cfg, seed=89, tp=tp)
        eng = Engine(params, cfg, max_slots=2, max_seq=32, eos_id=-1,
                     mesh=mesh, loras=ads)
        reqs = [Request(req_id=0, prompt=[3, 4, 5], max_new_tokens=5,
                        lora="a"),
                Request(req_id=1, prompt=[6, 7], max_new_tokens=5,
                        lora="b")]
        for r in reqs:
            eng.add_request(r)
        while eng.has_work():
            eng.step_block(2)
        return [r.output for r in reqs]

    ref = run(None, 1)
    out = run(make_mesh(pipe=2, model=2), 2)
    assert out == ref, (out, ref)
    # microbatched pipeline too
    params = llama.init_params(cfg, seed=89, tp=2)
    eng = Engine(params, cfg, max_slots=2, max_seq=32, eos_id=-1,
                 mesh=make_mesh(pipe=2, model=2), pp_micro=2, loras=ads)
    reqs = [Request(req_id=0, prompt=[3, 4, 5], max_new_tokens=5,
                    lora="a"),
            Request(req_id=1, prompt=[6, 7], max_new_tokens=5,
                    lora="b")]
    for r in reqs:
        eng.add_request(r)
    while eng.has_work():
        eng.step()
    assert [r.output for r in reqs] == ref


def _mla_adapter(cfg, seed, r=4, alpha=8.0, projs=("wq", "wkv_a", "wo"),
                 extra=()):
    """Adapter dict in the MLA projection vocabulary (models/lora.py r5:
    the fused down-projection's q(-a)/kv_a slots + o_proj)."""
    rng = np.random.default_rng(seed)
    d = cfg.dim
    qw = cfg.q_lora_rank or cfg.n_heads * (cfg.qk_nope_head_dim
                                           + cfg.qk_rope_head_dim)
    k_in = {"wq": d, "wkv_a": d,
            "wo": cfg.n_heads * cfg.v_head_dim}
    n_out = {"wq": qw,
             "wkv_a": cfg.kv_lora_rank + cfg.qk_rope_head_dim,
             "wo": cfg.dim}
    for p, ki, no in extra:
        k_in[p], n_out[p] = ki, no
        projs = tuple(projs) + (p,)
    ad = {"alpha": alpha}
    for i in range(cfg.n_layers):
        for p in projs:
            ad[f"layers.{i}.{p}.a"] = (rng.standard_normal(
                (k_in[p], r)) * 0.1).astype(np.float32)
            ad[f"layers.{i}.{p}.b"] = (rng.standard_normal(
                (r, n_out[p])) * 0.1).astype(np.float32)
    return ad


def test_lora_mla_fused_layout_and_forward():
    """MLA LoRA (r5): the fused b_qkv is block-diagonal in [q | kv_a]
    column order (tp=1), so the delta's column slices equal the
    per-projection (x@A)@B exactly; through a full forward, a zero-B
    adapter is a no-op and a real adapter moves ONLY the slots that
    selected it."""
    cfg = dataclasses.replace(PRESETS["test-tiny-mla"], bits=8,
                              group_size=64, dtype="float32")
    ad = _mla_adapter(cfg, 7)
    stack = make_lora_stack([ad], cfg)
    qw = cfg.n_heads * (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 1, cfg.dim)), jnp.float32)
    dlt = np.asarray(lora_delta(x, stack.a_qkv, stack.b_qkv,
                                jnp.int32(1),
                                jnp.asarray([1, 1], jnp.int32)))
    xf = np.asarray(x)
    sc = 8.0 / 4  # alpha / r folded into B at stack build
    np.testing.assert_allclose(
        dlt[..., :qw],
        (xf @ ad["layers.1.wq.a"]) @ ad["layers.1.wq.b"] * sc,
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        dlt[..., qw:],
        (xf @ ad["layers.1.wkv_a.a"]) @ ad["layers.1.wkv_a.b"] * sc,
        rtol=1e-5, atol=1e-6)

    params = llama.init_params(cfg, seed=3)
    toks = jnp.asarray(np.random.default_rng(4).integers(
        2, cfg.vocab_size, (2, 5)), jnp.int32)
    base, _ = llama.forward(params, toks, llama.init_cache(cfg, 2, 16),
                            cfg)
    # zero-B adapter: exact no-op through the whole forward
    zad = {k: (np.zeros_like(v) if k.endswith(".b") else v)
           for k, v in ad.items() if k != "alpha"}
    zad["alpha"] = 8.0
    pz = dataclasses.replace(params, lora=make_lora_stack([zad], cfg))
    lz, _ = llama.forward(pz, toks, llama.init_cache(cfg, 2, 16), cfg,
                          adapter_ids=jnp.asarray([1, 1], jnp.int32))
    np.testing.assert_array_equal(np.asarray(lz), np.asarray(base))
    # real adapter: slot 0 (base) unchanged, slot 1 moved
    pa = dataclasses.replace(params, lora=stack)
    la, _ = llama.forward(pa, toks, llama.init_cache(cfg, 2, 16), cfg,
                          adapter_ids=jnp.asarray([0, 1], jnp.int32))
    np.testing.assert_array_equal(np.asarray(la[0]),
                                  np.asarray(base[0]))
    assert not np.allclose(np.asarray(la[1]), np.asarray(base[1]))


def test_lora_mla_tp_mesh_matches_single_device():
    """MLA LoRA under TP: b_qkv's block-diagonal columns follow wqkv's
    tp-interleaved [q | kv_a] split and a_o row-slices with wo — the
    (data, model) mesh must equal the single-device forward."""
    from quant_tpu.parallel import (
        make_mesh, make_sharded_forward, shard_cache, shard_params,
    )

    cfg = dataclasses.replace(PRESETS["test-tiny-mla"], bits=8,
                              group_size=64, dtype="float32")
    ads = [_mla_adapter(cfg, 80, r=2), _mla_adapter(cfg, 81, r=3)]
    toks = np.random.default_rng(82).integers(
        2, cfg.vocab_size, (4, 6)).astype(np.int32)
    ids = jnp.asarray([0, 1, 2, 1], jnp.int32)

    params_ref = dataclasses.replace(
        llama.init_params(cfg, seed=79, tp=1),
        lora=make_lora_stack(ads, cfg, tp=1))
    ref, _ = llama.forward(params_ref, jnp.asarray(toks),
                           llama.init_cache(cfg, 4, 16), cfg,
                           adapter_ids=ids)

    params = dataclasses.replace(
        llama.init_params(cfg, seed=79, tp=2),
        lora=make_lora_stack(ads, cfg, tp=2))
    mesh = make_mesh(data=2, model=2)
    p_sh = shard_params(params, mesh)
    c_sh = shard_cache(llama.init_cache(cfg, 4, 16), mesh)
    step = make_sharded_forward(cfg, mesh, p_sh, c_sh)
    out, _ = step(p_sh, jnp.asarray(toks), c_sh, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_lora_mla_dsv3_composition_and_rejections():
    """DeepSeek-V3-flavor MLA (low-rank q, MoE + dense prefix): q_a /
    kv_a / o / dense-prefix-MLP adapters compose through the forward;
    kv_b (absorbed) and MoE-layer MLP targets reject at stack build."""
    cfg = dataclasses.replace(PRESETS["test-tiny-dsv3"], bits=8,
                              group_size=64, dtype="float32")
    di = cfg.dense_intermediate
    ad = _mla_adapter(
        cfg, 11,
        extra=(("w_gate", cfg.dim, di), ("w_up", cfg.dim, di),
               ("w_down", di, cfg.dim)))
    # MLP keys only legal on the dense-prefix layer (layer 0)
    for i in range(cfg.first_k_dense, cfg.n_layers):
        for p in ("w_gate", "w_up", "w_down"):
            del ad[f"layers.{i}.{p}.a"], ad[f"layers.{i}.{p}.b"]
    stack = make_lora_stack([ad], cfg)
    params = llama.init_params(cfg, seed=5)
    toks = jnp.asarray(np.random.default_rng(6).integers(
        2, cfg.vocab_size, (2, 4)), jnp.int32)
    base, _ = llama.forward(params, toks, llama.init_cache(cfg, 2, 16),
                            cfg)
    pa = dataclasses.replace(params, lora=stack)
    la, _ = llama.forward(pa, toks, llama.init_cache(cfg, 2, 16), cfg,
                          adapter_ids=jnp.asarray([0, 1], jnp.int32))
    np.testing.assert_array_equal(np.asarray(la[0]),
                                  np.asarray(base[0]))
    assert not np.allclose(np.asarray(la[1]), np.asarray(base[1]))

    bad = dict(ad)
    bad["layers.0.wkv_b.a"] = np.zeros((4, 1), np.float32)
    bad["layers.0.wkv_b.b"] = np.zeros((1, 4), np.float32)
    with pytest.raises(ValueError, match="absorbed"):
        make_lora_stack([bad], cfg)
    bad2 = dict(ad)
    bad2[f"layers.{cfg.first_k_dense}.w_gate.a"] = np.zeros(
        (cfg.dim, 1), np.float32)
    bad2[f"layers.{cfg.first_k_dense}.w_gate.b"] = np.zeros(
        (1, di), np.float32)
    with pytest.raises(ValueError, match="MoE-layer MLP"):
        make_lora_stack([bad2], cfg)
