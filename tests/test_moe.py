"""Sparse-MoE (Mixtral family) tests — SURVEY.md §2.2 #14 (EP).

The inference MoE computes every expert densely and combines with the
top-k routing weights (static shapes, no token dropping — see
llama.mlp_block). Covered here: routing semantics, equality vs a
per-token routed reference, cache/decode consistency, EP/TP/DP sharding
equality on the CPU mesh, checkpoint round-trips (host + mesh loads),
and the HF Mixtral converter.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.checkpoint import load_checkpoint, save_checkpoint
from quant_tpu.models import PRESETS, llama
from quant_tpu.parallel import make_mesh
from quant_tpu.parallel.tp import (
    make_sharded_forward, shard_cache, shard_params,
)

CFG = PRESETS["test-tiny-moe"]


def test_moe_route_semantics():
    """softmax over ALL experts → top-k → renormalize (Mixtral order)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, CFG.dim)), jnp.float32)
    router = jnp.asarray(
        rng.standard_normal((CFG.dim, CFG.n_experts)), jnp.float32)
    w = np.asarray(llama.moe_route(x, router, CFG))
    assert w.shape == (2, 3, CFG.n_experts)
    probs = np.asarray(jax.nn.softmax(
        jnp.asarray(np.asarray(x) @ np.asarray(router)), -1))
    for b in range(2):
        for t in range(3):
            top = np.argsort(-probs[b, t])[:CFG.experts_per_token]
            ref = np.zeros(CFG.n_experts, np.float32)
            ref[top] = probs[b, t, top]
            ref /= ref.sum()
            np.testing.assert_allclose(w[b, t], ref, atol=1e-6)
    # exactly k nonzero weights per token, summing to 1
    nz = (w > 0).sum(-1)
    assert (nz == CFG.experts_per_token).all()
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)


def test_mlp_block_matches_routed_reference():
    """Dense-all-experts combine == per-token top-k expert loop."""
    params = llama.init_params(CFG, seed=0)
    mm = llama._mm(CFG)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, CFG.dim)), jnp.bfloat16)
    for layer in range(CFG.n_layers):
        out = np.asarray(llama.mlp_block(
            x, params.layers, layer, CFG, mm, jnp.bfloat16,
            router=params.layers.router[layer]), np.float32)
        w = np.asarray(llama.moe_route(x, params.layers.router[layer], CFG))
        xf = np.asarray(x, np.float32)
        ref = np.zeros_like(out)
        for e in range(CFG.n_experts):
            gu_e = dataclasses.replace(
                params.layers.we_gate_up,
                codes=params.layers.we_gate_up.codes[e, layer],
                scales=params.layers.we_gate_up.scales[e, layer],
            ).dequantize()
            dn_e = dataclasses.replace(
                params.layers.we_down,
                codes=params.layers.we_down.codes[e, layer],
                scales=params.layers.we_down.scales[e, layer],
            ).dequantize()
            gu = (xf @ np.asarray(gu_e, np.float32)).astype(np.float32)
            g, u = np.split(gu, 2, axis=-1)
            # we_down's K dim is zero-padded to a 1024 multiple (r5)
            y = (np.asarray(jax.nn.silu(jnp.asarray(g))) * u) @ np.asarray(
                dn_e, np.float32)[:g.shape[-1]]
            ref += w[..., e:e + 1] * y
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(out - ref).max() / scale < 0.05  # bf16 activations


def test_moe_prefill_decode_matches_full_forward():
    """Chunked prefill + token-by-token decode == one full forward."""
    params = llama.init_params(CFG, seed=1)
    toks = jnp.asarray([[1, 7, 42, 5, 9, 3]], jnp.int32)
    full, _ = llama.forward(params, toks, llama.init_cache(CFG, 1, 16), CFG)

    cache = llama.init_cache(CFG, 1, 16)
    lg, cache = llama.forward(params, toks[:, :3], cache, CFG)
    steps = [lg[:, -1]]
    for t in range(3, 6):
        lg, cache = llama.forward(params, toks[:, t:t + 1], cache, CFG)
        steps.append(lg[:, -1])
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full[:, 2:]),
                               rtol=2e-2, atol=2e-2)
    assert np.array_equal(np.argmax(np.asarray(inc), -1),
                          np.argmax(np.asarray(full[:, 2:]), -1))


@pytest.mark.parametrize("mesh_kw", [
    {"expert": 4},
    {"expert": 2, "model": 2},
    {"expert": 4, "model": 2},
    {"expert": 2, "data": 2, "model": 2},
])
def test_moe_sharded_matches_single_device(mesh_kw):
    """EP (expert axis) ± TP ± DP == single-device logits."""
    tp = mesh_kw.get("model", 1)
    params_ref = llama.init_params(CFG, seed=0, tp=1)
    toks = jnp.asarray([[1, 7, 42, 5], [3, 9, 11, 2]], jnp.int32)
    ref, _ = llama.forward(params_ref, toks,
                           llama.init_cache(CFG, 2, 16), CFG)

    params = llama.init_params(CFG, seed=0, tp=tp)
    mesh = make_mesh(**mesh_kw)
    ps = shard_params(params, mesh)
    cs = shard_cache(llama.init_cache(CFG, 2, 16), mesh)
    fwd = make_sharded_forward(CFG, mesh, ps, cs)
    lg, _ = fwd(ps, toks, cs)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert np.array_equal(np.argmax(np.asarray(lg), -1),
                          np.argmax(np.asarray(ref), -1))


def test_moe_expert_axis_rejects_indivisible():
    params = llama.init_params(CFG, seed=0)
    mesh = make_mesh(expert=8)  # 8 does not divide n_experts=4
    cs = llama.init_cache(CFG, 2, 16)
    with pytest.raises(ValueError, match="expert axis"):
        make_sharded_forward(CFG, mesh, params, cs)


def test_moe_checkpoint_roundtrip(tmp_path):
    params = llama.init_params(CFG, seed=2)
    save_checkpoint(tmp_path / "ck", params, CFG)
    loaded, cfg2 = load_checkpoint(tmp_path / "ck", device=False)
    assert cfg2.n_experts == CFG.n_experts
    np.testing.assert_array_equal(
        np.asarray(params.layers.we_gate_up.codes),
        np.asarray(loaded.layers.we_gate_up.codes))
    np.testing.assert_array_equal(
        np.asarray(params.layers.router, np.float32),
        np.asarray(loaded.layers.router))
    assert loaded.layers.w_gate_up is None
    toks = jnp.asarray([[1, 7, 42]], jnp.int32)
    ref, _ = llama.forward(params, toks, llama.init_cache(CFG, 1, 8), CFG)
    out, _ = llama.forward(
        jax.tree.map(jnp.asarray, loaded), toks,
        llama.init_cache(cfg2, 1, 8), cfg2)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_moe_checkpoint_mesh_load(tmp_path):
    """load_checkpoint(mesh=...) with an expert axis reads per-expert
    blobs into the [E, L, ...] stacks and matches the host load."""
    params = llama.init_params(CFG, seed=3, tp=2)
    save_checkpoint(tmp_path / "ck", params, CFG, tp=2)
    mesh = make_mesh(expert=2, model=2)
    loaded, cfg2 = load_checkpoint(tmp_path / "ck", mesh=mesh)
    toks = jnp.asarray([[1, 7, 42, 5]], jnp.int32)
    ref, _ = llama.forward(llama.init_params(CFG, seed=3, tp=1), toks,
                           llama.init_cache(CFG, 1, 8), CFG)
    cs = shard_cache(llama.init_cache(cfg2, 1, 8), mesh)
    fwd = make_sharded_forward(cfg2, mesh, loaded, cs)
    lg, _ = fwd(loaded, toks, cs)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def _write_fake_hf_mixtral(path, cfg):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    d, it, v, hd = cfg.dim, cfg.intermediate, cfg.vocab_size, cfg.head_dim

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
        tensors[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            d, np.float32)
        tensors[p + "block_sparse_moe.gate.weight"] = w(cfg.n_experts, d)
        for e in range(cfg.n_experts):
            ep = p + f"block_sparse_moe.experts.{e}."
            tensors[ep + "w1.weight"] = w(it, d)
            tensors[ep + "w3.weight"] = w(it, d)
            tensors[ep + "w2.weight"] = w(d, it)
    path.mkdir(parents=True)
    save_file(tensors, str(path / "model.safetensors"))
    (path / "config.json").write_text(json.dumps({
        "model_type": "mixtral", "vocab_size": v, "hidden_size": d,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "intermediate_size": it, "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.norm_eps, "tie_word_embeddings": False,
        "num_local_experts": cfg.n_experts,
        "num_experts_per_tok": cfg.experts_per_token,
        "sliding_window": None,
    }))
    return tensors


def test_hf_mixtral_convert_and_forward(tmp_path):
    """HF Mixtral dir → packed checkpoint → forward matches the same
    dense weights quantized directly."""
    from quant_tpu.checkpoint.hf import convert_hf_llama

    hf_dir = tmp_path / "hf"
    tensors = _write_fake_hf_mixtral(hf_dir, CFG)
    cfg = convert_hf_llama(hf_dir, tmp_path / "ck", bits=CFG.bits,
                           group_size=CFG.group_size)
    assert cfg.n_experts == CFG.n_experts
    assert cfg.experts_per_token == CFG.experts_per_token
    params, cfg = load_checkpoint(tmp_path / "ck", device=False)
    params = jax.tree.map(jnp.asarray, params)
    assert params.layers.we_gate_up.codes.shape[:2] == (
        cfg.n_experts, cfg.n_layers)
    # router values survive the round trip exactly (raw blobs)
    np.testing.assert_allclose(
        np.asarray(params.layers.router[0]),
        tensors["model.layers.0.block_sparse_moe.gate.weight"].T,
        atol=1e-6)
    toks = jnp.asarray([[1, 7, 42, 5]], jnp.int32)
    lg, _ = llama.forward(params, toks, llama.init_cache(cfg, 1, 8), cfg)
    assert lg.shape == (1, 4, cfg.vocab_size)
    assert np.isfinite(np.asarray(lg)).all()


def test_moe_route_no_renorm():
    """norm_topk=False keeps the raw softmax mass of the kept experts
    (Qwen3-MoE configs with norm_topk_prob=false)."""
    cfg = dataclasses.replace(CFG, norm_topk=False)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 2, cfg.dim)), jnp.float32)
    router = jnp.asarray(
        rng.standard_normal((cfg.dim, cfg.n_experts)), jnp.float32)
    w = np.asarray(llama.moe_route(x, router, cfg))
    assert ((w > 0).sum(-1) == cfg.experts_per_token).all()
    probs = np.asarray(jax.nn.softmax(
        jnp.asarray(np.asarray(x) @ np.asarray(router)), -1))
    for b in range(1):
        for t in range(2):
            top = np.argsort(-probs[b, t])[:cfg.experts_per_token]
            ref = np.zeros(cfg.n_experts, np.float32)
            ref[top] = probs[b, t, top]  # kept mass, NOT renormalized
            np.testing.assert_allclose(w[b, t], ref, atol=1e-6)


def _write_fake_hf_qwen3_moe(path, cfg):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(1)
    d, it, v, hd = cfg.dim, cfg.intermediate, cfg.vocab_size, cfg.head_dim

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
        tensors[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        tensors[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        tensors[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            d, np.float32)
        tensors[p + "mlp.gate.weight"] = w(cfg.n_experts, d)
        for e in range(cfg.n_experts):
            ep = p + f"mlp.experts.{e}."
            tensors[ep + "gate_proj.weight"] = w(it, d)
            tensors[ep + "up_proj.weight"] = w(it, d)
            tensors[ep + "down_proj.weight"] = w(d, it)
    path.mkdir(parents=True)
    save_file(tensors, str(path / "model.safetensors"))
    (path / "config.json").write_text(json.dumps({
        "model_type": "qwen3_moe", "vocab_size": v, "hidden_size": d,
        "num_hidden_layers": cfg.n_layers,
        "num_attention_heads": cfg.n_heads,
        "num_key_value_heads": cfg.n_kv_heads,
        "head_dim": hd,
        "intermediate_size": 4 * it, "moe_intermediate_size": it,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.norm_eps, "tie_word_embeddings": False,
        "num_experts": cfg.n_experts,
        "num_experts_per_tok": cfg.experts_per_token,
        "norm_topk_prob": True, "decoder_sparse_step": 1,
        "mlp_only_layers": [],
    }))


def test_hf_qwen3_moe_convert_and_forward(tmp_path):
    """qwen3_moe HF naming (mlp.gate / experts.N.{gate,up,down}_proj)
    converts; config picks up qk_norm, num_experts, norm_topk_prob and
    moe_intermediate_size."""
    from quant_tpu.checkpoint.hf import convert_hf_llama

    base = dataclasses.replace(CFG, qk_norm=True)
    hf_dir = tmp_path / "hf"
    _write_fake_hf_qwen3_moe(hf_dir, base)
    cfg = convert_hf_llama(hf_dir, tmp_path / "ck", bits=base.bits,
                           group_size=base.group_size)
    assert cfg.n_experts == base.n_experts
    assert cfg.qk_norm and cfg.norm_topk
    assert cfg.intermediate == base.intermediate  # moe_intermediate_size
    params, cfg = load_checkpoint(tmp_path / "ck", device=False)
    params = jax.tree.map(jnp.asarray, params)
    toks = jnp.asarray([[1, 7, 42, 5]], jnp.int32)
    lg, _ = llama.forward(params, toks, llama.init_cache(cfg, 1, 8), cfg)
    assert lg.shape == (1, 4, cfg.vocab_size)
    assert np.isfinite(np.asarray(lg)).all()


def test_moe_engine_paged_spec():
    """MoE composes with the paged KV pool and n-gram speculation
    through the engine (single device; greedy == plain reference)."""
    from quant_tpu.engine import Engine

    params = llama.init_params(CFG, seed=7)
    rng = np.random.default_rng(7)
    prompts = [list(map(int, rng.integers(3, CFG.vocab_size, n)))
               for n in (5, 9)]

    def ref(prompt, max_new):
        cache = llama.init_cache(CFG, 1, 64)
        lg, cache = llama.forward(
            params, jnp.asarray([prompt], jnp.int32), cache, CFG)
        out = [int(jnp.argmax(lg[0, -1]))]
        for _ in range(max_new - 1):
            lg, cache = llama.forward(
                params, jnp.asarray([[out[-1]]], jnp.int32), cache, CFG)
            out.append(int(jnp.argmax(lg[0, -1])))
        return out

    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                 paged=True, page_size=16, spec_gamma=2)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == ref(p, 6), (p, o)


def test_moe_capacity_prefill_matches_dense_when_undropped():
    """moe_prefill="capacity" with ample capacity == the exact dense-all
    path (same per-token math, same combine order); with starved
    capacity it stays finite and differs (documented drop semantics)."""
    cfg_cap = dataclasses.replace(CFG, moe_prefill="capacity",
                                  moe_capacity_factor=4.0)
    params = llama.init_params(CFG, seed=11)
    toks = jnp.asarray(
        np.random.default_rng(11).integers(3, CFG.vocab_size, (2, 16)),
        jnp.int32)
    ref, ref_cache = llama.forward(params, toks,
                                   llama.init_cache(CFG, 2, 32), CFG)
    out, out_cache = llama.forward(params, toks,
                                   llama.init_cache(cfg_cap, 2, 32),
                                   cfg_cap)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_cache.k_codes),
                                  np.asarray(ref_cache.k_codes))
    # decode steps (T=1) always use the exact dense path
    nxt = jnp.argmax(ref[:, -1:], -1).astype(jnp.int32)
    d_ref, _ = llama.forward(params, nxt, ref_cache, CFG)
    d_out, _ = llama.forward(params, nxt, out_cache, cfg_cap)
    np.testing.assert_allclose(np.asarray(d_out), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)

    starved = dataclasses.replace(cfg_cap, moe_capacity_factor=0.3)
    lg, _ = llama.forward(params, toks, llama.init_cache(starved, 2, 32),
                          starved)
    assert np.isfinite(np.asarray(lg)).all()


def test_moe_capacity_prefill_sharded():
    """Capacity dispatch composes with EP x TP (per-local-expert
    gather/scatter + (expert, model) psum)."""
    cfg_cap = dataclasses.replace(CFG, moe_prefill="capacity",
                                  moe_capacity_factor=4.0)
    params_ref = llama.init_params(CFG, seed=12, tp=1)
    toks = jnp.asarray(
        np.random.default_rng(12).integers(3, CFG.vocab_size, (2, 16)),
        jnp.int32)
    ref, _ = llama.forward(params_ref, toks,
                           llama.init_cache(CFG, 2, 32), CFG)
    params = llama.init_params(CFG, seed=12, tp=2)
    mesh = make_mesh(expert=2, model=2)
    ps = shard_params(params, mesh)
    cs = shard_cache(llama.init_cache(cfg_cap, 2, 32), mesh)
    fwd = make_sharded_forward(cfg_cap, mesh, ps, cs)
    lg, _ = fwd(ps, toks, cs)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert np.array_equal(np.argmax(np.asarray(lg), -1),
                          np.argmax(np.asarray(ref), -1))


def test_fused_all_experts_kernel_matches_loop():
    """dequant_matmul_moe: ONE launch for every expert's gate|up columns
    (concat over the parallel N grid) and ONE for the routed down
    combine (sum over the sequential K grid) must match the per-expert
    stacked-kernel calls exactly (same dequant math, same tiles)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from quant_tpu.core.qtensor import quantize_tensor
    from quant_tpu.kernels.dequant_matmul import (
        dequant_matmul, dequant_matmul_moe,
    )

    rng = np.random.default_rng(0)
    E, L, K, N = 4, 3, 256, 512
    ws = [rng.standard_normal((K, N)).astype(np.float32) / 16
          for _ in range(E * L)]
    for bits in (4, 8):
        qts = [quantize_tensor(w, bits=bits, group_size=128) for w in ws]
        merged = dc.replace(
            qts[0], codes=jnp.stack([q.codes for q in qts]),
            scales=jnp.stack([q.scales for q in qts]))
        layer = jnp.int32(1)
        x = jnp.asarray(rng.standard_normal((5, K)).astype(np.float32))
        y = dequant_matmul_moe(x, merged, layer, n_experts=E, stride=L,
                               mode="concat", interpret=True,
                               out_dtype=jnp.float32)
        refs = [np.asarray(dequant_matmul(
            x, merged, jnp.int32(e * L + 1), interpret=True,
            out_dtype=jnp.float32)) for e in range(E)]
        np.testing.assert_allclose(np.asarray(y),
                                   np.concatenate(refs, -1),
                                   rtol=1e-5, atol=1e-5)
        xs = jnp.asarray(rng.standard_normal((E, 5, K)).astype(
            np.float32))
        y2 = dequant_matmul_moe(xs, merged, layer, n_experts=E,
                                stride=L, mode="sum", interpret=True,
                                out_dtype=jnp.float32)
        want = sum(np.asarray(dequant_matmul(
            xs[e], merged, jnp.int32(e * L + 1), interpret=True,
            out_dtype=jnp.float32)) for e in range(E))
        np.testing.assert_allclose(np.asarray(y2), want,
                                   rtol=1e-4, atol=1e-4)


def test_fused_all_experts_model_matches_xla():
    """mlp_block's fused all-experts path (interpret) must reproduce the
    XLA per-expert loop through full forwards — DeepSeek (sigmoid+bias
    groups, shared experts, dense prefix) AND Mixtral-style routing."""
    import dataclasses as dc

    for preset, seed in (("test-tiny-dsv3", 0), ("test-tiny-moe", 1)):
        cfg_x = dc.replace(PRESETS[preset], dtype="float32",
                           kernel_mode="xla")
        cfg_f = dc.replace(cfg_x, kernel_mode="pallas_interpret",
                           moe_fused=True)
        params = llama.init_params(cfg_x, seed=seed)
        toks = np.random.default_rng(seed).integers(
            2, cfg_x.vocab_size, (2, 6))
        lg_x, _ = llama.forward(params, jnp.asarray(toks, jnp.int32),
                                llama.init_cache(cfg_x, 2, 16), cfg_x)
        lg_f, _ = llama.forward(params, jnp.asarray(toks, jnp.int32),
                                llama.init_cache(cfg_f, 2, 16), cfg_f)
        np.testing.assert_allclose(np.asarray(lg_f, np.float32),
                                   np.asarray(lg_x, np.float32),
                                   rtol=5e-3, atol=5e-3)


def test_moe_routed_hot_list_kernel():
    """r5 routed decode (VERDICT r4 #7): the hot-expert list variant of
    dequant_matmul_moe must reproduce the dense all-experts result on
    the hot slots exactly (tail slots carry garbage that the caller
    zero-gates)."""
    import jax

    from quant_tpu.core.qtensor import quantize_tensor_device
    from quant_tpu.kernels.dequant_matmul import (
        dequant_matmul, dequant_matmul_moe,
    )

    E, L, K, N, M = 4, 2, 256, 256, 4
    qts = [quantize_tensor_device(
        jax.random.normal(k, (K, N)) * 0.05, 4, 64)
        for k in jax.random.split(jax.random.key(0), E * L)]
    qt = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    x = jax.random.normal(jax.random.key(1), (M, 1, K), jnp.float32)
    # experts 0 and 2 hot
    hot = jnp.asarray([2, 0, 2, 2, 2], jnp.int32)
    layer = jnp.int32(1)
    gu = dequant_matmul_moe(x, qt, layer, n_experts=E, stride=L,
                            mode="concat", interpret=True, hot=hot)
    gu = gu.reshape(M, 1, E, N)
    for slot, e in ((0, 0), (1, 2)):
        ref = dequant_matmul(x, _slice_qt(qt, e * L + 1), interpret=True)
        np.testing.assert_allclose(np.asarray(gu[:, :, slot]),
                                   np.asarray(ref), rtol=2e-5, atol=2e-5)

    # sum mode: tail x slots zero → result == sum over the hot slots
    xs = jax.random.normal(jax.random.key(2), (E, M, 1, K), jnp.float32)
    xs = xs.at[2:].set(0.0)
    out = dequant_matmul_moe(xs, qt, layer, n_experts=E, stride=L,
                             mode="sum", interpret=True,
                             out_dtype=jnp.float32, hot=hot)
    want = sum(np.asarray(dequant_matmul(
        xs[s], _slice_qt(qt, e * L + 1), interpret=True,
        out_dtype=jnp.float32)) for s, e in ((0, 0), (1, 2)))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5,
                               atol=2e-5)


def _slice_qt(qt, i):
    import dataclasses as _dc

    return _dc.replace(qt, codes=qt.codes[i], scales=qt.scales[i])


def test_moe_psum_decode_fallback_past_vmem_budget():
    """psum-mode decode normally keeps ALL experts' x rows resident in
    ONE [E*TM, tk] VMEM block; past _SCOPED_VMEM_BUDGET (DeepSeek-V3 scale:
    E=256 at batch >= 32) that block cannot fit and the kernel must
    fall back to per-expert x blocks — same math, different index maps
    (kernels/dequant_matmul.py ``res_ok``)."""
    import dataclasses as dc

    import importlib

    from quant_tpu.core.qtensor import quantize_tensor
    dm = importlib.import_module("quant_tpu.kernels.dequant_matmul")

    E, M, K, N = 64, 136, 1024, 128
    rng = np.random.default_rng(3)
    qts = [quantize_tensor(
        rng.standard_normal((K, N)).astype(np.float32) / 32,
        bits=8, group_size=128) for _ in range(E)]
    qt = dc.replace(qts[0], codes=jnp.stack([q.codes for q in qts]),
                    scales=jnp.stack([q.scales for q in qts]))
    # the guard must actually fire at these shapes (tm=M pad, tk=512:
    # the resident x windows alone already blow the scoped budget)
    assert 2 * E * 136 * 512 * 4 > dm._SCOPED_VMEM_BUDGET
    xs = jnp.asarray(rng.standard_normal((E, M, K)).astype(np.float32))
    out = dm.dequant_matmul_moe(xs, qt, jnp.int32(0), n_experts=E,
                                stride=1, mode="psum", interpret=True,
                                out_dtype=jnp.float32)
    want = sum(np.asarray(dm.dequant_matmul_reference(
        xs[e], _slice_qt(qt, e), out_dtype=jnp.float32))
        for e in range(E))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4,
                               atol=2e-4)


def test_moe_routed_decode_matches_dense():
    """The routed-hot decode policy (E >> expected hot) must reproduce
    the dense-all-experts forward: hot list covers every routed
    expert, the permuted weights zero the tail. Backend held constant
    (pallas_interpret both sides, moe_routed on vs off) so only the
    dispatch differs — generic interpret-vs-XLA kernel noise cascading
    through int8 KV quantize boundaries is NOT re-tested here."""
    from quant_tpu.models.config import ModelConfig
    from quant_tpu.models.llama import _routed_buckets

    # E=8 -> single bucket [8]; E=16 -> ladder [8, 16] whose SMALL
    # bucket the 5x2 routing actually lands in (the r5 bucketed grid)
    assert _routed_buckets(16) == [8, 16]
    assert _routed_buckets(256) == [32, 64, 128, 256]
    for n_exp in (8, 16):
        cfg_d = ModelConfig(
            vocab_size=512, dim=256, n_layers=2, n_heads=4,
            n_kv_heads=2, intermediate=256, group_size=64,
            kernel_mode="pallas_interpret",
            n_experts=n_exp, experts_per_token=2, moe_routed="off",
        )
        cfg_r = dataclasses.replace(cfg_d, moe_routed="on")
        params = llama.init_params(cfg_d, seed=3)
        rng = np.random.default_rng(3)
        toks = jnp.asarray(rng.integers(0, cfg_d.vocab_size, (5, 4)),
                           jnp.int32)
        cache_d = llama.init_cache(cfg_d, 5, 16)
        cache_r = llama.init_cache(cfg_r, 5, 16)
        _, cache_d = llama.forward(params, toks, cache_d, cfg_d)
        _, cache_r = llama.forward(params, toks, cache_r, cfg_r)
        t = toks[:, -1:]
        for _ in range(3):
            ld, cache_d = llama.forward(params, t, cache_d, cfg_d)
            lr, cache_r = llama.forward(params, t, cache_r, cfg_r)
            # only the k>=2 per-token SUM order differs (hot-slot vs
            # expert order) — pure fp-add noise
            np.testing.assert_allclose(
                np.asarray(lr, np.float32), np.asarray(ld, np.float32),
                rtol=1e-4, atol=1e-4)
            np.testing.assert_array_equal(np.asarray(cache_r.k_codes),
                                          np.asarray(cache_d.k_codes))
            t = jnp.argmax(ld[:, -1:], -1).astype(jnp.int32)


def test_moe_down_k_padding_exact():
    """r5: we_down's K pads to a 1024 multiple per TP block (the
    stacked kernel streams tk=512 shapes ~6.5x faster at depth on
    hardware). Zero rows meet zero x columns — forward must EQUAL an
    unpadded dense reference, incl. the tp=2 block-interleaved case."""
    from quant_tpu.models.llama import _pad_moe_down_k, _pad_x_to_k

    rng = np.random.default_rng(0)
    w = rng.standard_normal((1408, 256)).astype(np.float32)
    for tp in (1, 2):
        wp = _pad_moe_down_k(w, tp)
        assert wp.shape[0] % 1024 == 0 and wp.shape[0] % tp == 0
        x = jnp.asarray(rng.standard_normal((3, 1408)), jnp.float32)
        xp = _pad_x_to_k(x, wp.shape[0], tp)
        got = np.asarray(xp) @ np.asarray(wp)
        want = np.asarray(x) @ w
        # fp32 sum-order noise over K=1408 (values ~1e2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # already-tileable shapes stay untouched (DeepSeek-V3 / Mixtral)
    w2 = rng.standard_normal((2048, 128)).astype(np.float32)
    assert _pad_moe_down_k(w2, 1) is w2


def test_moe_grouped_kernel_mode():
    """mode="grouped" (r5 capacity dispatch): per-expert [E, C, N]
    outputs from ONE launch must equal the per-expert stacked matmuls
    exactly (same psum grid, slots returned instead of summed)."""
    import dataclasses as dc

    from quant_tpu.core.qtensor import quantize_tensor
    from quant_tpu.kernels.dequant_matmul import (
        dequant_matmul, dequant_matmul_moe,
    )

    rng = np.random.default_rng(5)
    E, L, K, N, C = 4, 3, 256, 512, 8
    ws = [rng.standard_normal((K, N)).astype(np.float32) / 16
          for _ in range(E * L)]
    for bits in (4, 8):
        qts = [quantize_tensor(w, bits=bits, group_size=128) for w in ws]
        merged = dc.replace(
            qts[0], codes=jnp.stack([q.codes for q in qts]),
            scales=jnp.stack([q.scales for q in qts]))
        layer = jnp.int32(1)
        xs = jnp.asarray(rng.standard_normal((E, C, K)).astype(
            np.float32))
        y = dequant_matmul_moe(xs, merged, layer, n_experts=E, stride=L,
                               mode="grouped", interpret=True,
                               out_dtype=jnp.float32)
        assert y.shape == (E, C, N)
        for e in range(E):
            ref = dequant_matmul(xs[e], merged, jnp.int32(e * L + 1),
                                 interpret=True, out_dtype=jnp.float32)
            np.testing.assert_allclose(np.asarray(y[e]), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)


def test_moe_capacity_fused_matches_loop_and_decode():
    """r5: the capacity dispatch runs as ONE fused grouped-GEMM pair
    (vectorized slotting) when shapes tile — must match the per-expert
    loop on the same backend; and capacity now engages at high-batch
    DECODE (tokens*k >= 2E at T=1), matching the dense path when the
    capacity factor guarantees no drops."""
    cfg_loop = dataclasses.replace(
        CFG, moe_prefill="capacity", moe_capacity_factor=4.0,
        kernel_mode="pallas_interpret", dtype="float32",
        moe_fused=False)
    cfg_fused = dataclasses.replace(cfg_loop, moe_fused=True)
    cfg_dense = dataclasses.replace(cfg_fused, moe_prefill="dense")
    params = llama.init_params(cfg_loop, seed=6)
    rng = np.random.default_rng(6)
    toks = jnp.asarray(rng.integers(2, CFG.vocab_size, (4, 8)),
                       jnp.int32)

    def run(cfg):
        cache = llama.init_cache(cfg, 4, 16)
        lg, cache = llama.forward(params, toks, cache, cfg)
        outs = [lg[:, -1]]
        t = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
        for _ in range(2):   # B=4, T=1: tokens*k = 8 >= 2E = 8
            lg, cache = llama.forward(params, t, cache, cfg)
            outs.append(lg[:, -1])
            t = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
        return np.asarray(jnp.stack(outs, 1), np.float32)

    lo, fu, de = run(cfg_loop), run(cfg_fused), run(cfg_dense)
    # fused vs loop: identical slotting, same kernel family — only the
    # scatter-add order differs
    np.testing.assert_allclose(fu, lo, rtol=2e-5, atol=2e-5)
    # cf=4.0 → cap = tokens: nothing drops, so capacity == dense up to
    # combine order (dense weights every expert; capacity gathers)
    np.testing.assert_allclose(fu, de, rtol=1e-4, atol=1e-4)
    assert np.array_equal(np.argmax(fu, -1), np.argmax(de, -1))


def test_moe_capacity_fused_sharded():
    """The FUSED grouped-GEMM capacity dispatch (r5) composes with
    EP x TP the same way the loop does: per-LOCAL-expert slotting and
    gather/scatter inside the shard, (expert, model) psum combine."""
    cfg_cap = dataclasses.replace(
        CFG, moe_prefill="capacity", moe_capacity_factor=4.0,
        kernel_mode="pallas_interpret", moe_fused=True,
        dtype="float32")
    cfg_ref = dataclasses.replace(cfg_cap, moe_prefill="dense")
    params_ref = llama.init_params(cfg_ref, seed=12, tp=1)
    toks = jnp.asarray(
        np.random.default_rng(12).integers(3, CFG.vocab_size, (2, 16)),
        jnp.int32)
    ref, _ = llama.forward(params_ref, toks,
                           llama.init_cache(cfg_ref, 2, 32), cfg_ref)
    params = llama.init_params(cfg_cap, seed=12, tp=2)
    mesh = make_mesh(expert=2, model=2)
    ps = shard_params(params, mesh)
    cs = shard_cache(llama.init_cache(cfg_cap, 2, 32), mesh)
    fwd = make_sharded_forward(cfg_cap, mesh, ps, cs)
    lg, _ = fwd(ps, toks, cs)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert np.array_equal(np.argmax(np.asarray(lg), -1),
                          np.argmax(np.asarray(ref), -1))
