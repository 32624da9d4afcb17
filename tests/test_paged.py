"""Paged INT8 KV cache: kernels, model forward, engine allocator
(VERDICT r1 #4 / SURVEY #5 #15). CPU: Pallas kernels in interpret mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.engine import Engine, Request, SamplingConfig
from quant_tpu.models import PRESETS, llama

CFG = PRESETS["test-tiny"]
PAGE = 8


def _mk_pool_and_contig(seed, b, s_max, n_pages, lengths):
    """Random contiguous cache + the SAME data laid out in a page pool
    with a random page assignment."""
    rng = np.random.default_rng(seed)
    l, h, d = CFG.n_layers, CFG.n_kv_heads, CFG.head_dim
    kc = rng.integers(-127, 127, (l, b, h, s_max, d)).astype(np.int8)
    ks = rng.random((l, b, h, s_max), np.float32) + 0.5
    vc = rng.integers(-127, 127, (l, b, h, s_max, d)).astype(np.int8)
    vs = rng.random((l, b, h, s_max), np.float32) + 0.5
    n_per = s_max // PAGE
    perm = rng.permutation(np.arange(1, n_pages))[: b * n_per]
    tbl = perm.reshape(b, n_per).astype(np.int32)
    pool_kc = np.zeros((l, n_pages, h, PAGE, d), np.int8)
    pool_ks = np.zeros((l, n_pages, h, PAGE), np.float32)
    pool_vc = np.zeros((l, n_pages, h, PAGE, d), np.int8)
    pool_vs = np.zeros((l, n_pages, h, PAGE), np.float32)
    for bb in range(b):
        for p in range(n_per):
            sl = slice(p * PAGE, (p + 1) * PAGE)
            pg = tbl[bb, p]
            pool_kc[:, pg] = kc[:, bb, :, sl]
            pool_ks[:, pg] = ks[:, bb, :, sl]
            pool_vc[:, pg] = vc[:, bb, :, sl]
            pool_vs[:, pg] = vs[:, bb, :, sl]
    contig = (kc, ks, vc, vs)
    pool = (pool_kc, pool_ks, pool_vc, pool_vs)
    return contig, pool, tbl, jnp.asarray(lengths, jnp.int32)


def test_paged_flash_decode_matches_contiguous():
    from quant_tpu.kernels.paged_attention import (
        paged_attention_reference, paged_flash_decode_int8,
    )

    b, s_max, n_pages = 3, 32, 32
    lengths = [9, 32, 17]
    contig, pool, tbl, lens = _mk_pool_and_contig(0, b, s_max, n_pages,
                                                  lengths)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal(
        (b, CFG.n_heads, CFG.head_dim)), jnp.float32)
    for layer in range(CFG.n_layers):
        ref = llama.attention(
            q[:, None], *(jnp.asarray(a[:, :][layer]) for a in contig),
            (lens - 1)[:, None], lens, CFG)[:, 0]
        via_ref = paged_attention_reference(
            q, *(jnp.asarray(a) for a in pool), jnp.asarray(tbl), lens,
            layer)
        np.testing.assert_allclose(np.asarray(via_ref), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        out = paged_flash_decode_int8(
            q, *(jnp.asarray(a) for a in pool), jnp.asarray(tbl), lens,
            layer, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_paged_insert_kernel_matches_scatter():
    from quant_tpu.kernels.cache_insert import paged_cache_insert_int8

    b, s_max, n_pages = 2, 32, 24
    lengths = [5, 19]
    _, pool, tbl, lens = _mk_pool_and_contig(2, b, s_max, n_pages, lengths)
    rng = np.random.default_rng(3)
    h, d = CFG.n_kv_heads, CFG.head_dim
    k_new = jnp.asarray(rng.integers(-127, 127, (b, 1, h, d)), jnp.int8)
    k_s = jnp.asarray(rng.random((b, 1, h)), jnp.float32)
    v_new = jnp.asarray(rng.integers(-127, 127, (b, 1, h, d)), jnp.int8)
    v_s = jnp.asarray(rng.random((b, 1, h)), jnp.float32)
    layer = 1
    ref_kc, ref_ks = llama._paged_insert_at_layer(
        jnp.asarray(pool[0]), jnp.asarray(pool[1]), k_new, k_s, lens,
        layer, jnp.asarray(tbl))
    ref_vc, ref_vs = llama._paged_insert_at_layer(
        jnp.asarray(pool[2]), jnp.asarray(pool[3]), v_new, v_s, lens,
        layer, jnp.asarray(tbl))
    out = paged_cache_insert_int8(
        *(jnp.asarray(a) for a in pool), k_new, k_s, v_new, v_s, lens,
        layer, jnp.asarray(tbl), interpret=True)
    for got, want in zip(out, (ref_kc, ref_ks, ref_vc, ref_vs)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_paged_forward_matches_contiguous():
    """Full model prefill + decode over the paged pool (XLA gather path)
    == contiguous cache."""
    params = llama.init_params(CFG, seed=4)
    b, max_seq = 2, 32
    toks = jnp.asarray(
        np.random.default_rng(4).integers(0, CFG.vocab_size, (b, 6)),
        jnp.int32)
    ref_cache = llama.init_cache(CFG, b, max_seq)
    ref1, ref_cache = llama.forward(params, toks, ref_cache, CFG)
    pc = llama.init_paged_cache(CFG, b, max_seq, n_pages=1 + b * 4,
                                page=PAGE)
    # identity-ish allocation: slot i gets pages [1+4i .. 4+4i]
    tbl = np.arange(1, 1 + b * 4, dtype=np.int32).reshape(b, 4)
    pc = dataclasses.replace(pc, page_tbl=jnp.asarray(tbl))
    out1, pc = llama.forward(params, toks, pc, CFG)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref1))
    for _ in range(3):
        nxt = jnp.argmax(ref1[:, -1:], axis=-1).astype(jnp.int32)
        ref1, ref_cache = llama.forward(params, nxt, ref_cache, CFG)
        out1, pc = llama.forward(params, nxt, pc, CFG)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref1))


def _reference_greedy(params, prompt, max_new, max_seq=64):
    cache = llama.init_cache(CFG, batch=1, max_seq=max_seq)
    logits, cache = llama.forward(
        params, jnp.asarray([prompt], jnp.int32), cache, CFG)
    out = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(max_new - 1):
        lg, cache = llama.forward(
            params, jnp.asarray([[out[-1]]], jnp.int32), cache, CFG)
        out.append(int(jnp.argmax(lg[0, -1])))
    return out


def test_paged_engine_matches_reference():
    params = llama.init_params(CFG, seed=5)
    rng = np.random.default_rng(5)
    prompts = [list(map(int, rng.integers(3, CFG.vocab_size, n)))
               for n in (5, 11, 3, 26)]
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 paged=True, page_size=PAGE)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params, p, 6), (p, o)
    # all pages returned after the batch drains
    assert len(eng._free_pages[0]) == eng.n_pages - 1


def test_paged_engine_step_block():
    params = llama.init_params(CFG, seed=6)
    rng = np.random.default_rng(6)
    prompts = [list(map(int, rng.integers(3, CFG.vocab_size, n)))
               for n in (4, 9)]
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                 paged=True, page_size=PAGE)
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=7)
            for i, p in enumerate(prompts)]
    for r in reqs:
        eng.add_request(r)
    while eng.has_work():
        eng.step_block(3)
    for r, p in zip(reqs, prompts):
        assert r.output == _reference_greedy(params, p, 7)


def test_paged_engine_oversubscribed_preempts():
    """Pool smaller than worst case: admission/growth preempts the newest
    slot, which later RESUMES (prefilling prompt+output) and still
    produces the exact greedy stream."""
    params = llama.init_params(CFG, seed=7)
    rng = np.random.default_rng(7)
    p1 = list(map(int, rng.integers(3, CFG.vocab_size, 20)))
    p2 = list(map(int, rng.integers(3, CFG.vocab_size, 20)))
    # worst case needs 2*ceil(44/8)=12 pages (+scratch); give only 9
    eng = Engine(params, CFG, max_slots=2, max_seq=48, eos_id=-1,
                 paged=True, page_size=PAGE, n_pages=10)
    r1 = Request(req_id=0, prompt=p1, max_new_tokens=24)
    r2 = Request(req_id=1, prompt=p2, max_new_tokens=24)
    eng.add_request(r1)
    eng.add_request(r2)
    while eng.has_work():
        eng.step()
    assert r1.output == _reference_greedy(params, p1, 24, max_seq=48)
    assert r2.output == _reference_greedy(params, p2, 24, max_seq=48)
    assert len(eng._free_pages[0]) == eng.n_pages - 1


def test_paged_engine_hbm_bounded():
    """The whole point: pool bytes << contiguous cache bytes for the same
    slot count when typical lengths are short."""
    b, max_seq = 8, 1024
    contig = llama.init_cache(CFG, b, max_seq)
    contig_bytes = sum(a.nbytes for a in jax.tree.leaves(contig))
    paged = llama.init_paged_cache(CFG, b, max_seq, n_pages=1 + 2 * b,
                                   page=128)
    paged_bytes = sum(a.nbytes for a in jax.tree.leaves(paged))
    assert paged_bytes < contig_bytes / 3


def test_paged_flash_decode_int4_kv():
    """int4-packed pool (code dim Dh/2) through the paged Pallas kernel
    == the gather reference == the contiguous XLA path, exactly."""
    from quant_tpu.kernels.paged_attention import (
        paged_attention_reference, paged_flash_decode_int8,
    )

    cfg4 = dataclasses.replace(CFG, kv_bits=4)
    b, s_max, n_pages = 3, 32, 32
    lengths = [9, 32, 17]
    rng = np.random.default_rng(21)
    l, h, d = CFG.n_layers, CFG.n_kv_heads, CFG.head_dim
    hc = h // 2   # head-pair packed code heads (r4 kv4 layout)
    kc = rng.integers(0, 255, (l, b, hc, s_max, d)).astype(np.uint8)
    ks = rng.random((l, b, h, s_max), np.float32) + 0.5
    vc = rng.integers(0, 255, (l, b, hc, s_max, d)).astype(np.uint8)
    vs = rng.random((l, b, h, s_max), np.float32) + 0.5
    n_per = s_max // PAGE
    perm = rng.permutation(np.arange(1, n_pages))[: b * n_per]
    tbl = perm.reshape(b, n_per).astype(np.int32)
    pool = [np.zeros((l, n_pages, hc, PAGE, d), np.uint8),
            np.zeros((l, n_pages, h, PAGE), np.float32),
            np.zeros((l, n_pages, hc, PAGE, d), np.uint8),
            np.zeros((l, n_pages, h, PAGE), np.float32)]
    for bb in range(b):
        for p in range(n_per):
            sl = slice(p * PAGE, (p + 1) * PAGE)
            pg = tbl[bb, p]
            for dst, src in zip(pool, (kc, ks, vc, vs)):
                dst[:, pg] = src[:, bb, :, sl]
    lens = jnp.asarray(lengths, jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, CFG.n_heads, d)), jnp.float32)
    for layer in range(l):
        ref = llama.attention(
            q[:, None], *(jnp.asarray(a[layer]) for a in (kc, ks, vc, vs)),
            (lens - 1)[:, None], lens, cfg4)[:, 0]
        via_ref = paged_attention_reference(
            q, *(jnp.asarray(a) for a in pool), jnp.asarray(tbl), lens,
            layer)
        np.testing.assert_allclose(np.asarray(via_ref), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        out = paged_flash_decode_int8(
            q, *(jnp.asarray(a) for a in pool), jnp.asarray(tbl), lens,
            layer, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_paged_engine_int4_kv_matches_reference():
    """Paged engine with kv_bits=4: continuous batching == per-prompt
    reference greedy (the paged Pallas pair reads the packed pool)."""
    cfg = dataclasses.replace(CFG, kv_bits=4,
                              kernel_mode="pallas_interpret")
    params = llama.init_params(cfg, seed=31)
    rng = np.random.default_rng(31)
    prompts = [list(map(int, rng.integers(3, cfg.vocab_size, n)))
               for n in (5, 11, 3)]
    eng = Engine(params, cfg, max_slots=4, max_seq=64, eos_id=-1,
                 paged=True, page_size=PAGE)
    outs = eng.generate(prompts, max_new_tokens=6)

    def ref(prompt, max_new):
        cache = llama.init_cache(cfg, batch=1, max_seq=64)
        logits, cache = llama.forward(
            params, jnp.asarray([prompt], jnp.int32), cache, cfg)
        out = [int(jnp.argmax(logits[0, -1]))]
        for _ in range(max_new - 1):
            lg, cache = llama.forward(
                params, jnp.asarray([[out[-1]]], jnp.int32), cache, cfg)
            out.append(int(jnp.argmax(lg[0, -1])))
        return out

    for p, o in zip(prompts, outs):
        assert o == ref(p, 6), (p, o)


def test_paged_engine_fsm_and_lora():
    """Grammar FSM and LoRA adapters compose with the paged pool (and
    prefix caching): the device FSM/adapters are orthogonal to the KV
    layout."""
    from test_lora import _adapter

    from quant_tpu.engine.grammar import choice_fsm

    cfg = dataclasses.replace(CFG, kv_bits=8)
    params = llama.init_params(cfg, seed=51)
    eng = Engine(params, cfg, max_slots=2, max_seq=64, eos_id=7,
                 paged=True, page_size=16, prefix_cache=True,
                 loras={"a": _adapter(cfg, 52, r=2)})
    fsm = choice_fsm([[100, 101], [200]], cfg.vocab_size, 7)
    rc = Request(req_id=0, prompt=[5, 6, 8], max_new_tokens=6, fsm=fsm,
                 sampling=SamplingConfig(temperature=1.0))
    rl = Request(req_id=1, prompt=[9, 10, 11], max_new_tokens=4,
                 lora="a")
    eng.add_request(rc)
    eng.add_request(rl)
    while eng.has_work():
        eng.step()
    assert rc.output in ([100, 101, 7], [200, 7]), rc.output
    assert len(rl.output) == 4
    # the adapter changed the stream vs a base paged engine
    eng2 = Engine(params, cfg, max_slots=2, max_seq=64, eos_id=7,
                  paged=True, page_size=16)
    base = eng2.generate([[9, 10, 11]], max_new_tokens=4)[0]
    assert rl.output != base


def test_paged_flash_window_softcap_matches_xla():
    """r5: sliding window + softcap through the paged kernel — the page
    index-map clamps BOTH ends (pre-window pages never stream)."""
    from quant_tpu.kernels.paged_attention import (
        paged_gather, paged_flash_decode_int8,
    )

    cfg = dataclasses.replace(CFG, attn_softcap=30.0)
    b, s_max, n_pages = 3, 32, 32
    lengths = [9, 32, 17]
    contig, pool, tbl, lens = _mk_pool_and_contig(7, b, s_max, n_pages,
                                                  lengths)
    rng = np.random.default_rng(8)
    # scale q so pre-cap logits sit in tanh's ACTIVE range (the raw
    # ±127-code pool data would saturate the cap, where online-softmax
    # accumulation-order noise drowns the 2e-5 equality check)
    q = jnp.asarray(0.02 * rng.standard_normal(
        (b, CFG.n_heads, CFG.head_dim)), jnp.float32)
    for window in (12, 0):
        w = jnp.int32(window)
        for layer in range(CFG.n_layers):
            ref = llama.attention(
                q[:, None], *(jnp.asarray(a[:, :][layer]) for a in contig),
                (lens - 1)[:, None], lens, cfg, window=w)[:, 0]
            out = paged_flash_decode_int8(
                q, *(jnp.asarray(a) for a in pool), jnp.asarray(tbl),
                lens, layer, w, interpret=True, softcap=30.0)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)
