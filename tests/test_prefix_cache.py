"""Prompt-prefix page sharing (automatic prefix caching on the paged KV
pool): requests whose prompts share page-aligned prefixes reuse the cached
pages — admission skips the shared blocks' prefill compute and the suffix
prefills DIRECTLY into pool pages (attending to the prefix through the
page table). Streams must equal the no-sharing reference exactly.

Design notes: block keys chain (key_j = H(key_{j-1} || block_j tokens)),
so a hit certifies the whole prefix; only FULL pages are shared (decode
writes always land past them); freed-but-cached pages are evictable LRU.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.engine import Engine, Request
from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig

CFG = ModelConfig(
    vocab_size=512, dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
    intermediate=512, group_size=64, kernel_mode="xla",
)
PAGE = 8


def _reference_greedy(params, prompt, max_new, max_seq=64):
    cache = llama.init_cache(CFG, batch=1, max_seq=max_seq)
    toks = jnp.asarray([prompt], jnp.int32)
    logits, cache = llama.forward(params, toks, cache, CFG)
    out = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(max_new - 1):
        lg, cache = llama.forward(
            params, jnp.asarray([[out[-1]]], jnp.int32), cache, CFG)
        out.append(int(jnp.argmax(lg[0, -1])))
    return out


def _engine(params, **kw):
    kw.setdefault("max_slots", 4)
    kw.setdefault("max_seq", 64)
    kw.setdefault("eos_id", -1)
    return Engine(params, CFG, paged=True, page_size=PAGE,
                  prefix_cache=True, **kw)


SYS = list(range(100, 100 + 2 * PAGE))  # two full shared "system" blocks


def test_prefix_hit_exact_streams():
    """Second request reuses the first's 2-block prefix; both streams
    match the reference and the hit is visible in stats + page refs."""
    params = llama.init_params(CFG, seed=0)
    eng = _engine(params)
    p1 = SYS + [7, 9, 11]
    p2 = SYS + [13, 5]
    r1 = Request(req_id=0, prompt=p1, max_new_tokens=6)
    eng.add_request(r1)
    while eng._prefilling is not None or not r1.output:
        eng.step()
    assert eng.stats["prefix_hit_tokens"] == 0
    assert eng.stats["cached_blocks"] == 2
    r2 = Request(req_id=1, prompt=p2, max_new_tokens=6)
    eng.add_request(r2)
    eng.step()  # admission of r2 matches the cached prefix
    assert eng.stats["prefix_hit_tokens"] == 2 * PAGE
    # shared pages referenced by both slots
    shared = [int(eng._page_tbl[0, j]) for j in range(2)]
    assert [int(eng._page_tbl[1, j]) for j in range(2)] == shared
    assert all(eng._page_ref[0][pg] == 2 for pg in shared)
    while eng.has_work():
        eng.step()
    assert r1.output == _reference_greedy(params, p1, 6)
    assert r2.output == _reference_greedy(params, p2, 6)


def test_prefix_hit_after_owner_finished():
    """Cached blocks outlive their owner: a request admitted AFTER the
    first finished still reuses its pages (they sat evictable)."""
    params = llama.init_params(CFG, seed=1)
    eng = _engine(params)
    p1 = SYS + [3]
    outs = eng.generate([p1], max_new_tokens=5)
    assert outs[0] == _reference_greedy(params, p1, 5)
    assert eng.stats["cached_blocks"] == 2
    assert len(eng._evictable[0]) == 2  # unreferenced but cached
    p2 = SYS + [21, 22, 23]
    outs = eng.generate([p2], max_new_tokens=5)
    assert outs[0] == _reference_greedy(params, p2, 5)
    assert eng.stats["prefix_hit_tokens"] == 2 * PAGE


def test_identical_prompt_leaves_one_token():
    """A prompt identical to a cached one (page-aligned length) still
    prefills its last token — the logits seed sampling."""
    params = llama.init_params(CFG, seed=2)
    eng = _engine(params)
    p = SYS[:]  # exactly 2 pages
    o1 = eng.generate([p], max_new_tokens=4)[0]
    o2 = eng.generate([p], max_new_tokens=4)[0]
    ref = _reference_greedy(params, p, 4)
    assert o1 == ref and o2 == ref
    # only ONE full block reusable (the last token must be prefilled);
    # the hit covers a single page
    assert eng.stats["prefix_hit_tokens"] == PAGE


def test_eviction_under_pressure_stays_correct():
    """Pool too small to keep dead cached blocks: they get evicted for
    fresh allocations and every stream still matches the reference."""
    params = llama.init_params(CFG, seed=3)
    rng = np.random.default_rng(5)
    prompts = [list(map(int, rng.integers(3, 99, 3 * PAGE + 2)))
               for _ in range(4)]
    # 4 slots x (26+1 tokens -> 4 pages) = 16 pages + scratch; give 13 so
    # later admissions must evict finished requests' cached pages
    eng = _engine(params, n_pages=13, max_seq=32)
    for seq in (prompts[:2], prompts[2:]):
        outs = eng.generate(seq, max_new_tokens=4)
        for p, o in zip(seq, outs):
            assert o == _reference_greedy(params, p, 4, max_seq=32), p


def test_partial_block_not_shared():
    """Prompts shorter than one page never share (no full block)."""
    params = llama.init_params(CFG, seed=4)
    eng = _engine(params)
    p = [5, 6, 7]
    o1 = eng.generate([p], max_new_tokens=4)[0]
    o2 = eng.generate([p], max_new_tokens=4)[0]
    ref = _reference_greedy(params, p, 4)
    assert o1 == ref and o2 == ref
    assert eng.stats["prefix_hit_tokens"] == 0
    assert eng.stats["cached_blocks"] == 0


def test_prefix_requires_paged():
    params = llama.init_params(CFG, seed=0)
    with pytest.raises(ValueError, match="paged"):
        Engine(params, CFG, prefix_cache=True)


def test_divergent_suffix_no_false_hit():
    """Same first block, different second block: only one block shared."""
    params = llama.init_params(CFG, seed=6)
    eng = _engine(params)
    p1 = SYS[:PAGE] + [40] * PAGE + [1]
    p2 = SYS[:PAGE] + [41] * PAGE + [1]
    o1 = eng.generate([p1], max_new_tokens=4)[0]
    o2 = eng.generate([p2], max_new_tokens=4)[0]
    assert o1 == _reference_greedy(params, p1, 4)
    assert o2 == _reference_greedy(params, p2, 4)
    assert eng.stats["prefix_hit_tokens"] == PAGE  # block 1 only


def test_prefix_cache_on_mesh():
    """Prefix caching over a (data, model) mesh: prefix state is per
    data group (page ids are shard-local), the meshed suffix-prefill
    writes only the owner shard's pool (others hit scratch page 0), and
    streams equal the single-device reference exactly."""
    from quant_tpu.parallel import make_mesh

    # f32: TP psum reordering at bf16 can flip near-tie argmaxes on a
    # random-init model, which would make exact-equality vacuously flaky
    cfg = dataclasses.replace(CFG, dtype="float32")
    params_ref = llama.init_params(cfg, seed=6, tp=1)
    params = llama.init_params(cfg, seed=6, tp=2)
    mesh = make_mesh(data=2, model=2)
    eng = Engine(params, cfg, paged=True, page_size=PAGE,
                 prefix_cache=True, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh)
    # sequential admissions land in slots 0 then 1 — SAME data group, so
    # the second request hits the first's cached prefix
    p1 = SYS + [7, 8, 9]
    p2 = SYS + [3, 4]
    r1 = Request(req_id=0, prompt=p1, max_new_tokens=6)
    r2 = Request(req_id=1, prompt=p2, max_new_tokens=6)
    eng.add_request(r1)
    while eng._prefilling is not None or eng.pending:
        eng._advance_admission()
    eng.add_request(r2)
    while eng.has_work():
        eng.step()

    def ref(prompt, n):
        cache = llama.init_cache(cfg, 1, 64)
        logits, cache = llama.forward(
            params_ref, jnp.asarray([prompt], jnp.int32), cache, cfg)
        out = [int(jnp.argmax(logits[0, -1]))]
        for _ in range(n - 1):
            lg, cache = llama.forward(
                params_ref, jnp.asarray([[out[-1]]], jnp.int32), cache,
                cfg)
            out.append(int(jnp.argmax(lg[0, -1])))
        return out

    assert r1.output == ref(p1, 6)
    assert r2.output == ref(p2, 6)
    assert eng.stats["prefix_hit_tokens"] == 2 * PAGE
    assert eng.stats["cached_blocks"] >= 2


def test_prefix_cache_mesh_rejects_pipe():
    from quant_tpu.parallel import make_mesh

    params = llama.init_params(CFG, seed=6, tp=2)
    with pytest.raises(ValueError, match="pipe"):
        Engine(params, CFG, paged=True, page_size=PAGE,
               prefix_cache=True, max_slots=4, max_seq=64, eos_id=-1,
               mesh=make_mesh(pipe=2, model=2))
