"""Paged KV pool x multi-chip engine composition: per-data-shard page
pools (pool pages sharded over ``data``, kv-heads over ``model``;
shard-local page ids in slot-major table rows) must reproduce the exact
single-device greedy streams on the 8-virtual-device CPU mesh.

SURVEY #5/#15 + VERDICT r1 #1/#4 combined: continuous batching across
chips WITH HBM bounded by allocated pages.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.engine import Engine, Request
from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.parallel import make_mesh

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


def _prompts(n, seed=0, lens=(5, 11, 3, 8)):
    rng = np.random.default_rng(seed)
    return [list(map(int, rng.integers(3, CFG.vocab_size, lens[i % 4])))
            for i in range(n)]


@pytest.mark.parametrize("mesh_kw,tp_pack", [
    (dict(data=2, model=4), 4),   # DP x TP (8 devices)
    (dict(data=2, model=2), 2),   # DP x TP (4 devices)
    (dict(data=1, model=4), 4),   # pure TP
    (dict(pipe=2, model=2), 2),   # PP x TP (stage-sliced pool)
    (dict(pipe=2, data=2, model=2), 2),   # PP x DP x TP (8 devices)
])
def test_paged_mesh_engine_matches_reference(mesh_kw, tp_pack):
    params_ref = llama.init_params(CFG, seed=0, tp=1)
    params = llama.init_params(CFG, seed=0, tp=tp_pack)
    mesh = make_mesh(**mesh_kw)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh, paged=True, page_size=PAGE)
    prompts = _prompts(3)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params_ref, p, 6), (p, o)
    # every group's pages returned after the batch drains
    for free in eng._free_pages:
        assert len(free) == eng.n_pages - 1


def test_paged_mesh_step_block():
    params_ref = llama.init_params(CFG, seed=1, tp=1)
    params = llama.init_params(CFG, seed=1, tp=2)
    mesh = make_mesh(data=2, model=2)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh, paged=True, page_size=PAGE)
    prompts = _prompts(4, seed=3)
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=7)
            for i, p in enumerate(prompts)]
    for r in reqs:
        eng.add_request(r)
    while eng.has_work():
        eng.step_block(3)
    for r, p in zip(reqs, prompts):
        assert r.output == _reference_greedy(params_ref, p, 7)


def test_paged_mesh_oversubscribed_preempts_per_group():
    """Pool too small for the worst case in EACH data group: growth
    preempts the newest slot of the exhausted group only; the preempted
    request resumes and still produces the exact greedy stream."""
    params_ref = llama.init_params(CFG, seed=2, tp=1)
    params = llama.init_params(CFG, seed=2, tp=2)
    mesh = make_mesh(data=2, model=2)
    rng = np.random.default_rng(7)
    prompts = [list(map(int, rng.integers(3, CFG.vocab_size, 20)))
               for _ in range(4)]
    # per-group worst case: 2 slots * ceil(44/8)=12 pages; give 10 (+1
    # scratch) per group
    eng = Engine(params, CFG, max_slots=4, max_seq=48, eos_id=-1,
                 mesh=mesh, paged=True, page_size=PAGE, n_pages=11)
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=24)
            for i, p in enumerate(prompts)]
    for r in reqs:
        eng.add_request(r)
    while eng.has_work():
        eng.step()
    for r, p in zip(reqs, prompts):
        assert r.output == _reference_greedy(params_ref, p, 24,
                                             max_seq=48), r.req_id
    for free in eng._free_pages:
        assert len(free) == eng.n_pages - 1


def test_paged_pp_microbatched_matches_reference():
    """GPipe microbatching over the paged pool: page-table rows follow the
    microbatch slot window (llama.make_layer_step slices them by batch0)."""
    params_ref = llama.init_params(CFG, seed=4, tp=1)
    params = llama.init_params(CFG, seed=4, tp=2)
    mesh = make_mesh(pipe=2, model=2)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh, paged=True, page_size=PAGE, pp_micro=2)
    prompts = _prompts(4, seed=9)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params_ref, p, 6), (p, o)


def test_paged_mesh_engine_moe_expert_axis():
    """Paged pool + MoE over an (expert, data, model) mesh: the pool
    shards over data/model and replicates over expert; expert weights
    shard over the expert axis (SURVEY #14 x #15 composition)."""
    import dataclasses

    moe_cfg = dataclasses.replace(CFG, n_experts=4, experts_per_token=2)
    params_ref = llama.init_params(moe_cfg, seed=5, tp=1)
    params = llama.init_params(moe_cfg, seed=5, tp=2)
    mesh = make_mesh(expert=2, data=2, model=2)
    eng = Engine(params, moe_cfg, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh, paged=True, page_size=PAGE)
    prompts = _prompts(3, seed=5)
    outs = eng.generate(prompts, max_new_tokens=6)

    def ref(prompt, max_new):
        cache = llama.init_cache(moe_cfg, 1, 64)
        lg, cache = llama.forward(
            params_ref, jnp.asarray([prompt], jnp.int32), cache, moe_cfg)
        out = [int(jnp.argmax(lg[0, -1]))]
        for _ in range(max_new - 1):
            lg, cache = llama.forward(
                params_ref, jnp.asarray([[out[-1]]], jnp.int32), cache,
                moe_cfg)
            out.append(int(jnp.argmax(lg[0, -1])))
        return out

    for p, o in zip(prompts, outs):
        assert o == ref(p, 6), (p, o)
    for free in eng._free_pages:
        assert len(free) == eng.n_pages - 1


@pytest.mark.parametrize("mesh_kw,tp_pack", [
    (dict(data=1, model=1, seq=2), 1),       # pure seq-sharded pool
    (dict(data=2, model=2, seq=2), 2),       # DP x TP x SP (8 devices)
])
def test_paged_seq_mesh_engine_matches_reference(mesh_kw, tp_pack):
    """r5 (VERDICT r4 missing #3): the paged pool composes with seq>1 —
    each (data, seq) shard owns a private pool paging its OWN global-S
    segment (table columns segment-major over seq, shard-local ids),
    decode gathers local pages and LSE-merges across seq shards.
    Greedy equality vs single-device, incl. prompts straddling an
    S-shard boundary (max_seq=64, seg=32: the 40-token prompt writes
    cross the boundary mid-chunk)."""
    params_ref = llama.init_params(CFG, seed=0, tp=1)
    params = llama.init_params(CFG, seed=0, tp=tp_pack)
    mesh = make_mesh(**mesh_kw)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh, paged=True, page_size=PAGE)
    prompts = _prompts(3) + [_prompts(1, seed=9, lens=(40,))[0]]
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params_ref, p, 6), (p, o)


def test_paged_seq_prefix_cache_reuses_pages():
    """Prefix caching over the seq-sharded pool: a repeated prompt's
    full blocks are reused from the right (data, seq) pools and the
    output stays equal to the uncached stream."""
    params = llama.init_params(CFG, seed=1)
    mesh = make_mesh(data=1, model=1, seq=2)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                 mesh=mesh, paged=True, page_size=PAGE,
                 prefix_cache=True)
    prompt = _prompts(1, seed=4, lens=(37,))[0]   # 4 full 8-blocks
    want = _reference_greedy(params, prompt, 5)
    assert eng.generate([prompt], max_new_tokens=5)[0] == want
    hits0 = eng.stats.get("prefix_hit_tokens", 0)
    assert eng.generate([prompt], max_new_tokens=5)[0] == want
    assert eng.stats["prefix_hit_tokens"] > hits0
