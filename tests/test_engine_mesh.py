"""Multi-chip continuous batching: Engine(mesh=...) vs per-prompt reference
on the 8-virtual-device CPU mesh (VERDICT r1 #1; BASELINE.json:5,10).

The engine's three device programs (prefill / insert / decode) run under
shard_map with TP column/row-split packed weights, the KV cache
batch-sharded over ``data`` and kv-head-sharded over ``model`` (and layers
over ``pipe``); outputs must equal the single-device engine exactly
(greedy decode: fp drift below the argmax decision boundary).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.engine import Engine, Request, SamplingConfig
from quant_tpu.models import llama
from quant_tpu.models.config import ModelConfig
from quant_tpu.parallel import make_mesh

# test-tiny has only 2 kv heads; the engine-mesh tests need tp=4.
CFG = ModelConfig(
    vocab_size=512, dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
    intermediate=512, group_size=64, kernel_mode="xla",
)


def _reference_greedy(params, prompt, max_new, max_seq=64):
    cache = llama.init_cache(CFG, batch=1, max_seq=max_seq)
    toks = jnp.asarray([prompt], jnp.int32)
    logits, cache = llama.forward(params, toks, cache, CFG)
    out = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(max_new - 1):
        lg, cache = llama.forward(
            params, jnp.asarray([[out[-1]]], jnp.int32), cache, CFG
        )
        out.append(int(jnp.argmax(lg[0, -1])))
    return out


def _prompts(n, rng_seed=0, lens=(5, 11, 3, 8)):
    rng = np.random.default_rng(rng_seed)
    return [list(map(int, rng.integers(3, CFG.vocab_size, lens[i % 4])))
            for i in range(n)]


@pytest.mark.parametrize("mesh_kw,tp_pack", [
    (dict(data=2, model=4), 4),   # DP x TP (8 devices)
    (dict(pipe=2, model=2), 2),   # PP x TP (4 devices)
    (dict(data=2, model=2), 2),   # DP x TP (4 devices)
])
def test_mesh_engine_matches_reference(mesh_kw, tp_pack):
    params_ref = llama.init_params(CFG, seed=0, tp=1)
    params = llama.init_params(CFG, seed=0, tp=tp_pack)
    mesh = make_mesh(**mesh_kw)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh)
    prompts = _prompts(3)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params_ref, p, 6), (p, o)


def test_mesh_engine_step_block():
    """Fused multi-step decode on the mesh == single-device reference."""
    params_ref = llama.init_params(CFG, seed=1, tp=1)
    params = llama.init_params(CFG, seed=1, tp=2)
    mesh = make_mesh(data=2, model=2)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh)
    prompts = _prompts(2, rng_seed=1)
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=7)
            for i, p in enumerate(prompts)]
    for r in reqs:
        eng.add_request(r)
    while eng.has_work():
        eng.step_block(3)
    for r, p in zip(reqs, prompts):
        assert r.output == _reference_greedy(params_ref, p, 7)


def test_mesh_engine_staggered_admission():
    """Admitting mid-decode on the mesh must not disturb other slots."""
    params_ref = llama.init_params(CFG, seed=2, tp=1)
    params = llama.init_params(CFG, seed=2, tp=4)
    mesh = make_mesh(data=2, model=4)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh)
    p1, p2 = _prompts(2, rng_seed=2)
    r1 = Request(req_id=0, prompt=p1, max_new_tokens=8)
    eng.add_request(r1)
    eng.step()
    eng.step()
    r2 = Request(req_id=1, prompt=p2, max_new_tokens=5)
    eng.add_request(r2)
    while eng.has_work():
        eng.step()
    assert r1.output == _reference_greedy(params_ref, p1, 8)
    assert r2.output == _reference_greedy(params_ref, p2, 5)


def test_mesh_engine_rejections():
    params = llama.init_params(CFG, seed=0, tp=2)
    with pytest.raises(ValueError, match="must divide data"):
        Engine(params, CFG, max_slots=3, mesh=make_mesh(data=2, model=2))
    # r5: seq x paged is now SUPPORTED (per-(data, seq)-shard pools) —
    # the remaining paged-seq constraint is page-count divisibility
    with pytest.raises(ValueError, match="divide the page count"):
        Engine(params, CFG, max_slots=4, paged=True, page_size=32,
               max_seq=32, mesh=make_mesh(model=2, seq=2))
    with pytest.raises(ValueError, match="divide max_seq"):
        Engine(params, CFG, max_slots=4, max_seq=65,
               mesh=make_mesh(model=2, seq=2))


@pytest.mark.parametrize("mesh_kw", [
    dict(model=2, seq=2),
    dict(data=2, model=2, seq=2),
])
def test_mesh_engine_seq_axis_matches_reference(mesh_kw):
    """Long-context serving (VERDICT r3 #3): the engine on a seq>1 mesh —
    S-sharded decode cache, LSE-merge attention, chunked prefill with
    scatter-drop shard straddling — must equal the single-device engine.
    Prompts longer than one S-shard (max_seq=64, seq=2 -> S_loc=32)."""
    params_ref = llama.init_params(CFG, seed=0, tp=1)
    params = llama.init_params(CFG, seed=0, tp=mesh_kw["model"])
    mesh = make_mesh(**mesh_kw)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh, sp_prefill_threshold=1 << 30)
    prompts = _prompts(3, rng_seed=3, lens=(40, 37, 45))
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params_ref, p, 6), (p, o)


@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_mesh_engine_sp_prefill_fast_path(mode):
    """Prompts past the threshold admit their body through the q-sharded
    ring/Ulysses prefill (one dispatch, compute sharded over seq) and the
    tail through the chunked path; outputs must be unchanged."""
    params_ref = llama.init_params(CFG, seed=0, tp=2)
    params = llama.init_params(CFG, seed=0, tp=2)
    mesh = make_mesh(model=2, seq=2)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                 mesh=mesh, sp_prefill_mode=mode,
                 sp_prefill_threshold=16, sp_quantum=8)
    # 43 = 2*8*2 + 11 tail; 32 = exact body, no tail
    prompts = _prompts(2, rng_seed=5, lens=(43, 32))
    outs = eng.generate(prompts, max_new_tokens=5)
    ref = llama.init_params(CFG, seed=0, tp=1)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(ref, p, 5), (p, o)


def test_admission_budget_no_decode_stall():
    """While a long prompt admits chunk-by-chunk, active slots must keep
    producing one token per step (no head-of-line blocking; VERDICT r1 #9).
    """
    params = llama.init_params(CFG, seed=3)
    eng = Engine(params, CFG, max_slots=2, max_seq=128, eos_id=-1)
    eng.PREFILL_CHUNK = 16
    r1 = Request(req_id=0, prompt=[5, 6, 7], max_new_tokens=40)
    eng.add_request(r1)
    eng.step()  # admits r1 (single chunk) — no decode yet this step
    long_prompt = list(np.random.default_rng(3).integers(3, 500, 48))
    r2 = Request(req_id=1, prompt=long_prompt, max_new_tokens=4)
    eng.add_request(r2)
    for k in range(3):  # 3 chunks of 16 — r1 must decode through all
        before = len(r1.output)
        eng.step()
        assert len(r1.output) == before + 1, "decode stalled during admission"
    assert eng.stats["occupancy"] == 2  # r2 now admitted
    # both streams still correct end-to-end
    while eng.has_work():
        eng.step()
    assert r1.output == _reference_greedy(params, [5, 6, 7], 40, max_seq=128)
    assert r2.output == _reference_greedy(params, long_prompt, 4,
                                          max_seq=128)


def test_step_block_horizon_not_clamped_by_short_slot():
    """One nearly-finished request must not collapse the block to 1-step
    dispatches (VERDICT r1 weak #7)."""
    params = llama.init_params(CFG, seed=4)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    p1, p2 = _prompts(2, rng_seed=4)
    r_short = Request(req_id=0, prompt=p1, max_new_tokens=2)
    r_long = Request(req_id=1, prompt=p2, max_new_tokens=10)
    eng.add_request(r_short)
    eng.add_request(r_long)
    steps0 = eng.stats["steps"]
    eng.step_block(8)
    # the block ran 8 fused steps (not clamped to r_short's 1 remaining)
    assert eng.stats["steps"] - steps0 == 8
    assert len(r_short.output) == 2 and r_short.finished
    assert len(r_long.output) == 9
    while eng.has_work():
        eng.step_block(8)
    assert r_short.output == _reference_greedy(params, p1, 2)
    assert r_long.output == _reference_greedy(params, p2, 10)


def test_step_block_device_sampling():
    """step_block samples on device: greedy slots in a mixed batch still
    match the greedy reference; sampled slots respect max_new_tokens."""
    params = llama.init_params(CFG, seed=5)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    p1, p2 = _prompts(2, rng_seed=5)
    r_greedy = Request(req_id=0, prompt=p1, max_new_tokens=6)
    r_sampled = Request(req_id=1, prompt=p2, max_new_tokens=6,
                        sampling=SamplingConfig(temperature=1.5, top_k=50,
                                                top_p=0.9))
    eng.add_request(r_greedy)
    eng.add_request(r_sampled)
    while eng.has_work():
        eng.step_block(3)
    assert r_greedy.output == _reference_greedy(params, p1, 6)
    assert len(r_sampled.output) == 6
    assert all(0 <= t < CFG.vocab_size for t in r_sampled.output)


def test_sample_batch_matches_sample_per_slot():
    """sample_batch (traced per-slot knobs) == sample (static config)."""
    import jax

    from quant_tpu.engine.sampler import sample, sample_batch

    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32) * 3
    key = jax.random.key(7)
    configs = [
        SamplingConfig(),                                  # greedy
        SamplingConfig(temperature=0.8),
        SamplingConfig(temperature=1.2, top_k=10),
        SamplingConfig(temperature=0.5, top_k=20, top_p=0.8),
        SamplingConfig(temperature=1.0, min_p=0.2),
        SamplingConfig(temperature=0.9, top_k=15, top_p=0.9, min_p=0.05),
    ]
    logits = jnp.asarray(rng.standard_normal((len(configs), 128)),
                         jnp.float32) * 3
    temps = jnp.asarray([c.temperature for c in configs], jnp.float32)
    topks = jnp.asarray([c.top_k for c in configs], jnp.int32)
    topps = jnp.asarray([c.top_p for c in configs], jnp.float32)
    minps = jnp.asarray([c.min_p for c in configs], jnp.float32)
    batch = np.asarray(sample_batch(logits, key, temps, topks, topps,
                                    minps))
    for i, c in enumerate(configs):
        expect = np.asarray(sample(logits, key, c))
        assert batch[i] == expect[i], (i, c)


def test_min_p_masks_low_probability_tokens():
    """min_p keeps exactly the tokens with p >= min_p * p_max (on the
    temperature-scaled distribution), per slot; min_p=0 row unchanged."""
    from quant_tpu.engine.sampler import filter_logits

    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32) * 2
    temps = jnp.asarray([1.0, 0.7, 1.3], jnp.float32)
    off = jnp.zeros((3,), jnp.int32)
    onep = jnp.ones((3,), jnp.float32)
    minps = jnp.asarray([0.0, 0.1, 0.5], jnp.float32)
    out = np.asarray(filter_logits(logits, temps, off, onep, minps))
    scaled = np.asarray(logits, np.float64) / np.asarray(temps)[:, None]
    probs = np.exp(scaled - scaled.max(axis=-1, keepdims=True))
    probs /= probs.sum(axis=-1, keepdims=True)
    for i in range(3):
        keep = probs[i] >= float(minps[i]) * probs[i].max() - 1e-12
        assert np.array_equal(np.isfinite(out[i]), keep), i
    # masked rows renormalize to the surviving support only
    assert np.isfinite(out[0]).all()


def test_mesh_engine_int4_kv():
    """kv_bits=4 under a (data, model) mesh: the packed uint8 code
    tensors shard like the int8 ones (kv-heads over model, batch over
    data; the packed Dh/2 dim stays local) — output must equal the
    single-device reference."""
    cfg = dataclasses.replace(CFG, kv_bits=4)
    params_ref = llama.init_params(cfg, seed=5, tp=1)
    params = llama.init_params(cfg, seed=5, tp=2)
    mesh = make_mesh(data=2, model=2)
    eng = Engine(params, cfg, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh)
    prompts = _prompts(3, rng_seed=5)
    outs = eng.generate(prompts, max_new_tokens=6)

    def ref(prompt, max_new):
        cache = llama.init_cache(cfg, batch=1, max_seq=64)
        logits, cache = llama.forward(
            params_ref, jnp.asarray([prompt], jnp.int32), cache, cfg)
        out = [int(jnp.argmax(logits[0, -1]))]
        for _ in range(max_new - 1):
            lg, cache = llama.forward(
                params_ref, jnp.asarray([[out[-1]]], jnp.int32), cache,
                cfg)
            out.append(int(jnp.argmax(lg[0, -1])))
        return out

    for p, o in zip(prompts, outs):
        assert o == ref(p, 6), (p, o)


def test_mesh_engine_moe_expert_axis():
    """MoE continuous batching over an (expert, model) mesh == per-prompt
    single-device reference (SURVEY §2.2 #14: EP through the engine)."""
    moe_cfg = dataclasses.replace(
        CFG, n_experts=4, experts_per_token=2)
    params_ref = llama.init_params(moe_cfg, seed=4, tp=1)
    params = llama.init_params(moe_cfg, seed=4, tp=2)
    mesh = make_mesh(expert=2, model=2)
    eng = Engine(params, moe_cfg, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh)
    prompts = _prompts(3, rng_seed=4)
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


def test_mesh_engine_fsm_and_top_logprobs():
    """Grammar FSM + top_logprobs through the (data, model) mesh engine:
    the FSM tables/states ride the sharded decode programs unchanged."""
    from quant_tpu.engine.grammar import choice_fsm

    params = llama.init_params(CFG, seed=31, tp=2)
    mesh = make_mesh(data=2, model=2)
    eng = Engine(params, CFG, max_slots=4, max_seq=32, eos_id=7,
                 mesh=mesh)
    fsm = choice_fsm([[40, 41, 42], [50]], CFG.vocab_size, 7)
    rc = Request(req_id=0, prompt=[5, 6], max_new_tokens=6, fsm=fsm,
                 sampling=SamplingConfig(temperature=1.0))
    rt = Request(req_id=1, prompt=[8, 9], max_new_tokens=3,
                 top_logprobs=2)
    eng.add_request(rc)
    eng.add_request(rt)
    while eng.has_work():
        eng.step()
    assert rc.output in ([40, 41, 42, 7], [50, 7]), rc.output
    assert len(rt.top_ids) == len(rt.output)
    assert all(ids[0] == t for ids, t in zip(rt.top_ids, rt.output))


def test_mesh_engine_embed_matches_single_device():
    """Engine.embed over a (data, model) mesh equals single-device."""
    params1 = llama.init_params(CFG, seed=41, tp=1)
    eng1 = Engine(params1, CFG, max_slots=2, max_seq=32, eos_id=-1)
    ref = eng1.embed([5, 6, 7, 8])

    params = llama.init_params(CFG, seed=41, tp=2)
    mesh = make_mesh(data=2, model=2)
    eng = Engine(params, CFG, max_slots=4, max_seq=32, eos_id=-1,
                 mesh=mesh)
    got = eng.embed([5, 6, 7, 8])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_block_admit_budget_keeps_decode_running():
    """VERDICT r3 #8: a burst of long prompts must not stall active
    decode slots for their whole multi-chunk prefill — step_block admits
    at most block_admit_chunks prefill dispatches per block."""
    params = llama.init_params(CFG, seed=2)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 block_admit_chunks=1)
    eng.PREFILL_CHUNK = 8
    active = Request(req_id=0, prompt=[3, 4], max_new_tokens=20)
    eng.add_request(active)
    eng.step()
    # burst: two long prompts (each 5 chunks at chunk=8)
    burst = [Request(req_id=i, prompt=list(range(3, 43)),
                     max_new_tokens=4) for i in (1, 2)]
    for r in burst:
        eng.add_request(r)
    out_before = len(active.output)
    eng.step_block(3)
    # the active slot decoded this block even though admissions remain
    assert len(active.output) > out_before
    assert eng.pending or eng._prefilling is not None
    while eng.has_work():
        eng.step_block(3)
    for r in burst:
        assert len(r.output) == 4
    ref = _reference_greedy(params, burst[0].prompt, 4)
    assert burst[0].output == ref


def test_spec_on_seq_mesh_matches_reference():
    """n-gram AND draft-model speculation on a (model, seq) mesh: the
    verify program's T=gamma+1 forward rides the same seq_axis machinery
    as chunked prefill (scatter-drop KV writes, LSE-merge attention), so
    greedy outputs stay bit-equal to the single-device engine."""
    from quant_tpu.engine.spec import DraftModelProposer

    params_ref = llama.init_params(CFG, seed=0, tp=1)
    params = llama.init_params(CFG, seed=0, tp=2)
    mesh = make_mesh(model=2, seq=2)
    prompts = [_prompts(1, rng_seed=7, lens=(40,))[0], [5, 6, 5, 6, 5, 6]]

    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                 mesh=mesh, spec_gamma=2, sp_prefill_threshold=1 << 30)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params_ref, p, 6), (p, o)

    prop = DraftModelProposer(llama.init_params(CFG, seed=9, tp=1), CFG,
                              gamma=2, max_slots=2, max_seq=64)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                 mesh=mesh, spec_gamma=2, spec_proposer=prop,
                 sp_prefill_threshold=1 << 30)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params_ref, p, 6), (p, o)
