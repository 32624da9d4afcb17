"""Continuous-batching engine vs per-prompt reference decode (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.engine import Engine, Request, SamplingConfig
from quant_tpu.models import PRESETS, llama

CFG = PRESETS["test-tiny"]


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


def test_generate_matches_reference():
    params = llama.init_params(CFG, seed=0)
    rng = np.random.default_rng(0)
    prompts = [list(map(int, rng.integers(3, CFG.vocab_size, n)))
               for n in (5, 11, 3)]
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1)
    outs = eng.generate(prompts, max_new_tokens=6)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params, p, 6), (p, o)


def test_more_requests_than_slots():
    params = llama.init_params(CFG, seed=1)
    rng = np.random.default_rng(1)
    prompts = [list(map(int, rng.integers(3, CFG.vocab_size, 4)))
               for _ in range(5)]
    eng = Engine(params, CFG, max_slots=2, max_seq=32, eos_id=-1)
    outs = eng.generate(prompts, max_new_tokens=4)
    assert all(len(o) == 4 for o in outs)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params, p, 4, max_seq=32)


def test_staggered_admission():
    """Admitting mid-decode must not disturb other slots' streams."""
    params = llama.init_params(CFG, seed=2)
    rng = np.random.default_rng(2)
    p1 = list(map(int, rng.integers(3, CFG.vocab_size, 6)))
    p2 = list(map(int, rng.integers(3, CFG.vocab_size, 4)))
    eng = Engine(params, CFG, max_slots=2, max_seq=32, eos_id=-1)
    r1 = Request(req_id=0, prompt=p1, max_new_tokens=8)
    eng.add_request(r1)
    eng.step()
    eng.step()  # r1 decodes alone for 2 steps
    r2 = Request(req_id=1, prompt=p2, max_new_tokens=5)
    eng.add_request(r2)
    while eng.has_work():
        eng.step()
    assert r1.output == _reference_greedy(params, p1, 8, max_seq=32)
    assert r2.output == _reference_greedy(params, p2, 5, max_seq=32)


def test_capacity_rejection():
    params = llama.init_params(CFG, seed=0)
    eng = Engine(params, CFG, max_slots=1, max_seq=16, eos_id=-1)
    import pytest
    with pytest.raises(ValueError, match="exceeds max_seq"):
        eng.add_request(Request(req_id=0, prompt=[1] * 10, max_new_tokens=10))


def test_eos_stops_early():
    params = llama.init_params(CFG, seed=3)
    # Find what token gets produced, then use it as the EOS id.
    probe = Engine(params, CFG, max_slots=1, max_seq=32, eos_id=-1)
    out = probe.generate([[5, 6, 7]], max_new_tokens=4)[0]
    eng = Engine(params, CFG, max_slots=1, max_seq=32, eos_id=out[1])
    out2 = eng.generate([[5, 6, 7]], max_new_tokens=10)[0]
    assert out2 == out[:2]


def test_stats():
    params = llama.init_params(CFG, seed=0)
    eng = Engine(params, CFG, max_slots=2, max_seq=32, eos_id=-1)
    eng.add_request(Request(req_id=0, prompt=[1, 2], max_new_tokens=3))
    eng.step()
    s = eng.stats
    assert s["occupancy"] == 1 and s["steps"] == 1


def test_step_block_matches_stepwise():
    params = llama.init_params(CFG, seed=5)
    rng = np.random.default_rng(5)
    prompts = [list(map(int, rng.integers(3, CFG.vocab_size, n)))
               for n in (4, 7)]
    ref = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    ref_out = ref.generate(prompts, max_new_tokens=9)

    eng2 = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    reqs = [Request(req_id=i, prompt=p, max_new_tokens=9)
            for i, p in enumerate(prompts)]
    for r in reqs:
        eng2.add_request(r)
    while eng2.has_work():
        eng2.step_block(4)
    for r, expect in zip(reqs, ref_out):
        assert r.output == expect, (r.output, expect)


def test_chunked_prefill_long_prompt():
    """Prompts longer than PREFILL_CHUNK stream through chunks and match
    the reference decode exactly."""
    params = llama.init_params(CFG, seed=6)
    rng = np.random.default_rng(6)
    prompt = list(map(int, rng.integers(3, CFG.vocab_size, 40)))
    eng = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    eng.PREFILL_CHUNK = 16  # force chunking
    out = eng.generate([prompt], max_new_tokens=5)[0]
    assert out == _reference_greedy(params, prompt, 5)


def test_mixed_sampling_configs():
    """Slots with different sampling configs each use their own."""
    from quant_tpu.engine import SamplingConfig

    params = llama.init_params(CFG, seed=7)
    eng = Engine(params, CFG, max_slots=4, max_seq=32, eos_id=-1)
    reqs = [
        Request(req_id=0, prompt=[5, 6], max_new_tokens=4),  # greedy
        Request(req_id=1, prompt=[5, 6], max_new_tokens=4,
                sampling=SamplingConfig(temperature=5.0, top_k=50)),
        Request(req_id=2, prompt=[5, 6], max_new_tokens=4,
                sampling=SamplingConfig(temperature=0.7, top_p=0.9)),
        Request(req_id=3, prompt=[5, 6], max_new_tokens=4,
                sampling=SamplingConfig(temperature=1.0, min_p=0.3)),
    ]
    for r in reqs:
        eng.add_request(r)
    while eng.has_work():
        eng.step()
    assert all(len(r.output) == 4 for r in reqs)
    # greedy slot must equal the pure-greedy reference
    assert reqs[0].output == _reference_greedy(params, [5, 6], 4,
                                               max_seq=32)


def test_finish_during_admission_is_reported():
    """A request that completes inside _admit (max_new_tokens=1) must still
    come back from step() — the server blocks forever otherwise (ADVICE r1).
    """
    params = llama.init_params(CFG, seed=9)
    eng = Engine(params, CFG, max_slots=2, max_seq=32, eos_id=-1)
    r = Request(req_id=0, prompt=[5, 6, 7], max_new_tokens=1)
    eng.add_request(r)
    finished = eng.step()
    assert r.finished and r in finished

    # same through step_block, including with no other active slots
    eng2 = Engine(params, CFG, max_slots=2, max_seq=32, eos_id=-1)
    r2 = Request(req_id=0, prompt=[5, 6, 7], max_new_tokens=1)
    eng2.add_request(r2)
    finished2 = eng2.step_block(4)
    assert r2.finished and r2 in finished2


def test_cancel():
    params = llama.init_params(CFG, seed=8)
    eng = Engine(params, CFG, max_slots=1, max_seq=32, eos_id=-1)
    r1 = Request(req_id=0, prompt=[1, 2], max_new_tokens=20)
    r2 = Request(req_id=1, prompt=[3, 4], max_new_tokens=5)
    eng.add_request(r1)
    eng.add_request(r2)  # waits (1 slot)
    eng.step()
    assert eng.cancel(1)            # cancel while pending
    eng.step()
    assert eng.cancel(0)            # cancel while active
    assert not eng.has_work()
    assert not eng.cancel(99)


def test_generate_matches_reference_int4_kv():
    """kv_bits=4 through the whole engine (prefill insert + decode):
    continuous batching must equal the per-prompt reference exactly."""
    import dataclasses

    cfg = dataclasses.replace(CFG, kv_bits=4)
    params = llama.init_params(cfg, seed=4)
    rng = np.random.default_rng(4)
    prompts = [list(map(int, rng.integers(3, cfg.vocab_size, n)))
               for n in (5, 11, 3)]
    eng = Engine(params, cfg, max_slots=4, max_seq=64, eos_id=-1)
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


def test_deadline_expires_pending_and_active():
    import time as _t

    from quant_tpu.engine import QueueFullError  # noqa: F401 (API)

    params = llama.init_params(CFG, seed=6)
    eng = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    # r1 occupies the only slot; r2 waits pending with an already-passed
    # deadline; r3 has no deadline
    r1 = Request(req_id=0, prompt=[1, 2, 3], max_new_tokens=30,
                 deadline=_t.monotonic() + 0.5)
    r2 = Request(req_id=1, prompt=[4, 5], max_new_tokens=4,
                 deadline=_t.monotonic() - 1)
    r3 = Request(req_id=2, prompt=[6, 7], max_new_tokens=2)
    for r in (r1, r2, r3):
        eng.add_request(r)
    finished = []
    t0 = _t.monotonic()
    while eng.has_work() and _t.monotonic() - t0 < 60:
        finished += eng.step()
    assert r2.timed_out and r2.finished and r2.output == []
    assert r1.finished
    # r1 either finished naturally (fast machine) or timed out mid-decode
    # with partial output
    if r1.timed_out:
        assert 0 <= len(r1.output) < 30
    assert r3.finished and not r3.timed_out and len(r3.output) == 2
    ids = {r.req_id for r in finished}
    assert ids == {0, 1, 2}


def test_queue_cap_raises():
    from quant_tpu.engine import QueueFullError

    params = llama.init_params(CFG, seed=7)
    eng = Engine(params, CFG, max_slots=1, max_seq=32, eos_id=-1,
                 max_pending=2)
    for i in range(2):
        eng.add_request(Request(req_id=i, prompt=[1, 2], max_new_tokens=2))
    import pytest as _pytest
    with _pytest.raises(QueueFullError):
        eng.add_request(Request(req_id=9, prompt=[1], max_new_tokens=1))


def test_per_request_stop_ids():
    """A request-level stop token ends ITS stream (inclusive) without
    affecting slots that don't list it."""
    params = llama.init_params(CFG, seed=8)
    base = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    full = base.generate([[4, 5, 6]], max_new_tokens=10)[0]
    stop = full[3]
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    r1 = Request(req_id=0, prompt=[4, 5, 6], max_new_tokens=10,
                 stop_ids=(stop,))
    r2 = Request(req_id=1, prompt=[4, 5, 6], max_new_tokens=10)
    eng.add_request(r1)
    eng.add_request(r2)
    while eng.has_work():
        eng.step()
    k = full.index(stop)
    assert r1.output == full[:k + 1]
    assert r2.output == full


def test_logprobs_match_reference():
    """Every commit path (admission token, step, step_block, spec verify)
    must record log p(token) of the raw model distribution."""
    params = llama.init_params(CFG, seed=9)

    def ref_logprobs(prompt, out):
        cache = llama.init_cache(CFG, batch=1, max_seq=64)
        toks = jnp.asarray([prompt], jnp.int32)
        logits, cache = llama.forward(params, toks, cache, CFG)
        lps = []
        last = logits[0, -1]
        for tok in out:
            lp = jax.nn.log_softmax(last.astype(jnp.float32))[tok]
            lps.append(float(lp))
            lg, cache = llama.forward(
                params, jnp.asarray([[tok]], jnp.int32), cache, CFG)
            last = lg[0, -1]
        return lps

    prompt = [4, 5, 6, 4, 5, 6]
    for kw in ({}, {"spec_gamma": 3}):
        eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1, **kw)
        r = Request(req_id=0, prompt=prompt, max_new_tokens=7)
        eng.add_request(r)
        while eng.has_work():
            eng.step()
        assert len(r.logprobs) == len(r.output) == 7
        # bf16 activations + different batch shapes (engine B=slots vs
        # reference B=1) shift reductions by O(1e-3)
        np.testing.assert_allclose(
            r.logprobs, ref_logprobs(prompt, r.output),
            rtol=2e-3, atol=5e-3)

    # step_block path (used by generate when spec is off)
    eng = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    r = Request(req_id=0, prompt=prompt, max_new_tokens=7)
    eng.add_request(r)
    while eng.has_work():
        eng.step_block(4)
    assert len(r.logprobs) == 7
    np.testing.assert_allclose(
        r.logprobs, ref_logprobs(prompt, r.output), rtol=2e-3, atol=5e-3)
    assert all(lp <= 0.0 for lp in r.logprobs)


def _np_penalize(lg, counts, sc):
    """Host-side penalty math (float32, matching the device formula)."""
    lg = lg.astype(np.float32).copy()
    seen = counts > 0
    r = np.float32(sc.repetition_penalty)
    lg[seen] = np.where(lg[seen] > 0, lg[seen] / r, lg[seen] * r)
    lg -= (np.float32(sc.frequency_penalty) * counts.astype(np.float32)
           + np.float32(sc.presence_penalty) * seen.astype(np.float32))
    return lg


def _reference_greedy_penalized(params, prompt, max_new, sc, max_seq=64):
    """Greedy decode with token-history penalties, replayed on host."""
    counts = np.zeros(CFG.vocab_size, np.int64)
    for t in prompt:
        counts[t] += 1
    cache = llama.init_cache(CFG, batch=1, max_seq=max_seq)
    logits, cache = llama.forward(
        params, jnp.asarray([prompt], jnp.int32), cache, CFG)
    lg = np.asarray(logits[0, -1], np.float32)
    out = []
    for step in range(max_new):
        tok = int(np.argmax(_np_penalize(lg, counts, sc)))
        out.append(tok)
        counts[tok] += 1
        if step < max_new - 1:
            logits, cache = llama.forward(
                params, jnp.asarray([[tok]], jnp.int32), cache, CFG)
            lg = np.asarray(logits[0, -1], np.float32)
    return out


def test_apply_penalties_formula():
    from quant_tpu.engine.sampler import apply_penalties

    rng = np.random.default_rng(21)
    lg = rng.standard_normal((3, 32)).astype(np.float32) * 2
    counts = rng.integers(0, 3, (3, 32)).astype(np.int32)
    reps = np.asarray([1.0, 1.5, 0.8], np.float32)   # <1 = anti-penalty
    freqs = np.asarray([0.0, 0.3, 0.0], np.float32)
    press = np.asarray([0.0, 0.0, 1.1], np.float32)
    got = np.asarray(apply_penalties(
        jnp.asarray(lg), jnp.asarray(counts), jnp.asarray(reps),
        jnp.asarray(freqs), jnp.asarray(press)))
    for i in range(3):
        sc = SamplingConfig(repetition_penalty=float(reps[i]),
                            frequency_penalty=float(freqs[i]),
                            presence_penalty=float(press[i]))
        np.testing.assert_allclose(
            got[i], _np_penalize(lg[i], counts[i], sc), rtol=1e-6)
    # row 0 has no penalties enabled → identity
    np.testing.assert_array_equal(got[0], lg[0])


def test_engine_penalties_match_reference():
    """Greedy + penalties through step() AND step_block() must equal a
    host replay that recomputes the penalized argmax each step (counts
    cover prompt + committed output)."""
    params = llama.init_params(CFG, seed=11)
    rng = np.random.default_rng(11)
    prompt = list(map(int, rng.integers(3, CFG.vocab_size, 7)))
    sc = SamplingConfig(repetition_penalty=1.4, frequency_penalty=0.2,
                        presence_penalty=0.4)
    expect = _reference_greedy_penalized(params, prompt, 8, sc)
    # penalties must actually change the stream, or this test is vacuous
    assert expect != _reference_greedy(params, prompt, 8)

    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    r = Request(req_id=0, prompt=list(prompt), max_new_tokens=8,
                sampling=sc)
    eng.add_request(r)
    while eng.has_work():
        eng.step()
    assert r.output == expect

    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    r = Request(req_id=0, prompt=list(prompt), max_new_tokens=8,
                sampling=sc)
    eng.add_request(r)
    while eng.has_work():
        eng.step_block(3)
    assert r.output == expect


def test_engine_penalties_with_speculation_bitparity():
    """Penalized greedy through the speculative verify program must stay
    bit-identical to plain penalized decode (exact in-window counts)."""
    params = llama.init_params(CFG, seed=12)
    rng = np.random.default_rng(12)
    # repetitive prompt so the n-gram proposer actually proposes
    base = list(map(int, rng.integers(3, CFG.vocab_size, 4)))
    prompt = base + base + base
    sc = SamplingConfig(repetition_penalty=1.3, presence_penalty=0.2)
    expect = _reference_greedy_penalized(params, prompt, 8, sc)

    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                 spec_gamma=2)
    r = Request(req_id=0, prompt=list(prompt), max_new_tokens=8,
                sampling=sc)
    eng.add_request(r)
    while eng.has_work():
        eng.step()
    assert r.output == expect


def test_penalized_admission_under_load_counts_exact():
    """A penalized long prompt admitted chunk-by-chunk while another slot
    keeps decoding must end with EXACT token-history counts. Regression:
    the decode program scatter-adds +1 to every slot row per dispatch
    (including a mid-chunked-prefill slot, from its stale last_token), so
    per-chunk device accumulation corrupted the row under load; the row
    is now written once, host-built, at admission completion."""
    params = llama.init_params(CFG, seed=15)
    rng = np.random.default_rng(15)
    prompt_b = list(map(int, rng.integers(3, CFG.vocab_size, 21)))
    sc = SamplingConfig(repetition_penalty=1.4, frequency_penalty=0.2,
                        presence_penalty=0.4)
    expect = _reference_greedy_penalized(params, prompt_b, 8, sc)
    assert expect != _reference_greedy(params, prompt_b, 8)

    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    eng.PREFILL_CHUNK = 8  # force multi-chunk admission on a tiny prompt
    ra = Request(req_id=0, prompt=[5, 6, 7], max_new_tokens=30,
                 sampling=SamplingConfig())
    eng.add_request(ra)
    eng.step()  # admit A; it decodes during every later step
    assert any(s is ra for s in eng.slots)
    rb = Request(req_id=1, prompt=list(prompt_b), max_new_tokens=8,
                 sampling=sc)
    eng.add_request(rb)
    while not rb.finished:
        eng.step()  # B's 3 admission chunks interleave with A's decodes
    assert rb.output == expect


def test_presence_penalty_forbids_repeats():
    """A huge presence penalty makes sampled output all-distinct."""
    params = llama.init_params(CFG, seed=13)
    eng = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    r = Request(req_id=0, prompt=[5, 6, 7], max_new_tokens=12,
                sampling=SamplingConfig(temperature=1.0,
                                        presence_penalty=1e9))
    eng.add_request(r)
    while eng.has_work():
        eng.step()
    seen = set(r.prompt)
    for t in r.output:
        assert t not in seen, (t, r.output)
        seen.add(t)


def test_logit_bias_bans_and_forces():
    """-1e9 bias bans a token from every step (greedy + block paths);
    +1e9 forces one."""
    params = llama.init_params(CFG, seed=14)
    rng = np.random.default_rng(14)
    prompt = list(map(int, rng.integers(3, CFG.vocab_size, 5)))
    plain = _reference_greedy(params, prompt, 6)
    banned = plain[0]

    sc = SamplingConfig(logit_bias=((banned, -1e9),))
    eng = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    r = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                sampling=sc)
    eng.add_request(r)
    while eng.has_work():
        eng.step()
    assert banned not in r.output and len(r.output) == 6
    assert r.output != plain

    # step_block path agrees with step()
    eng2 = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    r2 = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                 sampling=sc)
    eng2.add_request(r2)
    while eng2.has_work():
        eng2.step_block(3)
    assert r2.output == r.output

    # forcing: +1e9 on one token makes every output that token
    forced = (banned + 7) % CFG.vocab_size
    eng3 = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    r3 = Request(req_id=0, prompt=list(prompt), max_new_tokens=4,
                 sampling=SamplingConfig(logit_bias=((forced, 1e9),)))
    eng3.add_request(r3)
    while eng3.has_work():
        eng3.step()
    assert r3.output == [forced] * 4


def test_logit_bias_spec_bitparity():
    """Biased greedy through the speculative verify program equals the
    plain biased decode stream."""
    params = llama.init_params(CFG, seed=15)
    rng = np.random.default_rng(15)
    base = list(map(int, rng.integers(3, CFG.vocab_size, 4)))
    prompt = base + base + base
    plain = _reference_greedy(params, prompt, 6)
    sc = SamplingConfig(logit_bias=((plain[0], -1e9), (plain[1], -1e9)))

    def run(**kw):
        eng = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1,
                     **kw)
        r = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                    sampling=sc)
        eng.add_request(r)
        while eng.has_work():
            eng.step()
        return r.output

    assert run(spec_gamma=2) == run()


def test_latency_percentile_stats():
    """Finished requests feed rolling TTFT/TPOT percentiles in stats."""
    params = llama.init_params(CFG, seed=17)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1)
    for k in range(3):
        eng.add_request(Request(req_id=k, prompt=[5 + k, 6, 7],
                                max_new_tokens=4))
    while eng.has_work():
        eng.step()
    st = eng.stats
    for key in ("ttft_p50_ms", "ttft_p99_ms", "tpot_p50_ms",
                "tpot_p90_ms"):
        assert key in st and st[key] > 0, (key, st)
    # and per-request accessors agree in spirit
    assert st["ttft_p50_ms"] >= 0 and st["tpot_p50_ms"] >= 0


def test_loadgen_poisson():
    """The serving load generator completes all requests and reports
    throughput + latency percentiles."""
    from quant_tpu.engine.loadgen import LoadSpec, run_load

    params = llama.init_params(CFG, seed=18)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1)
    rep = run_load(eng, LoadSpec(n_requests=8, rate=100.0,
                                 prompt_len=(3, 8), max_new=(2, 6),
                                 seed=18))
    assert rep["requests"] == 8
    assert rep["output_tokens"] >= 8 * 2
    assert rep["tokens_per_s"] > 0
    assert "ttft_p50_ms" in rep and "tpot_p50_ms" in rep

    # block-dispatch mode drains too
    eng2 = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1)
    rep2 = run_load(eng2, LoadSpec(n_requests=6, rate=100.0,
                                   prompt_len=(3, 8), max_new=(2, 6),
                                   seed=19, block=4))
    assert rep2["requests"] == 6


def test_top_logprobs_all_paths():
    """top_logprobs=k returns per-position top-k (ids, raw logprobs) on
    every dispatch path; for greedy requests the top-1 entry IS the
    committed token with its recorded logprob."""
    params = llama.init_params(CFG, seed=20)
    rng = np.random.default_rng(20)
    prompt = list(map(int, rng.integers(3, CFG.vocab_size, 6)))

    def run(spec_gamma=0, block=0):
        eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                     spec_gamma=spec_gamma)
        r = Request(req_id=0, prompt=list(prompt), max_new_tokens=6,
                    top_logprobs=3)
        eng.add_request(r)
        while eng.has_work():
            eng.step_block(block) if block else eng.step()
        return r

    for r in (run(), run(block=3), run(spec_gamma=2)):
        assert len(r.top_ids) == len(r.output) == 6
        for j in range(6):
            assert len(r.top_ids[j]) == 3
            assert r.top_ids[j][0] == r.output[j]          # greedy top-1
            np.testing.assert_allclose(r.top_lps[j][0], r.logprobs[j],
                                       rtol=1e-4, atol=1e-5)
            assert r.top_lps[j] == sorted(r.top_lps[j], reverse=True)

    import pytest
    eng = Engine(params, CFG, max_slots=1, max_seq=32, eos_id=-1)
    with pytest.raises(ValueError, match="top_logprobs"):
        eng.add_request(Request(req_id=0, prompt=[1], max_new_tokens=1,
                                top_logprobs=21))


def test_seeded_sampling_batching_invariant():
    """A sampled request's stream is a pure function of (seed, prompt,
    config): identical whether it runs alone, co-batched with other
    traffic, through step() or step_block(), and across engines."""
    params = llama.init_params(CFG, seed=22)
    rng = np.random.default_rng(22)
    prompt = list(map(int, rng.integers(3, CFG.vocab_size, 5)))
    sc = SamplingConfig(temperature=1.0, top_p=0.95)

    def run(co_batch, block, seed=1234):
        eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1)
        r = Request(req_id=7, prompt=list(prompt), max_new_tokens=8,
                    sampling=sc, seed=seed)
        eng.add_request(r)
        for k in range(co_batch):
            eng.add_request(Request(
                req_id=100 + k,
                prompt=list(map(int, rng.integers(3, CFG.vocab_size, 4))),
                max_new_tokens=8, sampling=SamplingConfig(temperature=0.7),
                seed=k))
        while eng.has_work():
            eng.step_block(3) if block else eng.step()
        return r.output

    alone = run(0, False)
    assert run(2, False) == alone          # co-batching invariant
    assert run(0, True) == alone           # dispatch-shape invariant
    assert run(3, True) == alone
    assert run(0, False, seed=99) != alone  # the seed matters


def test_seeded_sampling_survives_preemption():
    """A preempted (paged, oversubscribed) seeded request resumes the
    EXACT stream it would have produced uninterrupted (key replay by
    recorded draw count)."""
    import dataclasses as _dc

    cfg = _dc.replace(CFG)
    params = llama.init_params(cfg, seed=23)
    sc = SamplingConfig(temperature=1.0)
    prompt = [5, 6, 7, 8]

    ref_eng = Engine(params, cfg, max_slots=1, max_seq=64, eos_id=-1,
                     paged=True, page_size=16)
    ref = Request(req_id=0, prompt=list(prompt), max_new_tokens=12,
                  sampling=sc, seed=77)
    ref_eng.add_request(ref)
    while ref_eng.has_work():
        ref_eng.step()

    # tiny pool (2 usable pages): B's 2-page prompt preempts A
    # mid-generation; A later re-admits and must resume exactly
    eng = Engine(params, cfg, max_slots=2, max_seq=64, eos_id=-1,
                 paged=True, page_size=16, n_pages=3)
    a = Request(req_id=0, prompt=list(prompt), max_new_tokens=12,
                sampling=sc, seed=77)
    b_prompt = list(np.random.default_rng(5).integers(3, cfg.vocab_size,
                                                      20))
    b = Request(req_id=1, prompt=[int(t) for t in b_prompt],
                max_new_tokens=4, sampling=SamplingConfig(), seed=5)
    eng.add_request(a)
    for _ in range(3):
        eng.step()
    eng.add_request(b)
    a_preempted = False
    while eng.has_work():
        eng.step()
        a_preempted = a_preempted or (
            not a.finished and all(s is not a for s in eng.slots))
    assert a_preempted, "scenario must actually preempt A"
    assert a.output == ref.output, (a.output, ref.output)
