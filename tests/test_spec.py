"""Speculative decoding: greedy-equivalence, sampled-distribution and
proposer unit tests (CPU).

The acceptance rule guarantees the OUTPUT STREAM equals plain greedy
decoding bit-for-bit for ANY proposer — the tests pin that across the
contiguous cache, the paged pool, and a (data, model) mesh, and separately
check that a self-repetitive prompt actually exercises the accept path
(spec_accepted > 0), so the equality isn't vacuous.
"""

import numpy as np
import pytest

from quant_tpu.engine import Engine, Request, SamplingConfig
from quant_tpu.engine.spec import NgramProposer
from quant_tpu.models import PRESETS, llama
from tests.test_engine import _reference_greedy

CFG = PRESETS["test-tiny"]


# ── proposer unit tests ──────────────────────────────────────────────────


def test_ngram_proposes_continuation():
    p = NgramProposer(gamma=3, max_ngram=2)
    # ... 7 8 9 | 5 6 | ... | 5 6 -> propose 7 8 9 (after most recent 5 6)
    stream = [5, 6, 7, 8, 9, 1, 2, 5, 6]
    assert p.propose(stream) == [7, 8, 9]


def test_ngram_prefers_most_recent_match():
    p = NgramProposer(gamma=2, max_ngram=1)
    stream = [5, 1, 5, 2, 5]       # last occurrence of 5 before end is i=2
    assert p.propose(stream) == [2, 5]


def test_ngram_longest_first():
    p = NgramProposer(gamma=2, max_ngram=3)
    # suffix 3-gram [1 2 3] matches at 0 -> continuation [9 9]; a 1-gram
    # match of [3] alone would give [9, 9] too but via position 2 — make
    # them differ to prove 3-gram wins
    stream = [1, 2, 3, 9, 8, 3, 7, 7, 1, 2, 3]
    assert p.propose(stream) == [9, 8]


def test_ngram_no_match():
    p = NgramProposer(gamma=4)
    assert p.propose([1, 2, 3, 4]) == []
    assert p.propose([7]) == []
    assert p.propose([]) == []


def test_ngram_gamma_caps_length():
    p = NgramProposer(gamma=2, max_ngram=1)
    assert len(p.propose([1, 2, 3, 4, 5, 1])) <= 2


# ── engine equivalence ───────────────────────────────────────────────────


def _repetitive_prompts(rng, n_prompts=3):
    """Prompts with internal repetition so n-gram drafting fires."""
    out = []
    for _ in range(n_prompts):
        motif = list(map(int, rng.integers(3, CFG.vocab_size, 4)))
        out.append(motif + motif + motif[:2])
    return out


@pytest.mark.parametrize("engine_kw", [
    {},                                                # contiguous cache
    {"paged": True, "page_size": 8},                   # paged pool
], ids=["contiguous", "paged"])
def test_spec_matches_plain_greedy(engine_kw):
    params = llama.init_params(CFG, seed=11)
    rng = np.random.default_rng(11)
    prompts = _repetitive_prompts(rng)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 spec_gamma=4, **engine_kw)
    outs = eng.generate(prompts, max_new_tokens=10)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params, p, 10), (p, o)


def test_spec_accepts_on_repetitive_stream():
    """The equality test must not pass vacuously — on a repetitive prompt
    the proposer must land accepted drafts (multi-token commits)."""
    params = llama.init_params(CFG, seed=12)
    motif = [5, 6, 7, 8]
    prompt = motif * 5
    eng = Engine(params, CFG, max_slots=1, max_seq=128, eos_id=-1,
                 spec_gamma=4)
    eng.generate([prompt], max_new_tokens=16)
    s = eng.stats
    assert s["spec_proposed"] > 0
    assert s["spec_accepted"] > 0, s
    assert s["spec_tokens_per_slot_step"] > 1.0, s


def test_spec_mesh_matches_plain_greedy():
    from quant_tpu.parallel import make_mesh

    params_ref = llama.init_params(CFG, seed=13, tp=1)
    params = llama.init_params(CFG, seed=13, tp=2)
    rng = np.random.default_rng(13)
    prompts = _repetitive_prompts(rng, n_prompts=4)
    mesh = make_mesh(data=2, model=2)
    eng = Engine(params, CFG, max_slots=4, max_seq=64, eos_id=-1,
                 mesh=mesh, spec_gamma=3)
    outs = eng.generate(prompts, max_new_tokens=8)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params_ref, p, 8), (p, o)


def test_spec_eos_and_max_new():
    """EOS inside an accepted run stops the stream exactly there; a
    max_new_tokens=1 request commits exactly one token."""
    params = llama.init_params(CFG, seed=14)
    probe = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1)
    out = probe.generate([[5, 6, 7, 5, 6, 7]], max_new_tokens=6)[0]
    eos = out[2]
    eng = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=eos,
                 spec_gamma=4)
    out2 = eng.generate([[5, 6, 7, 5, 6, 7]], max_new_tokens=20)[0]
    assert out2 == out[:3]

    eng1 = Engine(params, CFG, max_slots=1, max_seq=64, eos_id=-1,
                  spec_gamma=4)
    r = Request(req_id=0, prompt=[5, 6, 7], max_new_tokens=1)
    eng1.add_request(r)
    fin = []
    while eng1.has_work():
        fin += eng1.step()
    assert r.finished and r in fin and len(r.output) == 1


def test_spec_mixed_batch_greedy_stays_exact():
    """Sampled slots run rejection sampling INSIDE the verify program;
    a greedy slot sharing the batch must still follow the exact argmax
    chain (its one-hot target distribution makes the rejection rule
    deterministic)."""
    params = llama.init_params(CFG, seed=15)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=-1,
                 spec_gamma=4)
    r_g = Request(req_id=0, prompt=[5, 6, 5, 6, 5], max_new_tokens=6)
    r_s = Request(req_id=1, prompt=[7, 8], max_new_tokens=6,
                  sampling=SamplingConfig(temperature=1.3, top_k=8))
    eng.add_request(r_g)
    eng.add_request(r_s)
    while eng.has_work():
        eng.step()
    assert len(r_s.output) == 6
    assert all(0 <= t < CFG.vocab_size for t in r_s.output)
    assert r_g.output == _reference_greedy(params, r_g.prompt, 6)


def test_spec_commit_marginal_distribution():
    """Delta-proposal rejection sampling must reproduce the target
    distribution EXACTLY at the first commit position:
    P(out0 = d) = p(d) [accept] and P(out0 = x != d) = (1-p(d)) *
    p(x)/(1-p(d)) = p(x). Checked empirically over many keys, with and
    without top-k filtering, plus a greedy (one-hot) slot in the batch."""
    import jax
    import jax.numpy as jnp

    from quant_tpu.engine.sampler import filter_logits, spec_commit

    rng = np.random.default_rng(0)
    v, g = 8, 2
    logits = jnp.asarray(rng.standard_normal((3, g + 1, v)) * 1.5,
                         jnp.float32)
    tokens = jnp.asarray([[1, 2, 3], [4, 0, 1], [2, 5, 6]], jnp.int32)
    temps = jnp.asarray([1.0, 0.7, 0.0], jnp.float32)
    topks = jnp.asarray([0, 4, 0], jnp.int32)
    topps = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)

    n = 20000
    keys = jax.random.split(jax.random.key(1), n)
    outs, accs = jax.vmap(
        lambda k: spec_commit(logits, tokens, k, temps, topks, topps)
    )(keys)
    outs = np.asarray(outs)  # [n, 3, g+1]

    target = np.asarray(jax.nn.softmax(
        filter_logits(logits, temps, topks, topps), axis=-1))
    for b in range(2):  # sampled slots
        emp = np.bincount(outs[:, b, 0], minlength=v) / n
        tv = 0.5 * np.abs(emp - target[b, 0]).sum()
        assert tv < 0.02, (b, tv, emp, target[b, 0])
    # greedy slot: position-0 commit is always the argmax
    am = int(np.argmax(np.asarray(logits)[2, 0]))
    assert np.all(outs[:, 2, 0] == am)
    # and its acceptance is deterministic: same acc for every key
    assert np.unique(np.asarray(accs)[:, 2]).size == 1


def test_spec_near_max_seq_boundary():
    """Verify writes past max_seq are dropped; commits are capped so the
    stream stays exact right up to the capacity finish."""
    params = llama.init_params(CFG, seed=16)
    prompt = [5, 6, 7, 5, 6, 7, 5, 6]
    max_seq = 16
    ref = Engine(params, CFG, max_slots=1, max_seq=max_seq, eos_id=-1)
    expect = ref.generate([prompt], max_new_tokens=max_seq - len(prompt))[0]
    eng = Engine(params, CFG, max_slots=1, max_seq=max_seq, eos_id=-1,
                 spec_gamma=4)
    out = eng.generate([prompt], max_new_tokens=max_seq - len(prompt))[0]
    assert out == expect


# ── draft-model proposer ─────────────────────────────────────────────────


def _draft_engine(params, draft_params, gamma=4, **kw):
    from quant_tpu.engine.spec import DraftModelProposer

    prop = DraftModelProposer(draft_params, CFG, gamma=gamma,
                              max_slots=kw.get("max_slots", 4),
                              max_seq=kw.get("max_seq", 64))
    return Engine(params, CFG, eos_id=-1, spec_gamma=gamma,
                  spec_proposer=prop, **kw)


def test_draft_model_matches_plain_greedy():
    """A draft model with DIFFERENT weights: output must still equal plain
    greedy (acceptance only affects speed)."""
    params = llama.init_params(CFG, seed=41)
    draft = llama.init_params(CFG, seed=99)
    rng = np.random.default_rng(41)
    prompts = [list(map(int, rng.integers(3, CFG.vocab_size, n)))
               for n in (5, 11, 3)]
    eng = _draft_engine(params, draft, max_slots=4, max_seq=64)
    outs = eng.generate(prompts, max_new_tokens=10)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params, p, 10), (p, o)


def test_draft_model_identical_weights_accepts_everything():
    """Draft == target: the draft's greedy chain IS the target's greedy
    chain, so every proposal must be accepted."""
    params = llama.init_params(CFG, seed=42)
    eng = _draft_engine(params, params, gamma=4, max_slots=2, max_seq=64)
    prompts = [[5, 6, 7], [9, 8, 7, 6]]
    outs = eng.generate(prompts, max_new_tokens=11)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params, p, 11), (p, o)
    s = eng.stats
    assert s["spec_accepted"] == s["spec_proposed"], s
    assert s["spec_tokens_per_slot_step"] >= 4.0, s


def test_draft_model_staggered_admission():
    """Admission mid-decode must prefill the draft slot correctly while
    other slots keep drafting from live KV."""
    params = llama.init_params(CFG, seed=43)
    draft = llama.init_params(CFG, seed=44)
    rng = np.random.default_rng(43)
    p1 = list(map(int, rng.integers(3, CFG.vocab_size, 6)))
    p2 = list(map(int, rng.integers(3, CFG.vocab_size, 9)))
    eng = _draft_engine(params, draft, max_slots=2, max_seq=64)
    r1 = Request(req_id=0, prompt=p1, max_new_tokens=9)
    eng.add_request(r1)
    eng.step()
    eng.step()
    r2 = Request(req_id=1, prompt=p2, max_new_tokens=7)
    eng.add_request(r2)
    while eng.has_work():
        eng.step()
    assert r1.output == _reference_greedy(params, p1, 9)
    assert r2.output == _reference_greedy(params, p2, 7)


def test_draft_model_with_sampled_slot():
    """Rejection sampling composes with the stateful draft proposer: the
    accepted prefix always equals the draft prefix, so the rollback-only
    KV invariant holds for sampled slots too. A greedy slot sharing the
    batch must stay exactly on the argmax chain."""
    params = llama.init_params(CFG, seed=45)
    eng = _draft_engine(params, params, max_slots=2, max_seq=64)
    r_g = Request(req_id=0, prompt=[5, 6, 7], max_new_tokens=8)
    r_s = Request(req_id=1, prompt=[9, 8], max_new_tokens=8,
                  sampling=SamplingConfig(temperature=1.1, top_k=16))
    eng.add_request(r_g)
    eng.add_request(r_s)
    while eng.has_work():
        eng.step()
    assert r_g.output == _reference_greedy(params, r_g.prompt, 8)
    assert len(r_s.output) == 8
    assert all(0 <= t < CFG.vocab_size for t in r_s.output)


def test_draft_model_with_paged_target():
    """The target's paged pool and the draft's contiguous cache are
    independent — composition must stay exact."""
    params = llama.init_params(CFG, seed=46)
    draft = llama.init_params(CFG, seed=47)
    eng = _draft_engine(params, draft, max_slots=2, max_seq=64,
                        paged=True, page_size=8)
    motif = [5, 6, 7, 8]
    prompts = [motif * 3, motif * 2]
    outs = eng.generate(prompts, max_new_tokens=10)
    for p, o in zip(prompts, outs):
        assert o == _reference_greedy(params, p, 10), (p, o)


def test_spec_commit_q_proposal_marginal_distribution():
    """Arbitrary-q speculative sampling (VERDICT r3 #4): with drafts
    d ~ q and accept prob min(1, p/q), the first committed token must be
    distributed exactly as the target p — for q both broader and
    narrower than p — and acceptance must beat the delta rule when q is
    close to p."""
    import jax
    import jax.numpy as jnp

    from quant_tpu.engine.sampler import filter_logits, spec_commit

    rng = np.random.default_rng(2)
    v, g, b = 8, 2, 3
    logits = jnp.asarray(rng.standard_normal((b, g + 1, v)) * 1.5,
                         jnp.float32)
    temps = jnp.asarray([1.0, 0.7, 0.0], jnp.float32)
    topks = jnp.asarray([0, 4, 0], jnp.int32)
    topps = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    # q: a perturbed version of p (slot 0), near-uniform (slot 1),
    # one-hot at the argmax (slot 2 — the greedy case)
    q_logits = np.asarray(logits)[:, :g] + rng.standard_normal(
        (b, g, v)) * 0.7
    q = np.exp(q_logits) / np.exp(q_logits).sum(-1, keepdims=True)
    am = np.argmax(np.asarray(logits), axis=-1)
    q[2] = np.eye(v)[am[2, :g]] * (1 - 1e-6) + 1e-6 / v
    q = jnp.asarray(q, jnp.float32)

    n = 20000

    def one(k):
        kd, ks = jax.random.split(k)
        # drafts sampled from q per position (ancestral structure is not
        # needed for the position-0 marginal check)
        d = jax.vmap(
            lambda kk, qq: jax.random.categorical(kk, jnp.log(qq)),
            in_axes=(None, 1), out_axes=1)(kd, q).astype(jnp.int32)
        tokens = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), d], axis=1)
        out, acc = spec_commit(logits, tokens, ks, temps, topks, topps,
                               q_probs=q)
        return out, acc

    outs, accs = jax.vmap(one)(jax.random.split(jax.random.key(3), n))
    outs, accs = np.asarray(outs), np.asarray(accs)

    target = np.asarray(jax.nn.softmax(
        filter_logits(logits, temps, topks, topps), axis=-1))
    for slot in range(2):
        emp = np.bincount(outs[:, slot, 0], minlength=v) / n
        tv = 0.5 * np.abs(emp - target[slot, 0]).sum()
        assert tv < 0.02, (slot, tv)
    # greedy slot with q == one-hot(argmax): accepts everything
    assert np.all(outs[:, 2, 0] == am[2, 0])
    assert accs[:, 2].min() >= g

    # acceptance with q ~ p must beat the delta rule's E[p(d)]
    def one_delta(k):
        kd, ks = jax.random.split(k)
        d = jax.vmap(
            lambda kk, qq: jax.random.categorical(kk, jnp.log(qq)),
            in_axes=(None, 1), out_axes=1)(kd, q).astype(jnp.int32)
        tokens = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), d], axis=1)
        _, acc = spec_commit(logits, tokens, ks, temps, topks, topps)
        return acc

    acc_delta = np.asarray(
        jax.vmap(one_delta)(jax.random.split(jax.random.key(4), n)))
    assert accs[:, 0].mean() > acc_delta[:, 0].mean() + 0.1, (
        accs[:, 0].mean(), acc_delta[:, 0].mean())


def test_draft_model_sampled_chain_end_to_end():
    """Sampled-draft speculative sampling through the engine: identical
    draft == target weights must accept (nearly) everything for a
    sampled request, outputs stay reproducible per seed, and a greedy
    slot in the same batch stays exactly on the argmax chain."""
    params = llama.init_params(CFG, seed=50)

    def run():
        eng = _draft_engine(params, params, max_slots=2, max_seq=64)
        r_g = Request(req_id=0, prompt=[5, 6, 7], max_new_tokens=8)
        r_s = Request(req_id=1, prompt=[9, 8], max_new_tokens=10,
                      sampling=SamplingConfig(temperature=1.0),
                      seed=123)
        eng.add_request(r_g)
        eng.add_request(r_s)
        while eng.has_work():
            eng.step()
        return r_g.output, r_s.output, eng.stats

    out_g, out_s, stats = run()
    assert out_g == _reference_greedy(params, [5, 6, 7], 8)
    assert len(out_s) == 10
    # identical weights → q == p → min(1, p/q) = 1: near-full acceptance
    assert stats["spec_acceptance"] > 0.9, stats
    out_g2, out_s2, _ = run()
    assert (out_g2, out_s2) == (out_g, out_s)  # seeded reproducibility
