"""Grammar-constrained decoding (engine/grammar.py + engine FSM path).

The constraint is a token-level DFA resident on device; the decode
programs mask logits and advance per-slot states inside the jit. Tests
pin the regex compiler, the token lift, and the engine integration on
both dispatch paths (step / step_block) with sampled AND greedy slots.
"""

import dataclasses

import numpy as np
import pytest

from quant_tpu.engine import Engine, Request, SamplingConfig
from quant_tpu.engine.grammar import (
    TokenFSM,
    choice_fsm,
    compile_regex,
    regex_fsm,
    token_fsm,
)
from quant_tpu.models import PRESETS, llama

CFG = PRESETS["test-tiny"]


def _dfa_match(pattern, s: str) -> bool:
    tb, acc = compile_regex(pattern)
    st = 0
    for b in s.encode():
        st = tb[st, b]
        if st < 0:
            return False
    return bool(acc[st])


@pytest.mark.parametrize("pattern,yes,no", [
    (r"-?\d+(\.\d+)?", ["0", "-12", "3.14", "-0.5"],
     ["", "-", "1.", ".5", "1.2.3", "a1"]),
    (r"(yes|no|maybe)", ["yes", "no", "maybe"], ["y", "nope", "maybeso"]),
    (r"[a-f0-9]{4}", ["a1b2", "0000", "dead"], ["a1b", "a1b2c", "g111"]),
    (r"a+b*c?", ["a", "aab", "abc", "aaac"], ["", "b", "ac c", "cc"]),
    (r"[^0-9]{2}", ["ab", "!@"], ["a1", "abc", "a"]),
    (r"\w+@\w+\.(com|org)", ["a_1@b.com", "x@y.org"],
     ["a@b", "a@b.net", "@b.com"]),
    (r"a{2,3}", ["aa", "aaa"], ["a", "aaaa"]),
])
def test_regex_dfa(pattern, yes, no):
    for s in yes:
        assert _dfa_match(pattern, s), (pattern, s)
    for s in no:
        assert not _dfa_match(pattern, s), (pattern, s)


def _digit_vocab(v: int, eos: int) -> list[bytes]:
    """Synthetic vocab: ids 0..9 are digit bytes, everything else a
    letter (so \\d-patterns admit exactly ids 0..9); eos empty."""
    vocab = []
    for i in range(v):
        if i < 10:
            vocab.append(b"%d" % i)
        else:
            vocab.append(bytes([97 + i % 26]))
    vocab[eos] = b""
    return vocab


def test_token_fsm_digits():
    eos = 500
    fsm = regex_fsm(r"\d{3}", _digit_vocab(CFG.vocab_size, eos), eos)
    row = fsm.mask_row(fsm.start)
    assert all(row[i] >= 0 for i in range(10))
    assert all(row[i] < 0 for i in range(10, 40))
    assert row[eos] < 0
    s = fsm.advance(fsm.start, [3, 1, 4])
    assert fsm.legal(s, eos)                # accepting → EOS legal
    assert not any(fsm.legal(s, i) for i in range(10))  # 4th digit not


def _run_engine(fsm, sampling, eos, use_block, max_new=8, seed=0):
    params = llama.init_params(CFG, seed=seed)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=eos)
    r = Request(req_id=0, prompt=[50, 51, 52], max_new_tokens=max_new,
                sampling=sampling, fsm=fsm)
    eng.add_request(r)
    while eng.has_work():
        if use_block:
            eng.step_block(4)
        else:
            eng.step()
    return r.output


@pytest.mark.parametrize("use_block", [False, True])
@pytest.mark.parametrize("temp", [0.0, 1.0])
def test_engine_choice_fsm(use_block, temp):
    """Output must be exactly one of the allowed sequences + EOS, on
    both dispatch paths, greedy and sampled."""
    eos = 7
    fsm = choice_fsm([[10, 11, 12], [20, 21]], CFG.vocab_size, eos)
    out = _run_engine(fsm, SamplingConfig(temperature=temp), eos,
                      use_block, seed=1)
    assert out in ([10, 11, 12, eos], [20, 21, eos]), out


@pytest.mark.parametrize("use_block", [False, True])
def test_engine_regex_digits(use_block):
    """\\d{3}: exactly three digit tokens then EOS, from a model that
    would otherwise emit arbitrary tokens."""
    eos = 500
    fsm = regex_fsm(r"\d{3}", _digit_vocab(CFG.vocab_size, eos), eos)
    out = _run_engine(fsm, SamplingConfig(temperature=1.0), eos,
                      use_block, seed=2)
    assert len(out) == 4 and out[-1] == eos, out
    assert all(0 <= t <= 9 for t in out[:3]), out
    # unconstrained control: the same model does NOT naturally emit this
    free = _run_engine(None, SamplingConfig(temperature=1.0), eos,
                       use_block, seed=2)
    assert not (len(free) == 4 and all(0 <= t <= 9 for t in free[:3]))


def test_engine_fsm_with_penalties():
    """FSM masking composes with token-history penalties: a huge
    presence penalty forbids digit reuse, the FSM forbids non-digits →
    output must be three DISTINCT digits."""
    eos = 500
    fsm = regex_fsm(r"\d{3}", _digit_vocab(CFG.vocab_size, eos), eos)
    out = _run_engine(
        fsm, SamplingConfig(temperature=1.0, presence_penalty=1e9), eos,
        use_block=False, seed=3)
    assert len(out) == 4 and out[-1] == eos
    assert len(set(out[:3])) == 3 and all(t <= 9 for t in out[:3])


def test_engine_fsm_mixed_batch():
    """A constrained and an unconstrained request co-batch; only the
    constrained slot is masked."""
    eos = 7
    params = llama.init_params(CFG, seed=4)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=eos)
    fsm = choice_fsm([[30, 31]], CFG.vocab_size, eos)
    rc = Request(req_id=0, prompt=[5, 6], max_new_tokens=6,
                 sampling=SamplingConfig(temperature=1.0), fsm=fsm)
    rf = Request(req_id=1, prompt=[8, 9], max_new_tokens=6,
                 sampling=SamplingConfig(temperature=1.0))
    eng.add_request(rc)
    eng.add_request(rf)
    while eng.has_work():
        eng.step()
    assert rc.output == [30, 31, eos], rc.output
    assert len(rf.output) == 6 or (rf.output and rf.output[-1] == eos)
    # the free slot was NOT constrained to the choice
    assert rf.output != [30, 31, eos]


def test_fsm_composes_with_speculation():
    """r5 (VERDICT r4 #8): guided + n-gram speculation produces output
    IDENTICAL to guided plain decode — the verify program masks each
    chain position with the byte-walked FSM state, so the first illegal
    draft rejects and the commit token is always legal."""
    eos = 500
    fsm = regex_fsm(r"\d{6}", _digit_vocab(CFG.vocab_size, eos), eos)
    params = llama.init_params(CFG, seed=5)

    def run(spec_gamma, temperature=0.0):
        eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=eos,
                     spec_gamma=spec_gamma)
        r = Request(req_id=0, prompt=[3, 1, 4, 3, 1], max_new_tokens=10,
                    sampling=SamplingConfig(temperature=temperature),
                    seed=11, fsm=fsm)
        eng.add_request(r)
        while eng.has_work():
            eng.step()
        assert r.output[-1] == eos and len(r.output) == 7, r.output
        assert all(0 <= t <= 9 for t in r.output[:6]), r.output
        return r.output

    plain = run(0)
    assert run(3) == plain          # greedy: bit-identical
    run(3, temperature=1.0)         # sampled: grammar-valid


def test_fsm_spec_mixed_batch_and_draft_model():
    """Guided + unguided co-batch on a spec engine (only the guided slot
    is masked), and the composition also holds under a DRAFT-MODEL
    proposer (whose drafts know nothing about the grammar)."""
    from quant_tpu.engine.spec import DraftModelProposer

    eos = 500
    fsm = regex_fsm(r"\d{4}", _digit_vocab(CFG.vocab_size, eos), eos)
    params = llama.init_params(CFG, seed=6)

    def ref_guided():
        eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=eos)
        r = Request(req_id=0, prompt=[9, 9, 2], max_new_tokens=8,
                    fsm=fsm)
        eng.add_request(r)
        while eng.has_work():
            eng.step()
        return r.output

    want = ref_guided()
    dcfg = dataclasses.replace(CFG)
    prop = DraftModelProposer(llama.init_params(dcfg, seed=9), dcfg,
                              gamma=2, max_slots=2, max_seq=64)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=eos,
                 spec_gamma=2, spec_proposer=prop)
    rg = Request(req_id=0, prompt=[9, 9, 2], max_new_tokens=8, fsm=fsm)
    rf = Request(req_id=1, prompt=[8, 9], max_new_tokens=6)
    eng.add_request(rg)
    eng.add_request(rf)
    while eng.has_work():
        eng.step()
    assert rg.output == want, (rg.output, want)
    assert len(rf.output) == 6 or (rf.output and rf.output[-1] == eos)


def test_dead_row_forces_eos():
    """A token-level dead state (the byte DFA continues but no vocab
    token realizes any legal byte) must terminate via the forced-EOS
    bit instead of sampling from an empty distribution."""
    eos = 7
    vocab = [b""] * CFG.vocab_size
    vocab[12] = b"a"        # only "a" is spellable — "q" never is
    fsm = regex_fsm("aq", vocab, eos)
    assert fsm.legal(fsm.advance(fsm.start, [12]), eos)
    out = _run_engine(fsm, SamplingConfig(temperature=1.0), eos,
                      use_block=False, seed=6)
    assert out == [12, eos], out


def test_token_fsm_multibyte_tokens():
    """Tokens spanning several bytes walk the byte DFA correctly."""
    vocab = [b"ab", b"a", b"b", b"abab", b"c", b""]
    eos = 5
    tb, acc = compile_regex(r"(ab)+")
    fsm = token_fsm(tb, acc, vocab, eos)
    s0 = fsm.start
    assert fsm.legal(s0, 0)            # "ab" ok
    assert fsm.legal(s0, 1)            # "a" ok (mid-pair)
    assert not fsm.legal(s0, 2)        # "b" alone not
    assert fsm.legal(s0, 3)            # "abab" ok
    assert not fsm.legal(s0, 4)        # "c" not
    assert not fsm.legal(s0, eos)      # empty not accepted
    s_ab = fsm.advance(s0, [0])
    assert fsm.legal(s_ab, eos)        # "ab" accepting
    s_a = fsm.advance(s0, [1])
    assert fsm.legal(s_a, 2)           # "a" then "b"
    assert not fsm.legal(s_a, eos)


def test_json_schema_regex():
    """JSON-schema subset → regex → DFA: canonical output matches,
    violations don't."""
    import json as _json

    from quant_tpu.engine.grammar import json_schema_regex

    schema = {"type": "object", "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "tags": {"type": "array", "items": {"enum": ["a", "b"]},
                 "maxItems": 3},
        "ok": {"type": "boolean"},
    }}
    pat = json_schema_regex(schema)
    good = _json.dumps({"name": "Ann", "age": 34, "tags": ["a"],
                        "ok": True})
    assert _dfa_match(pat, good)
    assert _dfa_match(pat, '{ "name": "x\\"y", "age": 0, "tags": [],'
                           ' "ok": false }')
    assert not _dfa_match(pat, '{"name": "Ann"}')           # missing keys
    assert not _dfa_match(pat, good[:-1])                   # truncated
    assert not _dfa_match(pat, good.replace("34", "3.4"))   # wrong type
    assert not _dfa_match(pat, good.replace('"a"', '"c"'))  # enum

    arr = json_schema_regex({"type": "array",
                             "items": {"type": "integer"},
                             "minItems": 2, "maxItems": 3})
    assert _dfa_match(arr, "[1, 2]") and _dfa_match(arr, "[1,2,3]")
    assert not _dfa_match(arr, "[1]")
    assert not _dfa_match(arr, "[1,2,3,4]")

    import pytest
    with pytest.raises(ValueError, match="all-required"):
        json_schema_regex({"type": "object",
                           "properties": {"a": {"type": "null"}},
                           "required": []})


def test_engine_json_schema_digits():
    """guided_json through the engine: the sampled output must BE valid
    JSON matching the schema (tiny integer-array schema over the digit
    vocab; [, ], comma mapped onto ids)."""
    import json as _json

    from quant_tpu.engine.grammar import json_schema_regex, regex_fsm

    eos = 500
    vocab = _digit_vocab(CFG.vocab_size, eos)
    vocab[20], vocab[21], vocab[22] = b"[", b"]", b","
    schema = {"type": "array", "items": {"type": "integer"},
              "minItems": 1, "maxItems": 4}
    fsm = regex_fsm(json_schema_regex(schema), vocab, eos)
    out = _run_engine(fsm, SamplingConfig(temperature=1.0), eos,
                      use_block=False, max_new=16, seed=7)
    assert out[-1] == eos
    text = b"".join(vocab[t] for t in out[:-1]).decode()
    parsed = _json.loads(text)
    assert isinstance(parsed, list) and 1 <= len(parsed) <= 4
    assert all(isinstance(x, int) for x in parsed)


def test_vocab_bytes_tokenizer_fidelity():
    """vocab_bytes must preserve SentencePiece space markers and raw-byte
    tokens, and invert GPT-2 byte-level BPE — per-id decode loses both."""
    from quant_tpu.engine.grammar import vocab_bytes

    class _SP:
        # SentencePiece-style: '▁' marks a space, <0xHH> raw bytes
        toks = ["<s>", "▁yes", "maybe", "<0x0A>", "▁no"]
        all_special_ids = [0]

        def convert_ids_to_tokens(self, i):
            return self.toks[i]

        def decode(self, ids):
            raise AssertionError("must not fall back to decode")

    vb = vocab_bytes(_SP(), 5)
    assert vb == [b"", b" yes", b"maybe", b"\n", b" no"]

    class _BPE:
        # GPT-2 byte-level: 'Ġ' (U+0120) encodes 0x20
        toks = ["Ġhello", "ab", "Ġ", "Ċ"]
        all_special_ids = []

        def convert_ids_to_tokens(self, i):
            return self.toks[i]

    vb = vocab_bytes(_BPE(), 4)
    assert vb == [b" hello", b"ab", b" ", b"\n"]

    class _Stub:  # duck-typed: falls back to per-id decode
        def decode(self, ids):
            return chr(97 + ids[0])

    assert vocab_bytes(_Stub(), 3) == [b"a", b"b", b"c"]


def test_fsm_registry_cap():
    params = llama.init_params(CFG, seed=30)
    eng = Engine(params, CFG, max_slots=1, max_seq=32, eos_id=7)
    for i in range(eng.MAX_FSMS):
        eng.register_fsm(choice_fsm([[i + 10]], CFG.vocab_size, 7))
    with pytest.raises(ValueError, match="registry full"):
        eng.register_fsm(choice_fsm([[200]], CFG.vocab_size, 7))


def test_big_grammar_registers_under_100mb():
    """VERDICT r3 #5 done-criterion: a 128k-vocab, ~2k-state grammar's
    device tables stay under 100 MB (the former dense [S, V] int32 stack
    would be ~1 GB), and registration grows the stacks in place."""
    v, eos = 128256, 128000
    vocab = _digit_vocab(v, eos)
    fsm = regex_fsm(r"\d{2047}", vocab, eos)
    assert fsm.n_states >= 2048
    hbm = (fsm.bits.nbytes + fsm.byte_trans.nbytes
           + fsm.tok_bytes.nbytes + fsm.tok_len.nbytes)
    assert hbm < 100 * 2**20, hbm

    cfg = dataclasses.replace(
        CFG, vocab_size=v, dim=64, n_layers=1, n_heads=2, n_kv_heads=2,
        intermediate=64, group_size=32)
    eng = Engine(llama.init_params(cfg, seed=0), cfg, max_slots=1,
                 max_seq=16, eos_id=eos)
    fid = eng.register_fsm(fsm)
    assert fid == 1
    dev = (eng._fsm_bits.nbytes + eng._fsm_bt.nbytes
           + eng._fsm_tokb.nbytes + eng._fsm_tokl.nbytes)
    assert dev < 100 * 2**20, dev
    # second registration grows the stack in place (F dim + idempotent)
    small = choice_fsm([[1, 2]], v, eos)
    assert eng.register_fsm(small) == 2
    assert eng.register_fsm(small) == 2
    assert eng._fsm_bits.shape[0] == 3
    # mask semantics survive the stack round-trip
    import numpy as _np
    row = _np.asarray(eng._fsm_bits[1, fsm.start])
    exp = ((row[:, None] >> _np.arange(32, dtype=_np.uint32)) & 1
           ).reshape(-1)[:v]
    assert exp[:10].all() and not exp[10:40].any()


def test_recursive_ref_schema_depth_k():
    """$ref recursion unrolls to max_depth through the regex→DFA
    pipeline (VERDICT r3 #6); past the cutoff the recursive array
    closes as [] and deeper documents are rejected."""
    import json as _json
    from quant_tpu.engine.grammar import compile_regex, json_schema_regex
    schema = {
        "type": "object",
        "properties": {
            "v": {"type": "integer"},
            "kids": {"type": "array", "minItems": 0, "maxItems": 2,
                     "items": {"$ref": "#"}},
        },
    }
    rx = json_schema_regex(schema, max_depth=2)
    tb, acc = compile_regex(rx, max_states=65536)

    def accepts(doc):
        s = 0
        for b in _json.dumps(doc, separators=(",", ":")).encode():
            s = int(tb[s, b])
            if s < 0:
                return False
        return bool(acc[s])

    leaf = {"v": 3, "kids": []}
    assert accepts({"v": 1, "kids": [{"v": 2, "kids": [leaf]}]})
    too_deep = {"v": 1, "kids": [{"v": 2, "kids": [
        {"v": 3, "kids": [leaf]}]}]}
    assert not accepts(too_deep)
    # an all-required recursive object has no finite cutoff
    with pytest.raises(ValueError, match="max_depth"):
        json_schema_regex({"type": "object",
                           "properties": {"next": {"$ref": "#"}}})
    # $defs resolution
    rx2 = json_schema_regex({
        "$defs": {"leafy": {"type": "boolean"}},
        "type": "array", "items": {"$ref": "#/$defs/leafy"},
        "maxItems": 2})
    tb2, acc2 = compile_regex(rx2)
    s = 0
    for b in b"[true,false]":
        s = int(tb2[s, b])
        assert s >= 0
    assert acc2[s]


def test_engine_nested_guided_json():
    """Engine samples schema-valid JSON for an object-inside-array-
    inside-object schema (VERDICT r3 #6 done-criterion)."""
    import json as _json
    from quant_tpu.engine.grammar import json_fsm

    # byte-per-token vocab so any JSON text is spellable
    vocab = [bytes([i]) if 32 <= i < 127 else b""
             for i in range(CFG.vocab_size)]
    eos = 300
    schema = {
        "type": "object",
        "properties": {
            "rows": {"type": "array", "minItems": 1, "maxItems": 2,
                     "items": {"type": "object",
                               "properties": {
                                   "id": {"type": "integer"},
                                   "ok": {"type": "boolean"}}}},
        },
    }
    fsm = json_fsm(schema, vocab, eos, max_states=16384)
    params = llama.init_params(CFG, seed=9)
    eng = Engine(params, CFG, max_slots=2, max_seq=256, eos_id=eos)
    r = Request(req_id=0, prompt=[50, 51, 52], max_new_tokens=200,
                sampling=SamplingConfig(temperature=1.0, top_k=0),
                fsm=fsm)
    eng.add_request(r)
    while eng.has_work():
        eng.step_block(4)
    out = r.output
    assert out[-1] == eos
    text = b"".join(vocab[t] for t in out[:-1]).decode()
    doc = _json.loads(text)
    assert isinstance(doc["rows"], list) and 1 <= len(doc["rows"]) <= 2
    for row in doc["rows"]:
        assert set(row) == {"id", "ok"}
        assert isinstance(row["id"], int) and isinstance(row["ok"], bool)


def test_fsm_retrace_counter():
    """Mid-serving registrations that grow the table shapes are counted
    in Engine.stats (fsm_retraces) — the retrace latency cliff is
    invisible otherwise (VERDICT r4 weak #6)."""
    eos = 7
    params = llama.init_params(CFG, seed=8)
    eng = Engine(params, CFG, max_slots=2, max_seq=64, eos_id=eos)
    f1 = choice_fsm([[10, 11]], CFG.vocab_size, eos)
    eng.add_request(Request(req_id=0, prompt=[5], max_new_tokens=4,
                            fsm=f1))
    while eng.has_work():
        eng.step()
    assert eng.stats.get("fsm_retraces", 0) == 0
    # a LARGER grammar after steady-state grows (F, S, L) → counted
    f2 = regex_fsm(r"\d{8}", _digit_vocab(CFG.vocab_size, eos), eos)
    eng.register_fsm(f2)
    assert eng.stats["fsm_retraces"] == 1
    # same-shape re-registration of the same object: no new retrace
    eng.register_fsm(f2)
    assert eng.stats["fsm_retraces"] == 1
