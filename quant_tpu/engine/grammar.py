"""Grammar-constrained decoding — regex → byte DFA → token FSM.

TPU-native guided decoding: the constraint compiles OFFLINE to a dense
token-level transition table ``trans[S, V] int32`` (-1 = forbidden) that
lives in HBM; the decode programs gather the current state's row, mask
the logits, sample, and advance the state — all inside the jit, so
constrained decoding costs one [B, V] gather per step and ZERO extra
host↔device round-trips (on a 40-80 ms/RPC relay, a host-side mask per
step would dominate the decode step several times over; this is the
design reason the FSM is device-resident, vLLM-style host masking is a
non-starter here).

Pipeline:

1. :func:`compile_regex` — a self-contained regex engine for a practical
   subset (literals, escapes, ASCII classes, ``. * + ? {m,n} | ()``),
   Thompson NFA → subset-construction DFA over bytes (fullmatch
   semantics, anchored both ends).
2. :func:`token_fsm` — lifts the byte DFA to the tokenizer vocabulary:
   ``trans[s, v]`` = the DFA state after consuming token v's bytes from
   state s (vectorized: one [S, V] gather per byte position, so a 128k
   vocab compiles in milliseconds). EOS is legal exactly in accepting
   states (its "transition" is a terminal all-accepting sink).
3. :class:`TokenFSM` — the engine-facing artifact (also constructible
   directly for non-regex constraints, e.g. :func:`choice_fsm` for
   forced multiple-choice token sequences).

No reference counterpart (serving-side generalization, SURVEY.md §0).
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["TokenFSM", "compile_regex", "token_fsm", "regex_fsm",
           "choice_fsm", "json_schema_regex", "json_fsm", "vocab_bytes"]


def _gpt2_unicode_to_byte() -> dict:
    """Inverse of GPT-2's bytes_to_unicode map (byte-level BPE tokens
    spell raw bytes via this printable-unicode alphabet)."""
    bs = (list(range(0x21, 0x7F)) + list(range(0xA1, 0xAD))
          + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(0x100 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


def vocab_bytes(tokenizer, vocab_size: int) -> list[bytes]:
    """Tokenizer vocabulary as the EXACT byte strings each token
    contributes to decoded text — the alphabet the token FSM walks.

    Per-id ``decode([i])`` is NOT faithful: SentencePiece strips the
    leading ``▁`` space marker (so grammars would accept "yesmaybe" for
    "yes maybe") and byte-level-BPE tokens holding partial UTF-8 decode
    to U+FFFD. This reads the raw token strings instead and undoes the
    two standard surface encodings: SentencePiece (``▁`` → space,
    ``<0xHH>`` → the raw byte) and GPT-2 byte-level BPE (each char maps
    to one byte via bytes_to_unicode). Tokenizers without
    ``convert_ids_to_tokens`` (duck-typed stubs) fall back to per-id
    decode. Tokens that resolve empty are forbidden by every grammar.
    """
    conv = getattr(tokenizer, "convert_ids_to_tokens", None)
    if conv is None:
        return [str(tokenizer.decode([i])).encode("utf-8")
                for i in range(vocab_size)]
    toks = [conv(i) for i in range(vocab_size)]
    sample = [t for t in toks if t][:4096]
    byte_level = any(any(ch in ("Ġ", "Ċ") for ch in t)
                     for t in sample if isinstance(t, str))
    u2b = _gpt2_unicode_to_byte() if byte_level else None
    special = set(getattr(tokenizer, "all_special_ids", ()) or ())
    out: list[bytes] = []
    for i, t in enumerate(toks):
        if t is None or i in special:
            out.append(b"")
            continue
        if byte_level:
            try:
                out.append(bytes(u2b[ch] for ch in t))
                continue
            except KeyError:
                pass  # added/special token spelled literally
        if t.startswith("<0x") and t.endswith(">") and len(t) == 6:
            out.append(bytes([int(t[3:5], 16)]))  # SP raw-byte token
            continue
        out.append(t.replace("▁", " ").encode("utf-8"))
    return out


# ── regex parsing (bytes, ASCII classes) ────────────────────────────────


class _Parser:
    """Recursive-descent parser → AST of
    ('lit', frozenset(bytes)) | ('cat', a, b) | ('alt', a, b) |
    ('star', a) | ('plus', a) | ('opt', a) | ('eps',)."""

    def __init__(self, pat: str):
        self.s = pat
        self.i = 0

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else None

    def eat(self):
        c = self.s[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self.alternation()
        if self.i != len(self.s):
            raise ValueError(f"unexpected {self.s[self.i]!r} at {self.i}")
        return node

    def alternation(self):
        node = self.concat()
        while self.peek() == "|":
            self.eat()
            node = ("alt", node, self.concat())
        return node

    def concat(self):
        parts = []
        while self.peek() not in (None, "|", ")"):
            parts.append(self.repeat())
        if not parts:
            return ("eps",)
        node = parts[0]
        for p in parts[1:]:
            node = ("cat", node, p)
        return node

    def repeat(self):
        node = self.atom()
        while self.peek() in ("*", "+", "?", "{"):
            c = self.eat()
            if c == "*":
                node = ("star", node)
            elif c == "+":
                node = ("plus", node)
            elif c == "?":
                node = ("opt", node)
            else:  # {m,n} / {m,} / {m}
                spec = ""
                while self.peek() not in (None, "}"):
                    spec += self.eat()
                if self.peek() != "}":
                    raise ValueError("unterminated {m,n}")
                self.eat()
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    lo = int(lo_s)
                    hi = int(hi_s) if hi_s else None
                else:
                    lo = hi = int(spec)
                out = ("eps",)
                for _ in range(lo):
                    out = ("cat", out, node)
                if hi is None:
                    out = ("cat", out, ("star", node))
                else:
                    for _ in range(hi - lo):
                        out = ("cat", out, ("opt", node))
                node = out
        return node

    _ESCAPES = {
        "d": frozenset(range(0x30, 0x3A)),
        "w": frozenset(list(range(0x30, 0x3A)) + list(range(0x41, 0x5B))
                       + list(range(0x61, 0x7B)) + [0x5F]),
        "s": frozenset(b" \t\n\r\f\v"),
        "n": frozenset(b"\n"), "t": frozenset(b"\t"),
        "r": frozenset(b"\r"),
    }

    def _escape(self) -> frozenset:
        c = self.eat()
        if c in self._ESCAPES:
            return self._ESCAPES[c]
        if c in ("D", "W", "S"):
            return frozenset(range(256)) - self._ESCAPES[c.lower()]
        return frozenset(c.encode("utf-8"))  # literal escape: \. \[ \\ …

    def atom(self):
        c = self.peek()
        if c == "(":
            self.eat()
            node = self.alternation()
            if self.peek() != ")":
                raise ValueError("unbalanced (")
            self.eat()
            return node
        if c == "[":
            return ("lit", self.char_class())
        if c == ".":
            self.eat()
            return ("lit", frozenset(range(256)) - frozenset(b"\n"))
        if c == "\\":
            self.eat()
            return ("lit", self._escape())
        if c in ("*", "+", "?", "{", ")", "|"):
            raise ValueError(f"unexpected {c!r} at {self.i}")
        self.eat()
        enc = c.encode("utf-8")
        if len(enc) == 1:
            return ("lit", frozenset(enc))
        # multi-byte literal char → byte sequence
        node = ("lit", frozenset(enc[:1]))
        for b in enc[1:]:
            node = ("cat", node, ("lit", frozenset((b,))))
        return node

    def char_class(self) -> frozenset:
        self.eat()  # [
        neg = self.peek() == "^"
        if neg:
            self.eat()
        out: set[int] = set()
        prev: int | None = None
        while self.peek() not in (None, "]"):
            c = self.eat()
            if c == "\\":
                s = self._escape()
                out |= s
                prev = None
                continue
            if c == "-" and prev is not None and self.peek() not in (
                    None, "]"):
                hi = ord(self.eat())
                out |= set(range(prev, hi + 1))
                prev = None
                continue
            b = ord(c)
            if b > 0xFF:
                raise ValueError("non-ASCII char class member")
            out.add(b)
            prev = b
        if self.peek() != "]":
            raise ValueError("unbalanced [")
        self.eat()
        return frozenset(range(256)) - frozenset(out) if neg \
            else frozenset(out)


# ── NFA → DFA ───────────────────────────────────────────────────────────


def _nfa(node, nxt, states):
    """Thompson construction: returns (start, accept); ``states`` is a
    list of dicts {byte: set(states)} with eps edges under key -1."""
    def new():
        states.append({})
        return len(states) - 1

    kind = node[0]
    if kind == "eps":
        s, a = new(), new()
        states[s].setdefault(-1, set()).add(a)
        return s, a
    if kind == "lit":
        s, a = new(), new()
        for b in node[1]:
            states[s].setdefault(b, set()).add(a)
        return s, a
    if kind == "cat":
        s1, a1 = _nfa(node[1], nxt, states)
        s2, a2 = _nfa(node[2], nxt, states)
        states[a1].setdefault(-1, set()).add(s2)
        return s1, a2
    if kind == "alt":
        s, a = new(), new()
        for sub in (node[1], node[2]):
            ss, aa = _nfa(sub, nxt, states)
            states[s].setdefault(-1, set()).add(ss)
            states[aa].setdefault(-1, set()).add(a)
        return s, a
    if kind in ("star", "plus", "opt"):
        s, a = new(), new()
        ss, aa = _nfa(node[1], nxt, states)
        states[s].setdefault(-1, set()).add(ss)
        states[aa].setdefault(-1, set()).add(a)
        if kind in ("star", "opt"):
            states[s].setdefault(-1, set()).add(a)
        if kind in ("star", "plus"):
            states[aa].setdefault(-1, set()).add(ss)
        return s, a
    raise ValueError(kind)


def compile_regex(pattern: str, max_states: int = 4096
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Regex → byte DFA: (trans_byte [S, 256] int32 with -1 dead,
    accepting [S] bool). Fullmatch semantics (anchored)."""
    ast = _Parser(pattern).parse()
    states: list[dict] = []
    start, accept = _nfa(ast, None, states)

    def closure(ss: frozenset) -> frozenset:
        out = set(ss)
        stack = list(ss)
        while stack:
            s = stack.pop()
            for t in states[s].get(-1, ()):
                if t not in out:
                    out.add(t)
                    stack.append(t)
        return frozenset(out)

    start_c = closure(frozenset((start,)))
    index = {start_c: 0}
    order = [start_c]
    trans_rows: list[list[int]] = []
    acc: list[bool] = []
    i = 0
    while i < len(order):
        cur = order[i]
        row = [-1] * 256
        for b in range(256):
            tgt = set()
            for s in cur:
                tgt |= states[s].get(b, set())
            if tgt:
                tc = closure(frozenset(tgt))
                if tc not in index:
                    if len(order) >= max_states:
                        raise ValueError(
                            f"regex DFA exceeds {max_states} states")
                    index[tc] = len(order)
                    order.append(tc)
                row[b] = index[tc]
        trans_rows.append(row)
        acc.append(accept in cur)
        i += 1
    return (np.asarray(trans_rows, np.int32),
            np.asarray(acc, bool))


# ── token-level FSM ─────────────────────────────────────────────────────


@dataclasses.dataclass(frozen=True)
class TokenFSM:
    """Token-level DFA for on-device constrained decoding.

    ``trans`` int32 [S, V]: next state for token v in state s, -1 if the
    token is forbidden there. Accepting states permit EOS; committing
    EOS moves to a self-looping all-accepting sink so further (padded)
    steps stay legal. ``start``: the initial state for a fresh request.
    """
    trans: np.ndarray
    start: int = 0

    @property
    def n_states(self) -> int:
        return self.trans.shape[0]

    def advance(self, state: int, tokens) -> int:
        """Host-side replay (admission of resumed/preempted requests)."""
        for t in tokens:
            state = int(self.trans[state, int(t)])
            if state < 0:
                raise ValueError(f"token {t} forbidden by FSM")
        return state


def token_fsm(trans_byte: np.ndarray, accepting: np.ndarray,
              vocab: list[bytes], eos_id: int) -> TokenFSM:
    """Lift a byte DFA to token level.

    ``vocab[v]`` = token v's byte string (empty/special tokens other
    than EOS are simply forbidden everywhere). State S (appended) is the
    post-EOS sink. Vectorized: one [S, V] gather per byte position.
    """
    s_dfa = trans_byte.shape[0]
    v = len(vocab)
    lens = np.asarray([len(t) for t in vocab], np.int32)
    lmax = int(lens.max()) if v else 0
    padded = np.zeros((v, lmax), np.uint8)
    for i, t in enumerate(vocab):
        if t:
            padded[i, :len(t)] = np.frombuffer(t, np.uint8)
    # walk every (state, token) pair in lock-step over byte positions
    tb = np.concatenate(
        [trans_byte, -np.ones((1, 256), np.int32)], axis=0)  # dead row
    cur = np.broadcast_to(
        np.arange(s_dfa, dtype=np.int32)[:, None], (s_dfa, v)).copy()
    for p in range(lmax):
        alive = (p < lens)[None, :]
        stepped = tb[np.where(cur < 0, s_dfa, cur), padded[None, :, p]]
        cur = np.where(alive, stepped, cur)
    trans = np.where((lens > 0)[None, :], cur, -1).astype(np.int32)
    sink = s_dfa  # post-EOS sink state
    full = -np.ones((s_dfa + 1, v), np.int32)
    full[:s_dfa] = trans
    if not 0 <= eos_id < v:
        raise ValueError(f"eos_id {eos_id} outside vocab {v}")
    full[:s_dfa, eos_id] = np.where(accepting, sink, -1)
    full[sink, eos_id] = sink  # EOS self-loop keeps padded steps legal
    return TokenFSM(trans=full)


def regex_fsm(pattern: str, vocab: list[bytes], eos_id: int) -> TokenFSM:
    """compile_regex + token_fsm in one call."""
    tb, acc = compile_regex(pattern)
    return token_fsm(tb, acc, vocab, eos_id)


_WS = r"[ \n\t\r]{0,4}"  # bounded inter-token whitespace (caps DFA size)


def _re_lit(s: str) -> str:
    """Escape a literal for the regex engine."""
    out = []
    for c in s:
        if c in r"\.[]{}()*+?|":
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


def _json_value_regex(schema: dict) -> str:
    """JSON-schema subset → regex over the value's canonical-ish JSON
    text (bounded optional whitespace between structural tokens).

    Supported: type string/integer/number/boolean/null, enum (JSON
    literals), array of items (minItems/maxItems, default 0..8), object
    with ``properties`` emitted in declaration order (all listed
    properties are required — optional properties would square the DFA;
    reject via ValueError so callers know the contract)."""
    if "enum" in schema:
        import json as _json

        alts = "|".join(_re_lit(_json.dumps(v)) for v in schema["enum"])
        return f"({alts})"
    t = schema.get("type")
    if t == "string":
        # ASCII string with escapes; no raw control chars
        return r'"([^"\\]|\\.)*"'
    if t == "integer":
        return r"-?(0|[1-9]\d*)"
    if t == "number":
        return r"-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?"
    if t == "boolean":
        return r"(true|false)"
    if t == "null":
        return r"null"
    if t == "array":
        item = _json_value_regex(schema.get("items", {"type": "string"}))
        lo = int(schema.get("minItems", 0))
        hi = int(schema.get("maxItems", 8))
        if lo > hi:
            raise ValueError("minItems > maxItems")
        more = f"({_WS},{_WS}{item})"
        if lo == 0:
            body = (f"({item}{more}{{0,{hi - 1}}})?" if hi > 0 else "")
        else:
            body = f"{item}{more}{{{lo - 1},{hi - 1}}}"
        return rf"\[{_WS}{body}{_WS}\]"
    if t == "object":
        props = schema.get("properties", {})
        if not props:
            return rf"\{{{_WS}\}}"
        req = schema.get("required")
        if req is not None and set(req) != set(props):
            raise ValueError(
                "guided_json supports all-required objects only "
                "(optional properties square the DFA)")
        parts = []
        for k, sub in props.items():
            parts.append(
                rf'"{_re_lit(k)}"{_WS}:{_WS}{_json_value_regex(sub)}')
        body = (_WS + "," + _WS).join(parts)
        return rf"\{{{_WS}{body}{_WS}\}}"
    raise ValueError(f"unsupported schema: {schema!r}")


def json_schema_regex(schema: dict) -> str:
    """Top-level JSON-schema → anchored regex (compose with
    :func:`regex_fsm`). See :func:`_json_value_regex` for the subset."""
    return _json_value_regex(schema)


def json_fsm(schema: dict, vocab: list[bytes], eos_id: int) -> TokenFSM:
    """JSON-schema-constrained decoding: schema → regex → token FSM."""
    return regex_fsm(json_schema_regex(schema), vocab, eos_id)


def choice_fsm(choices: list[list[int]], vocab_size: int,
               eos_id: int) -> TokenFSM:
    """Force the output to be exactly one of ``choices`` (token-id
    sequences) — a trie DFA, EOS legal only at a completed choice."""
    # state 0 = root; build a trie of the sequences
    children: list[dict[int, int]] = [{}]
    terminal: list[bool] = [False]
    for seq in choices:
        if not seq:
            raise ValueError("empty choice")
        s = 0
        for t in seq:
            t = int(t)
            if not 0 <= t < vocab_size:
                raise ValueError(f"choice token {t} outside vocab")
            if t not in children[s]:
                children.append({})
                terminal.append(False)
                children[s][t] = len(children) - 1
            s = children[s][t]
        terminal[s] = True
    n = len(children)
    sink = n
    trans = -np.ones((n + 1, vocab_size), np.int32)
    for s, kids in enumerate(children):
        for t, nxt in kids.items():
            trans[s, t] = nxt
        if terminal[s]:
            trans[s, eos_id] = sink
    trans[sink, eos_id] = sink
    return TokenFSM(trans=trans)
