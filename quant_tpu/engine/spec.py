"""Speculative decoding: host-side draft proposers + acceptance math.

TPU-first design (no reference counterpart — the C++ reference is a host
codec; this extends the serving engine beyond the SURVEY §2.2 #15 scope):
the expensive side is one jitted VERIFY program per engine step — a
``gamma+1``-token forward of the target model (identical structure to a
prefill micro-chunk, so it reuses the model's T>1 cache-insert path and
composes with TP/DP/PP meshes and the paged pool unchanged) — while the
cheap side, proposing draft tokens, runs on host between dispatches where
the axon relay's 40-80 ms RPC latency hides it entirely.

Greedy acceptance (v1): a slot accepts the longest prefix of draft tokens
that matches the target's own argmax chain, plus one "bonus" token — so the
OUTPUT STREAM IS BIT-IDENTICAL TO PLAIN GREEDY DECODING regardless of the
proposer's quality (tests/test_spec.py pins this). Acceptance only changes
throughput: each verify dispatch commits 1..gamma+1 tokens at the cost of
one decode-shaped dispatch (decode is weight-bandwidth bound at small
batch, so gamma extra query rows are nearly free on the MXU).

The bundled proposer is prompt-lookup / n-gram drafting (model-free): the
longest suffix n-gram of the slot's token stream is matched against the
stream's own history and the continuation after the most recent match is
proposed. Strong on self-repetitive output (summaries, code, quoting) and
costs microseconds; a draft-MODEL proposer can implement the same
``propose(stream)`` interface, keeping its own KV state keyed by slot.
"""

from __future__ import annotations

__all__ = ["NgramProposer"]


class NgramProposer:
    """Prompt-lookup drafting: propose the continuation of the most recent
    earlier occurrence of the stream's suffix n-gram.

    ``max_ngram..min_ngram`` are tried longest-first; the first n-gram with
    an earlier occurrence wins (longer matches are more trustworthy).
    Returns at most ``gamma`` tokens; may return fewer or none (the engine
    pads — padded positions simply fail verification, costing nothing
    beyond the already-dispatched verify width).
    """

    def __init__(self, gamma: int = 4, max_ngram: int = 3,
                 min_ngram: int = 1, history: int = 512):
        if gamma < 1:
            raise ValueError("gamma must be >= 1")
        if min_ngram < 1 or max_ngram < min_ngram:
            raise ValueError("need max_ngram >= min_ngram >= 1")
        self.gamma = gamma
        self.max_ngram = max_ngram
        self.min_ngram = min_ngram
        # cap the backward scan: host time per propose stays O(history *
        # max_ngram) however long the stream gets (the engine calls this
        # per slot per step, between device dispatches)
        self.history = history

    def propose(self, stream: list[int]) -> list[int]:
        n = len(stream)
        lo = max(0, n - self.history)
        for k in range(min(self.max_ngram, n - 1), self.min_ngram - 1, -1):
            suffix = stream[n - k:]
            # most recent earlier occurrence of the suffix k-gram
            for start in range(n - k - 1, lo - 1, -1):
                if stream[start:start + k] == suffix:
                    cont = stream[start + k:start + k + self.gamma]
                    if cont:
                        return cont
                    break  # suffix only reoccurs at the very end
        return []
