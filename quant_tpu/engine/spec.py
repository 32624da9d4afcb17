"""Speculative decoding: host-side draft proposers + acceptance math.

TPU-first design (no reference counterpart — the C++ reference is a host
codec; this extends the serving engine beyond the SURVEY §2.2 #15 scope):
the expensive side is one jitted VERIFY program per engine step — a
``gamma+1``-token forward of the target model (identical structure to a
prefill micro-chunk, so it reuses the model's T>1 cache-insert path and
composes with TP/DP/PP meshes and the paged pool unchanged) — while the
cheap side, proposing draft tokens, runs on host between dispatches where
the axon relay's 40-80 ms RPC latency hides it entirely.

Acceptance: greedy slots accept the longest prefix of draft tokens
that matches the target's own argmax chain, plus one "bonus" token — so
the output stream is the verify program's greedy chain regardless of the
proposer's quality; acceptance only changes throughput (each verify
dispatch commits 1..gamma+1 tokens at the cost of one decode-shaped
dispatch; decode is weight-bandwidth bound at small batch, so gamma
extra query rows are nearly free on the MXU). tests/test_spec.py pins
bit-identity with plain greedy decoding on CPU; on TPU hardware the T=1
decode program and the T=gamma+1 verify program tile matmuls
differently, so bf16 argmax near-ties can flip between them — the spec
stream stays deterministic and draft-independent (both properties
measured in scripts/tpu_draft_spec_probe.py), it is just greedy under
the verify program's rounding rather than the decode program's.
Sampled slots run on-device rejection sampling
(engine/sampler.spec_commit) in one of two forms, both exact ancestral
sampling from the target chain (verified statistically in
tests/test_spec.py): DELTA proposals (n-gram drafts, or a greedy draft
chain) accept d with probability p(d); SAMPLED draft chains
(DraftModelProposer.draft_batch_sampled, r4) draw d ~ q under the
request's own knobs and accept with min(1, p(d)/q(d)) with residual
norm((p-q)+) — the standard speculative-sampling rule, strictly higher
acceptance (identical draft weights accept ~everything). The q rows
([B, gamma, V]) never leave the device: the draft dispatch writes them
to HBM and the verify program consumes them.

The bundled proposer is prompt-lookup / n-gram drafting (model-free): the
longest suffix n-gram of the slot's token stream is matched against the
stream's own history and the continuation after the most recent match is
proposed. Strong on self-repetitive output (summaries, code, quoting) and
costs microseconds; a draft-MODEL proposer can implement the same
``propose(stream)`` interface, keeping its own KV state keyed by slot.
"""

from __future__ import annotations

import functools

__all__ = ["DraftModelProposer", "NgramProposer"]


class DraftModelProposer:
    """Draft-MODEL speculative decoding: a small same-tokenizer model
    drafts ``gamma`` greedy tokens in ONE fused device dispatch per engine
    step (a ``fori_loop`` of draft forwards — on a high-RPC-latency link
    the whole draft chain costs one dispatch, like the verify).

    KV synchronization with the target's committed stream needs NO
    catch-up pass — rollback alone suffices. Invariant: before drafting,
    the draft cache holds valid KV for ``stream[:-1]``. The fused loop
    feeds the last committed token then its own outputs, writing KV at
    positions n-1..n-1+gamma-1 for fed tokens [t_last, d_1..d_{gamma-1}].
    After the target accepts ``a`` drafts + 1 commit token, the new
    stream is ``stream + [c_0..c_a]`` with ``c_j == d_{j+1}`` for j < a
    (the accepted prefix IS the draft prefix — true for greedy argmax
    acceptance AND for rejection sampling with EITHER proposal form,
    whose residual/bonus sample only ever lands at position ``a``) — so
    the draft's KV is valid exactly through the new ``stream'[:-1]`` and
    setting ``lengths = len(stream') - 1`` at the next round restores
    the invariant WITHOUT any replay pass: the one token that can
    diverge from the drafts (the residual/bonus commit) is stream'[-1],
    which the invariant excludes. This argument is proposal-agnostic, so
    the sampled draft chain needs no KV re-sync on rejection either.

    Admission: the engine calls :meth:`admit` with the slot's stream; the
    proposer chunk-prefills ``stream[:-1]`` through the draft model into
    its own cache slot. Preempted/resumed requests just re-admit.

    Single-host: the draft model is small and stays replicated; the
    target engine may itself be meshed/paged (the caches are independent).
    """

    def __init__(self, draft_params, draft_cfg, gamma: int = 4,
                 max_slots: int = 8, max_seq: int = 1024,
                 prefill_chunk: int = 512):
        import jax
        import jax.numpy as jnp

        from quant_tpu.models import llama

        if gamma < 1:
            raise ValueError("gamma must be >= 1")
        self.gamma = gamma
        self.params = draft_params
        self.cfg = draft_cfg
        self.max_seq = max_seq
        self.prefill_chunk = prefill_chunk
        self.cache = llama.init_cache(draft_cfg, max_slots, max_seq)
        self._pf = llama.init_cache(draft_cfg, 1, max_seq)
        cfg = draft_cfg

        @functools.partial(jax.jit, donate_argnums=(1,))
        def draft_steps(params, cache, toks, lengths):
            # rollback + draft in one dispatch: lengths[b] = len(stream)-1
            # for active slots (inactive slots carry max_seq so their
            # writes drop)
            import dataclasses
            cache = dataclasses.replace(cache, lengths=lengths)

            def body(i, carry):
                tok, cache, out = carry
                logits, cache = llama.forward(params, tok, cache, cfg)
                nxt = jnp.argmax(
                    logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                out = jax.lax.dynamic_update_slice(out, nxt, (0, i))
                return nxt, cache, out

            # gamma+1 iterations: the LAST one feeds d_gamma purely for
            # its KV write (logits discarded). Without it, a fully
            # accepted round leaves position n+gamma-1 without KV and the
            # next round drafts from garbage — acceptance collapses on
            # exactly the streams speculation helps most.
            out = jnp.zeros((toks.shape[0], gamma + 1), jnp.int32)
            _, cache, out = jax.lax.fori_loop(
                0, gamma + 1, body, (toks, cache, out))
            return out[:, :gamma], cache

        self._draft = draft_steps

        # per-slot draft-chain PRNG keys (threefry key data): set from the
        # request seed at admission (engine.set via set_slot_key) so a
        # request's PROPOSALS are a pure function of its seed + stream —
        # acceptance randomness stays on the engine's slot_keys, so the
        # committed distribution is exact regardless, but deterministic
        # proposals keep the realized stream reproducible too (modulo
        # preemption: the draft key is not draw-count-replayed).
        self._keys = jnp.zeros((max_slots, 2), jnp.uint32)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def draft_steps_sampled(params, cache, toks, lengths, keys,
                                temps, topks, topps, minps):
            # sampled draft chain (standard speculative sampling): each
            # step samples d_i ~ q_i under the REQUEST's own knobs and
            # records the full filtered q_i row — the verify program's
            # min(1, p/q) acceptance + (p-q)+ residual need it. q rows
            # stay on device end to end ([B, gamma, V] HBM, never
            # fetched). Greedy slots (temp 0) degenerate to the argmax
            # chain with one-hot q.
            import dataclasses

            from quant_tpu.engine.sampler import (
                filter_logits, sample_batch,
            )

            cache = dataclasses.replace(cache, lengths=lengths)
            b = toks.shape[0]
            v = cfg.vocab_size

            def body(i, carry):
                tok, cache, out, qbuf, keys = carry
                logits, cache = llama.forward(params, tok, cache, cfg)
                lg = logits[:, -1]
                ks = jax.vmap(jax.random.split)(
                    jax.random.wrap_key_data(keys))
                keys = jax.random.key_data(ks[:, 0])
                nxt = sample_batch(lg, ks[:, 1], temps, topks, topps,
                                   minps)[:, None]
                l2 = filter_logits(lg, temps, topks, topps, minps)
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, lg.shape, 1)
                    == jnp.argmax(lg, axis=-1)[:, None]).astype(
                        jnp.float32)
                q = jnp.where((temps == 0.0)[:, None], onehot,
                              jax.nn.softmax(l2, axis=-1))
                out = jax.lax.dynamic_update_slice(out, nxt, (0, i))
                qbuf = jax.lax.dynamic_update_slice(
                    qbuf, q[:, None], (0, i, 0))
                return nxt, cache, out, qbuf, keys

            out = jnp.zeros((b, gamma + 1), jnp.int32)
            qbuf = jnp.zeros((b, gamma + 1, v), jnp.float32)
            _, cache, out, qbuf, keys = jax.lax.fori_loop(
                0, gamma + 1, body, (toks, cache, out, qbuf, keys))
            return out[:, :gamma], qbuf[:, :gamma], cache, keys

        self._draft_sampled = draft_steps_sampled

        @functools.partial(jax.jit, donate_argnums=(1,))
        def pf_chunk(params, pf, toks, true_len):
            import dataclasses
            start = pf.lengths
            _, pf = llama.forward(params, toks, pf, cfg)
            return dataclasses.replace(pf, lengths=start + true_len)

        self._pf_chunk = pf_chunk
        from quant_tpu.engine.engine import Engine
        self._insert = jax.jit(Engine._insert_single, donate_argnums=(0,))

    def admit(self, slot: int, stream: list[int]) -> None:
        """Prefill ``stream[:-1]`` through the draft model into the
        slot's draft-cache row (chunked batch-1, bucketed shapes)."""
        import dataclasses

        import jax.numpy as jnp
        import numpy as np

        from quant_tpu.engine.engine import _bucket

        ctx = stream[:-1]
        self._pf = dataclasses.replace(
            self._pf, lengths=jnp.zeros_like(self._pf.lengths))
        for off in range(0, len(ctx), self.prefill_chunk):
            chunk = ctx[off:off + self.prefill_chunk]
            t_pad = _bucket(len(chunk))  # same bucketing as the engine
            toks = np.zeros((1, t_pad), np.int32)
            toks[0, :len(chunk)] = chunk
            self._pf = self._pf_chunk(self.params, self._pf,
                                      jnp.asarray(toks),
                                      jnp.int32(len(chunk)))
        self.cache = self._insert(self.cache, self._pf, jnp.int32(slot))

    def draft_batch(self, last_tokens, stream_lens) -> "np.ndarray":
        """One fused draft dispatch for every slot. ``last_tokens``
        [max_slots] int; ``stream_lens`` [max_slots] int, 0 for inactive
        slots. Returns [max_slots, gamma] proposed tokens."""
        import jax.numpy as jnp
        import numpy as np

        lens = np.asarray(stream_lens, np.int64)
        lengths = np.where(lens > 0, lens - 1, self.max_seq).astype(np.int32)
        out, self.cache = self._draft(
            self.params, self.cache,
            jnp.asarray(np.asarray(last_tokens, np.int32)[:, None]),
            jnp.asarray(lengths))
        return np.asarray(out)

    def set_slot_key(self, slot: int, key_data) -> None:
        """Seed the slot's draft-chain PRNG (engine calls at admission)."""
        import jax.numpy as jnp

        self._keys = self._keys.at[slot].set(jnp.asarray(key_data))

    def draft_batch_sampled(self, last_tokens, stream_lens, temps, topks,
                            topps, minps):
        """Sampled draft chain: returns (np tokens [max_slots, gamma],
        DEVICE q_probs [max_slots, gamma, V]) — q never leaves HBM; the
        engine feeds it straight into the verify program's min(1, p/q)
        acceptance (sampler.spec_commit q_probs)."""
        import jax.numpy as jnp
        import numpy as np

        lens = np.asarray(stream_lens, np.int64)
        lengths = np.where(lens > 0, lens - 1,
                           self.max_seq).astype(np.int32)
        out, qprobs, self.cache, self._keys = self._draft_sampled(
            self.params, self.cache,
            jnp.asarray(np.asarray(last_tokens, np.int32)[:, None]),
            jnp.asarray(lengths), self._keys, temps, topks, topps, minps)
        return np.asarray(out), qprobs


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
