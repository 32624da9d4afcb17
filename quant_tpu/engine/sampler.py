"""Token sampling (jit-friendly; static config, traced logits/key)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.0   # 0 → greedy
    top_k: int = 0             # 0 → disabled
    top_p: float = 1.0         # 1 → disabled
    min_p: float = 0.0         # 0 → disabled; keep p(tok) ≥ min_p·p_max
    # token-history penalties (counts cover prompt + committed output):
    repetition_penalty: float = 1.0  # HF semantics; 1 → disabled
    frequency_penalty: float = 0.0   # OpenAI: logit -= fp·count
    presence_penalty: float = 0.0    # OpenAI: logit -= pp·(count>0)
    # OpenAI logit_bias: ((token_id, bias), ...); -100 effectively bans,
    # +100 effectively forces. Tuple-of-tuples keeps the config hashable.
    logit_bias: tuple = ()

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0

    @property
    def has_penalties(self) -> bool:
        return (self.repetition_penalty != 1.0
                or self.frequency_penalty != 0.0
                or self.presence_penalty != 0.0)


def apply_logit_bias(logits: jax.Array, bias_toks: jax.Array,
                     bias_vals: jax.Array) -> jax.Array:
    """Additive per-slot logit bias (OpenAI logit_bias). ``bias_toks``
    [B, K] int32 / ``bias_vals`` [B, K] f32; unused entries point at
    token 0 with value 0 (adding 0 is a no-op). Applied AFTER penalties
    on raw logits, so a -100 ban survives every other adjustment.
    Accepts [B, V] or [B, T, V] (same bias at every in-window position)."""
    b = logits.shape[0]
    v = logits.shape[-1]
    dense = jnp.zeros((b, v), jnp.float32).at[
        jnp.arange(b)[:, None], bias_toks].add(bias_vals)
    if logits.ndim == 3:
        dense = dense[:, None, :]
    return logits.astype(jnp.float32) + dense


def apply_penalties(logits: jax.Array, counts: jax.Array,
                    reps: jax.Array, freqs: jax.Array,
                    press: jax.Array) -> jax.Array:
    """Token-history penalties on RAW logits (before temperature).

    ``counts`` int32 of logits' shape-without-tricks ([B, V] or
    [B, T, V]) — occurrences of each token in the slot's prompt +
    committed output (+ in-window drafts on the spec path). Per-slot
    traced knobs broadcast over T. Greedy slots honor penalties too
    (argmax is taken over the penalized logits), matching HF/vLLM:

    * repetition_penalty r (HF): seen & logit>0 → logit/r, seen &
      logit<0 → logit·r
    * frequency/presence (OpenAI): logit -= fp·count + pp·(count>0)
    """
    lg = logits.astype(jnp.float32)
    lead = (slice(None),) + (None,) * (lg.ndim - 1)
    seen = counts > 0
    r = jnp.maximum(reps, 1e-6)[lead]
    lg = jnp.where(seen, jnp.where(lg > 0, lg / r, lg * r), lg)
    lg = lg - (freqs[lead] * counts.astype(jnp.float32)
               + press[lead] * seen.astype(jnp.float32))
    return lg


def sample(logits: jax.Array, key, cfg: SamplingConfig,
           counts: jax.Array | None = None,
           fsm_rows: jax.Array | None = None) -> jax.Array:
    """logits [B, V] → token ids [B]. ``counts`` [B, V] int32 enables the
    token-history penalties of ``cfg`` (ignored when cfg has none).
    ``fsm_rows`` [B, V] int32 (grammar-constrained decoding): tokens with
    a negative FSM transition are masked out entirely — the LAST mask, so
    a grammar ban survives penalties/bias/filtering."""
    if fsm_rows is not None:
        logits = jnp.where(fsm_rows < 0, -jnp.inf,
                           logits.astype(jnp.float32))
    if cfg.has_penalties and counts is not None:
        b = logits.shape[0]
        logits = apply_penalties(
            logits, counts,
            jnp.full((b,), cfg.repetition_penalty, jnp.float32),
            jnp.full((b,), cfg.frequency_penalty, jnp.float32),
            jnp.full((b,), cfg.presence_penalty, jnp.float32))
    if cfg.logit_bias:
        b = logits.shape[0]
        toks = jnp.asarray([t for t, _ in cfg.logit_bias], jnp.int32)
        vals = jnp.asarray([v for _, v in cfg.logit_bias], jnp.float32)
        logits = apply_logit_bias(
            logits, jnp.broadcast_to(toks, (b, toks.shape[0])),
            jnp.broadcast_to(vals, (b, vals.shape[0])))
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lg = logits.astype(jnp.float32) / cfg.temperature
    if cfg.top_k > 0:
        kth = jnp.sort(lg, axis=-1)[:, -cfg.top_k][:, None]
        lg = jnp.where(lg < kth, -jnp.inf, lg)
    if cfg.top_p < 1.0:
        sorted_lg = jnp.sort(lg, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_lg, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative mass >= top_p.
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_lg, cutoff_idx[:, None], axis=-1)
        lg = jnp.where(lg < cutoff, -jnp.inf, lg)
    if cfg.min_p > 0.0:
        # p_i/p_max = exp(l_i - l_max) on the temperature-scaled dist, so
        # the mask is a pure logit threshold — no softmax materialized.
        # Applied AFTER top-k/top-p to mirror filter_logits exactly (the
        # max logit survives those masks, so the threshold is identical
        # and a request's first token follows the same truncated
        # distribution as all later device-sampled tokens).
        mx = jnp.max(lg, axis=-1, keepdims=True)
        lg = jnp.where(lg < mx + jnp.log(cfg.min_p), -jnp.inf, lg)
    return jax.random.categorical(key, lg, axis=-1).astype(jnp.int32)


def filter_logits(logits: jax.Array, temps: jax.Array, topks: jax.Array,
                  topps: jax.Array, minps: jax.Array | None = None
                  ) -> jax.Array:
    """Temperature-scale + top-k/top-p/min-p mask, per LEADING-dim slot
    with traced knobs. Accepts [B, V] or [B, T, V] (knobs broadcast over
    T). ``minps[B]`` f32 (0 → off) keeps tokens with p ≥ min_p·p_max on
    the temperature-scaled distribution; the max logit survives every
    mask, so composition with top-k/top-p is order-independent.
    temp==0 rows come back merely 1e6-scaled (callers special-case
    greedy; the scaling keeps the math finite)."""
    lg = logits.astype(jnp.float32)
    v = lg.shape[-1]
    expand = (slice(None),) + (None,) * (lg.ndim - 1)
    lead = (slice(None),) + (None,) * (lg.ndim - 2)  # over shape[:-1]
    l2 = lg / jnp.maximum(temps, 1e-6)[expand]
    sorted_desc = jnp.sort(l2, axis=-1)[..., ::-1]
    # top-k: per-slot kth-largest threshold
    kth = jnp.take_along_axis(
        sorted_desc,
        jnp.broadcast_to(jnp.clip(topks - 1, 0, v - 1)[lead],
                         l2.shape[:-1])[..., None], axis=-1)
    topk_on = (topks > 0)[expand]
    l2 = jnp.where(topk_on & (l2 < kth), -jnp.inf, l2)
    # top-p over the top-k-masked distribution (same composition as
    # :func:`sample`): smallest prefix with cumulative mass >= top_p.
    sorted_desc = jnp.where(topk_on & (sorted_desc < kth), -jnp.inf,
                            sorted_desc)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < topps[expand], axis=-1)
    cutoff = jnp.take_along_axis(
        sorted_desc, jnp.clip(cutoff_idx, 0, v - 1)[..., None], axis=-1)
    l2 = jnp.where((topps < 1.0)[expand] & (l2 < cutoff), -jnp.inf, l2)
    if minps is not None:
        # p_i/p_max = exp(l_i - l_max); the max logit is never masked by
        # top-k/top-p, so the threshold reads straight off l2.
        mx = jnp.max(l2, axis=-1, keepdims=True)
        thresh = mx + jnp.log(jnp.maximum(minps, 1e-38))[expand]
        l2 = jnp.where((minps > 0.0)[expand] & (l2 < thresh), -jnp.inf, l2)
    return l2


def sample_batch(logits: jax.Array, key, temps: jax.Array,
                 topks: jax.Array, topps: jax.Array,
                 minps: jax.Array | None = None,
                 penalties=None, bias=None,
                 fsm_rows: jax.Array | None = None) -> jax.Array:
    """Fully-traced per-slot sampling: logits [B, V] → ids [B].

    Per-slot traced knobs (so one jit serves every mix of configs — the
    engine's fused decode block samples on device without retracing):
    ``temps[B]`` f32 (0 → greedy), ``topks[B]`` int32 (0 → off),
    ``topps[B]`` f32 (1 → off), ``minps[B]`` f32 (0 → off).
    ``penalties`` = (counts [B, V] int32, reps, freqs, press) applies
    token-history penalties first (greedy slots argmax the penalized
    logits); ``bias`` = (bias_toks, bias_vals) adds OpenAI logit_bias
    after them. Matches :func:`sample` per slot.
    """
    if penalties is not None:
        logits = apply_penalties(logits, *penalties)
    if bias is not None:
        logits = apply_logit_bias(logits, *bias)
    if fsm_rows is not None:
        # grammar mask last: a forbidden token stays forbidden no matter
        # what penalties/bias did. Registration guarantees every row has
        # at least one legal token (dead rows get an EOS self-loop), so
        # the masked distribution is never empty.
        logits = jnp.where(fsm_rows < 0, -jnp.inf,
                           logits.astype(jnp.float32))
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l2 = filter_logits(logits, temps, topks, topps, minps)
    if key.ndim:  # per-slot keys [B]: batching-invariant streams
        sampled = jax.vmap(
            lambda k, lg: jax.random.categorical(k, lg))(key, l2)
        sampled = sampled.astype(jnp.int32)
    else:
        sampled = jax.random.categorical(key, l2,
                                         axis=-1).astype(jnp.int32)
    return jnp.where(temps == 0.0, greedy, sampled)


def token_logprob(logits: jax.Array, toks: jax.Array) -> jax.Array:
    """log p(tok) under the RAW model distribution (softmax of
    unfiltered logits — the conventional serving-API semantics,
    temperature-independent). logits [..., V], toks [...] → [...] f32."""
    lg = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(lg, axis=-1)
    chosen = jnp.take_along_axis(lg, toks[..., None], axis=-1)[..., 0]
    return chosen - lse


def spec_commit(logits: jax.Array, tokens: jax.Array, key,
                temps: jax.Array, topks: jax.Array, topps: jax.Array,
                minps: jax.Array | None = None,
                penalties=None, bias=None,
                q_probs: jax.Array | None = None,
                fsm_rows: jax.Array | None = None
                ) -> tuple[jax.Array, jax.Array]:
    """Speculative rejection sampling, fully on device (one
    [B, gamma+2] host fetch stays enough).

    ``logits`` [B, gamma+1, V]: the verify forward's logits; position j
    predicts stream token j+1. ``tokens`` [B, gamma+1]: the fed tokens —
    tokens[:, 1:] are the gamma draft proposals.

    Per slot, with p_j the (temperature/top-k/top-p filtered) target
    distribution at position j:

    * ``q_probs=None`` — DELTA proposal: accept draft_j with probability
      p_j(draft_j); residual = p with the draft entry zeroed.
    * ``q_probs`` [B, gamma, V] — the draft model's own (filtered)
      distributions, with draft_j ~ q_j (standard speculative sampling,
      Leviathan et al.): accept with min(1, p_j(d)/q_j(d)); residual =
      norm((p_j - q_j)+). Strictly higher acceptance than the delta rule
      whenever q carries mass near p. Positions where (p-q)+ sums to ~0
      (p ≈ q, acceptance ~1 — the rejection event has vanishing
      probability there) fall back to sampling p, bounding the total-
      variation error by the guard epsilon.

    On the first rejection commit the residual sample; if all gamma
    accept, commit a bonus sample from p_gamma. Either rule reproduces
    exact ancestral sampling from the target chain. temp==0 slots reduce
    to the greedy argmax-prefix rule (p is one-hot: accept iff draft ==
    argmax; residual/bonus = argmax), so one program serves mixed
    batches.

    Returns (out [B, gamma+1] committed token per position, acc [B]
    accepted-draft count; positions > acc in ``out`` are garbage).
    """
    b, gp1, v = logits.shape
    g = gp1 - 1
    if penalties is not None:
        # Position j's target distribution conditions on the fed tokens
        # 0..j; base counts already include tokens[:, 0] (the last
        # committed token), so position j adds the in-window drafts
        # tokens[:, 1..j] — exact sequential-chain counts, keeping the
        # bit-parity-with-plain-decode guarantee under penalties.
        counts, reps, freqs, press = penalties
        oh = jax.nn.one_hot(tokens, v, dtype=jnp.int32)  # [B, g+1, V]
        cum = jnp.cumsum(oh, axis=1) - oh[:, :1]
        logits = apply_penalties(logits, counts[:, None, :] + cum,
                                 reps, freqs, press)
    if bias is not None:
        logits = apply_logit_bias(logits, *bias)
    if fsm_rows is not None:
        # grammar mask (FSM x speculation, r5): fsm_rows [B, g+1, V] are
        # the legality rows at each chain position (state walked through
        # the draft prefix). Masking p makes p(illegal)=0, so an illegal
        # draft token is rejected with probability 1 and the accepted
        # prefix truncates at the first illegal proposal — the rule
        # stays EXACT ancestral sampling of the grammar-constrained
        # target chain (rejection only ever shortens). Mask LAST so a
        # grammar ban survives penalties/bias (same order as sample()).
        logits = jnp.where(fsm_rows < 0, -jnp.inf,
                           logits.astype(jnp.float32))
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, g+1]
    l2 = filter_logits(logits, temps, topks, topps, minps)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 2)
              == greedy_tok[..., None]).astype(jnp.float32)
    probs = jnp.where((temps == 0.0)[:, None, None],
                      onehot, jax.nn.softmax(l2, axis=-1))
    draft = tokens[:, 1:]                                       # [B, g]
    if key.ndim:  # per-slot keys [B] (batching-invariant streams)
        ks = jax.vmap(lambda k: jax.random.split(k))(key)
        key_u, key_s = ks[:, 0], ks[:, 1]
    else:
        key_u, key_s = jax.random.split(key)
    if g:
        p_draft = jnp.take_along_axis(
            probs[:, :g], draft[..., None], axis=-1)[..., 0]    # [B, g]
        if q_probs is not None:
            q_draft = jnp.take_along_axis(
                q_probs, draft[..., None], axis=-1)[..., 0]
            ratio = p_draft / jnp.maximum(q_draft, 1e-38)
        else:
            ratio = p_draft     # delta proposal: q(d) = 1
        if key.ndim:
            u = jax.vmap(lambda k: jax.random.uniform(k, (g,)))(key_u)
        else:
            u = jax.random.uniform(key_u, (b, g))
        accept = (u < ratio).astype(jnp.int32)
        acc = jnp.cumprod(accept, axis=1).sum(axis=1)           # [B]
        if q_probs is not None:
            resid = jnp.maximum(probs[:, :g] - q_probs, 0.0)
            rs = jnp.sum(resid, axis=-1, keepdims=True)
            resid = jnp.where(rs > 1e-9, resid, probs[:, :g])
        else:
            # residual (p - q)+ with q = delta: zero the draft entry
            resid = probs[:, :g] * (
                1.0 - (jax.lax.broadcasted_iota(
                    jnp.int32, probs[:, :g].shape, 2)
                       == draft[..., None]).astype(jnp.float32))
        dist = jnp.concatenate([resid, probs[:, g:]], axis=1)
    else:
        acc = jnp.zeros((b,), jnp.int32)
        dist = probs
    logdist = jnp.log(jnp.maximum(dist, 1e-38))
    if key.ndim:
        samples = jax.vmap(
            lambda k, lg: jax.random.categorical(k, lg, axis=-1))(
                key_s, logdist).astype(jnp.int32)
    else:
        samples = jax.random.categorical(
            key_s, logdist, axis=-1).astype(jnp.int32)          # [B, g+1]
    # greedy slots must stay exactly argmax at the commit position (the
    # categorical over a one-hot is argmax anyway; this keeps bit-parity
    # with the plain greedy program explicit)
    samples = jnp.where((temps == 0.0)[:, None], greedy_tok, samples)
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, gp1), 1)
    out = jnp.where(pos < acc[:, None],
                    jnp.concatenate(
                        [tokens[:, 1:], tokens[:, :1]], axis=1),
                    samples)
    return out, acc
