"""Sequence/context parallelism primitives (SURVEY.md §2.2 #11/#12).

Three SP modes for long context, all over the ``seq`` mesh axis:

1. **KV-sharded decode** (the default, built into ``llama.forward`` via
   ``seq_axis``): the int8 KV cache shards along S; every chip computes a
   partial flash-softmax over its local keys and one log-sum-exp merge
   (pmax + 2 psums) combines them. Queries replicate (tiny at decode);
   KV bytes never move. Best for decode.

2. **Ring attention** (:func:`ring_attention`): blockwise causal attention
   with the KV block rotating around the ring via ``lax.ppermute`` — each of
   the N-1 steps overlaps its neighbor-transfer with the current block's
   compute (XLA schedules the permute collective asynchronously). Queries
   stay put, KV payload is int8+scales (2-4x smaller than fp — the
   quantization synergy). Best for long prefill where q is also sharded.

3. **Ulysses** (:func:`ulysses_attention`): all_to_all swaps the seq shard
   for a head shard around attention, so attention itself is local-full-seq
   over Hq/n heads. Cheaper than ring when heads >= shards and the
   interconnect favors all_to_all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ring_attention", "ulysses_attention", "make_sp_prefill"]


def _block_attend(q, k, v, q_pos, k_pos, scale):
    """Masked partial attention stats for one (q-block, kv-block) pair.

    q [B,T,H,D]; k/v [B,S,H,D] (kv heads already repeated to H);
    q_pos [B,T], k_pos [B,S] global positions. Returns (m, l, o) partials:
    m [B,H,T,1], l [B,H,T,1], o [B,H,T,D].
    """
    qf = q.astype(jnp.float32) * scale
    logits = jnp.einsum("bthd,bshd->bhts", qf, k.astype(jnp.float32))
    valid = (k_pos[:, None, None, :] <= q_pos[:, None, :, None])
    logits = jnp.where(valid, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.where(valid, jnp.exp(logits - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhts,bshd->bhtd", p, v.astype(jnp.float32))
    return m, l, o


def _merge(m1, l1, o1, m2, l2, o2):
    m = jnp.maximum(m1, m2)
    w1, w2 = jnp.exp(m1 - m), jnp.exp(m2 - m)
    return m, l1 * w1 + l2 * w2, o1 * w1 + o2 * w2


def _repeat_kv(k, hq):
    hkv = k.shape[2]
    if hkv == hq:
        return k
    return jnp.repeat(k, hq // hkv, axis=2)


def ring_attention(q, k, v, q_pos, k_pos, axis: str):
    """Causal ring attention inside shard_map.

    Every rank holds q [B,T_loc,H,D] and k/v [B,S_loc,Hkv,D] plus their
    GLOBAL positions q_pos [B,T_loc], k_pos [B,S_loc]. KV rotates around
    the ring; causal masking uses positions, so any block order works.
    Returns [B, T_loc, H, D] in q.dtype.
    """
    n = jax.lax.axis_size(axis)
    hq, dh = q.shape[2], q.shape[3]
    scale = 1.0 / (dh ** 0.5)
    k = _repeat_kv(k, hq)
    v = _repeat_kv(v, hq)

    m, l, o = _block_attend(q, k, v, q_pos, k_pos, scale)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(i, carry):
        m, l, o, k, v, k_pos = carry
        # rotate the kv block (+ positions) to the next rank
        k = jax.lax.ppermute(k, axis, perm)
        v = jax.lax.ppermute(v, axis, perm)
        k_pos = jax.lax.ppermute(k_pos, axis, perm)
        m2, l2, o2 = _block_attend(q, k, v, q_pos, k_pos, scale)
        m, l, o = _merge(m, l, o, m2, l2, o2)
        return m, l, o, k, v, k_pos

    m, l, o, _, _, _ = jax.lax.fori_loop(
        0, n - 1, step, (m, l, o, k, v, k_pos)
    )
    out = o / jnp.maximum(l, 1e-20)          # [B,H,T,D]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def ulysses_attention(q, k, v, q_pos, k_pos, axis: str):
    """Ulysses SP inside shard_map: all_to_all seq-shard ↔ head-shard.

    Inputs as in :func:`ring_attention`; requires H % axis_size == 0.
    After the first all_to_all every rank holds the FULL sequence for
    H/n heads; attention is ordinary causal; the reverse all_to_all
    restores seq sharding.
    """
    n = jax.lax.axis_size(axis)
    hq, dh = q.shape[2], q.shape[3]
    scale = 1.0 / (dh ** 0.5)
    k = _repeat_kv(k, hq)
    v = _repeat_kv(v, hq)
    # [B, T_loc, H, D] → [B, T, H/n, D]
    qh = jax.lax.all_to_all(q, axis, split_axis=2, concat_axis=1, tiled=True)
    kh = jax.lax.all_to_all(k, axis, split_axis=2, concat_axis=1, tiled=True)
    vh = jax.lax.all_to_all(v, axis, split_axis=2, concat_axis=1, tiled=True)
    qp = jax.lax.all_gather(q_pos, axis, axis=1, tiled=True)   # [B, T]
    kp = jax.lax.all_gather(k_pos, axis, axis=1, tiled=True)
    m, l, o = _block_attend(qh, kh, vh, qp, kp, scale)
    out = (o / jnp.maximum(l, 1e-20)).transpose(0, 2, 1, 3)    # [B,T,H/n,D]
    # back: head-shard → seq-shard
    out = jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2,
                             tiled=True)
    return out.astype(q.dtype)


# ── model-level q-sharded prefill (VERDICT r1 #7) ───────────────────────


def _ring_insert(kc, ks, vc, vs, k_q, k_s, v_q, v_s, start, layer, s0,
                 axis):
    """Populate this rank's cache S-shard with EVERY rank's freshly
    quantized KV rows by rotating the int8 blocks once around the ring —
    the drop-semantics scatter keeps only rows in [s0, s0 + S_loc), so no
    gather of the full sequence ever materializes. Payload is int8 codes +
    f32 scales (the quantization synergy: 2-4x smaller than fp rotation).
    """
    from quant_tpu.models import llama

    n = jax.lax.axis_size(axis)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def ins(kc, ks, vc, vs, kq, kss, vq, vss, st):
        kc, ks = llama._cache_insert_at_layer(kc, ks, kq, kss, st, layer,
                                              s0)
        vc, vs = llama._cache_insert_at_layer(vc, vs, vq, vss, st, layer,
                                              s0)
        return kc, ks, vc, vs

    kc, ks, vc, vs = ins(kc, ks, vc, vs, k_q, k_s, v_q, v_s, start)

    def step(i, carry):
        kc, ks, vc, vs, kq, kss, vq, vss, st = carry
        rot = lambda a: jax.lax.ppermute(a, axis, perm)
        kq, kss, vq, vss, st = rot(kq), rot(kss), rot(vq), rot(vss), rot(st)
        kc, ks, vc, vs = ins(kc, ks, vc, vs, kq, kss, vq, vss, st)
        return kc, ks, vc, vs, kq, kss, vq, vss, st

    kc, ks, vc, vs, *_ = jax.lax.fori_loop(
        0, n - 1, step, (kc, ks, vc, vs, k_q, k_s, v_q, v_s, start))
    return kc, ks, vc, vs


def sp_prefill_forward(params, tokens, cache, cfg, seq_axis: str,
                       mode: str = "ring", axis: str | None = None,
                       last_only: bool = False):
    """Long-context prefill with the PROMPT sharded over ``seq_axis`` —
    runs inside shard_map. tokens [B, T_loc] is this rank's slice of the
    prompt; attention over the full (quantized) K/V goes through
    :func:`ring_attention` or :func:`ulysses_attention`; each rank's cache
    S-shard fills via the int8 ring insert. Composes with TP (``axis``).

    Contract: fresh cache (lengths 0 — whole-prompt prefill), global T =
    n_seq * T_loc, T <= max_seq. Attention consumes the int8-quantized
    K/V (identical numerics to the single-device forward, which attends
    over the quantized cache). Returns (logits [B, T_loc, V] — this rank's
    token slice, updated cache).

    ``last_only``: compute lm_head logits ONLY for the global final
    position and return them replicated over ``seq_axis`` as [B, 1, V]
    (what a serving engine needs to sample the first token — the full
    [B, T, V] logits of a 100k prompt would be tens of GB).
    """
    from quant_tpu.models import llama

    if cfg.sliding_window or cfg.attn_softcap:
        raise ValueError(
            "sp_prefill_forward implements neither the sliding-window "
            "mask nor attention softcapping (a <=4k window never needs "
            "sequence-parallel prefill; use the chunked single-rank "
            "prefill path)")
    if params.lora is not None:
        raise ValueError("sp_prefill_forward does not implement LoRA "
                         "deltas")
    if cfg.is_mla or cfg.first_k_dense:
        raise ValueError(
            "sp_prefill_forward does not implement MLA — long MLA "
            "prompts go through the chunked T>1 seq_axis path in "
            "llama.forward (the latent cache is 3.6x smaller per token "
            "than GQA int8, so the SP threshold would sit far higher)")
    mm = llama._mm(cfg)
    b, t_loc = tokens.shape
    dt = llama._act_dtype(cfg)
    n_seq = jax.lax.axis_size(seq_axis)
    ri = jax.lax.axis_index(seq_axis)
    s_loc = cache.k_codes.shape[3]
    s0 = ri * s_loc
    t_glob = t_loc * n_seq
    # global positions of this rank's queries / new keys
    q_pos = (ri * t_loc + jnp.arange(t_loc))[None, :] + 0 * cache.lengths[
        :, None]
    start = cache.lengths + ri * t_loc          # [B] write position

    attend = ring_attention if mode == "ring" else ulysses_attention
    psum = (lambda v: jax.lax.psum(v, axis)) if axis else (lambda v: v)

    h = llama._embed_lookup(params.embed, tokens, dt, cfg)
    layers = params.layers

    def layer_step(carry, xs):
        h, kc, ks, vc, vs = carry
        (attn_norm, mlp_norm, qkv_bias, q_norm, k_norm, router,
         post_attn, post_mlp, _win, idx, _q_a_norm, _kv_a_norm,
         _r_bias) = xs
        x = llama.rmsnorm(h, attn_norm, cfg.norm_eps, cfg.norm_offset)
        qkv = mm(x, layers.wqkv, idx) + qkv_bias.astype(dt)
        units = cfg.n_heads + 2 * cfg.n_kv_heads
        nq = (qkv.shape[-1] * cfg.n_heads) // units
        nkv = (qkv.shape[-1] * cfg.n_kv_heads) // units
        q = qkv[..., :nq].reshape(b, t_loc, -1, cfg.head_dim)
        k = qkv[..., nq:nq + nkv].reshape(b, t_loc, -1, cfg.head_dim)
        v = qkv[..., nq + nkv:].reshape(b, t_loc, -1, cfg.head_dim)
        if cfg.qk_norm:
            q = llama.rmsnorm(q, q_norm, cfg.norm_eps, cfg.norm_offset)
            k = llama.rmsnorm(k, k_norm, cfg.norm_eps, cfg.norm_offset)
        q = llama._rope(q, q_pos, cfg.rope_theta, cfg)
        k = llama._rope(k, q_pos, cfg.rope_theta, cfg)
        k_q, k_s = llama.quantize_kv(k, cfg.kv_bits)
        v_q, v_s = llama.quantize_kv(v, cfg.kv_bits)
        kc, ks, vc, vs = _ring_insert(kc, ks, vc, vs, k_q, k_s, v_q, v_s,
                                      start, idx, s0, seq_axis)
        # attend over the QUANTIZED kv (single-device forward parity)
        k_hat = llama.dequant_kv(k_q, cfg.kv_bits,
                                 head_axis=-2) * k_s[..., None]
        v_hat = llama.dequant_kv(v_q, cfg.kv_bits,
                                 head_axis=-2) * v_s[..., None]
        attn = attend(q, k_hat, v_hat, q_pos, q_pos, seq_axis)
        o = psum(mm(attn.reshape(b, t_loc, -1), layers.wo, idx,
                    out_dtype=jnp.float32))
        if cfg.post_norms:
            o = llama.rmsnorm(o, post_attn, cfg.norm_eps, cfg.norm_offset)
        h = h + o.astype(dt)
        x = llama.rmsnorm(h, mlp_norm, cfg.norm_eps, cfg.norm_offset)
        m = llama.mlp_block(x, layers, idx, cfg, mm, dt, axis=axis,
                            router=router)
        if cfg.post_norms:
            m = llama.rmsnorm(m, post_mlp, cfg.norm_eps, cfg.norm_offset)
        h = h + m.astype(dt)
        return (h, kc, ks, vc, vs), None

    (h, kc, ks, vc, vs), _ = jax.lax.scan(
        layer_step,
        (h, cache.k_codes, cache.k_scale, cache.v_codes, cache.v_scale),
        llama.scan_xs(layers, cfg),
    )
    h = llama.rmsnorm(h, params.final_norm, cfg.norm_eps,
                      cfg.norm_offset)
    if last_only:
        # lm_head on the final position only; the global last token lives
        # on the last seq rank — a masked psum replicates its logits
        h = h[:, -1:]
    logits = mm(h, params.lm_head, out_dtype=jnp.float32)
    if axis:
        logits = jax.lax.all_gather(logits, axis, axis=2, tiled=True)
    if last_only:
        logits = jax.lax.psum(
            jnp.where(ri == n_seq - 1, logits, jnp.zeros_like(logits)),
            seq_axis)
    logits = logits[..., :cfg.vocab_size]
    if cfg.final_softcap:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    new_cache = llama.KVCache(
        k_codes=kc, k_scale=ks, v_codes=vc, v_scale=vs,
        lengths=cache.lengths + t_glob,
    )
    return logits, new_cache


def make_sp_prefill(cfg, mesh, params, cache, mode: str = "ring"):
    """jit(shard_map(sp_prefill_forward)): q-sharded long-context prefill.

    tokens [B, T] shard over (data, seq); the returned cache is S-sharded
    over ``seq`` exactly as llama.forward's LSE-merge decode expects, so a
    ring/Ulysses prefill composes with KV-sharded decode. Mode "ulysses"
    needs (local) head count divisible by the seq axis.
    """
    from jax.sharding import PartitionSpec as P

    from quant_tpu.parallel import tp as tp_mod

    sp = mesh.shape["seq"]
    tp = mesh.shape.get("model", 1)
    if sp < 2:
        raise ValueError("make_sp_prefill needs a seq axis >= 2")
    if mode == "ulysses" and (cfg.n_heads // tp) % sp:
        raise ValueError(
            f"ulysses needs local heads {cfg.n_heads}/{tp} divisible by "
            f"seq={sp}")
    p_specs = tp_mod.param_specs(params)
    c_specs = tp_mod.cache_specs(cache)
    fwd = functools.partial(
        sp_prefill_forward, cfg=cfg, seq_axis="seq", mode=mode,
        axis="model" if tp > 1 else None,
    )
    sharded = jax.shard_map(
        lambda pr, tok, ca: fwd(pr, tok, ca),
        mesh=mesh,
        in_specs=(p_specs, P("data", "seq"), c_specs),
        out_specs=(P("data", "seq", None), c_specs),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(2,))
