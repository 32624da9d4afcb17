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

import jax
import jax.numpy as jnp

__all__ = ["ring_attention", "ulysses_attention"]


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
