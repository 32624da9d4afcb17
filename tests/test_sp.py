"""Sequence-parallelism tests on the 8-device CPU mesh (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from quant_tpu.models import PRESETS, llama
from quant_tpu.parallel import make_mesh
from quant_tpu.parallel.sp import ring_attention, ulysses_attention

CFG = PRESETS["test-tiny"]


def _ref_causal(q, k, v, q_pos, k_pos):
    hq, dh = q.shape[2], q.shape[3]
    hkv = k.shape[2]
    if hkv != hq:
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32))
    logits = logits / np.sqrt(dh)
    valid = k_pos[:, None, None, :] <= q_pos[:, None, :, None]
    logits = jnp.where(valid, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return out


def _mk(b=2, t=32, hq=4, hkv=2, dh=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, hq, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, dh)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    return q, k, v, pos


@pytest.mark.parametrize("fn", [ring_attention, ulysses_attention])
def test_sp_attention_matches_full(fn):
    q, k, v, pos = _mk()
    ref = _ref_causal(q, k, v, pos, pos)
    mesh = make_mesh(data=1, model=1, seq=4)
    out = jax.shard_map(
        lambda *a: fn(*a, axis="seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"),
                  P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )(q, k, v, pos, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seq_sharded_decode_forward():
    """forward(seq_axis=...) over an S-sharded cache == single-device."""
    params = llama.init_params(CFG, seed=0)
    batch, max_seq = 2, 32
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, CFG.vocab_size, (batch, 8)),
        jnp.int32,
    )
    cache = llama.init_cache(CFG, batch, max_seq)
    ref1, ref_cache = llama.forward(params, toks, cache, CFG)
    ref2, _ = llama.forward(params, toks[:, :1], ref_cache, CFG)

    mesh = make_mesh(data=1, model=1, seq=4)
    cspec = llama.KVCache(
        k_codes=P(None, None, None, "seq", None),
        k_scale=P(None, None, None, "seq"),
        v_codes=P(None, None, None, "seq", None),
        v_scale=P(None, None, None, "seq"),
        lengths=P(),
    )
    step = jax.shard_map(
        lambda pr, tk, ca: llama.forward(pr, tk, ca, CFG, seq_axis="seq"),
        mesh=mesh,
        in_specs=(P(), P(), cspec),
        out_specs=(P(), cspec),
        check_vma=False,
    )
    out1, out_cache = step(params, toks, llama.init_cache(CFG, batch, max_seq))
    out2, _ = step(params, toks[:, :1], out_cache)
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               np.asarray(ref1, np.float32),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref2, np.float32),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode,tp,sp", [
    ("ring", 1, 4),      # S = 4x shard size (VERDICT r1 #7)
    ("ring", 2, 2),      # ring x TP
    ("ulysses", 1, 2),
    ("ulysses", 2, 2),   # local heads 4/2=2 ... needs div by sp=2
])
def test_sp_prefill_through_model(mode, tp, sp):
    """q-sharded long-context prefill THROUGH llama (not just the
    primitive) == single-device forward, then composes with KV-sharded
    decode on the same mesh."""
    import dataclasses as dc

    from quant_tpu.models.config import ModelConfig
    from quant_tpu.parallel import shard_params
    from quant_tpu.parallel.sp import make_sp_prefill
    from quant_tpu.parallel.tp import cache_specs, sharded_forward_fn

    cfg = ModelConfig(
        vocab_size=512, dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
        intermediate=512, group_size=64, kernel_mode="xla",
    )
    params_ref = llama.init_params(cfg, seed=7, tp=1)
    params = llama.init_params(cfg, seed=7, tp=tp)
    batch, t, max_seq = 2, 16, 32
    toks = jnp.asarray(
        np.random.default_rng(7).integers(0, cfg.vocab_size, (batch, t)),
        jnp.int32)

    ref_logits, ref_cache = llama.forward(
        params_ref, toks, llama.init_cache(cfg, batch, max_seq), cfg)

    mesh = make_mesh(data=1, model=tp, seq=sp)
    sp_params = shard_params(params, mesh)
    cache0 = llama.init_cache(cfg, batch, max_seq)
    sc = jax.tree.map(
        lambda x, s: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, s)),
        cache0, cache_specs(cache0))
    prefill = make_sp_prefill(cfg, mesh, sp_params, sc, mode=mode)
    out_logits, out_cache = prefill(sp_params, toks, sc)
    # ring/ulysses merge changes the softmax reduction order — observed
    # drift vs single-device is ~4e-3 on O(1) logits (caches bit-identical)
    np.testing.assert_allclose(np.asarray(out_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(out_cache.k_codes),
                                  np.asarray(ref_cache.k_codes))
    assert int(np.asarray(out_cache.lengths)[0]) == t

    # prefill -> KV-sharded LSE-merge decode composition on the same mesh
    decode = jax.jit(sharded_forward_fn(cfg, mesh, sp_params, sc))
    nxt = jnp.argmax(ref_logits[:, -1:], axis=-1).astype(jnp.int32)
    ref2, _ = llama.forward(params_ref, nxt, ref_cache, cfg)
    out2, _ = decode(sp_params, nxt, out_cache)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref2, np.float32),
                               rtol=2e-3, atol=2e-2)


def test_seq_shard_boundary_crossing_decode():
    """Decode steps that cross a shard boundary (S_loc=8) stay correct."""
    params = llama.init_params(CFG, seed=1)
    batch, max_seq = 1, 32  # 4 shards × 8 rows
    toks = jnp.asarray([[5, 6, 7, 8, 9, 10, 11]], jnp.int32)  # prefill 7
    mesh = make_mesh(data=1, model=1, seq=4)
    cspec = llama.KVCache(
        k_codes=P(None, None, None, "seq", None),
        k_scale=P(None, None, None, "seq"),
        v_codes=P(None, None, None, "seq", None),
        v_scale=P(None, None, None, "seq"),
        lengths=P(),
    )
    step = jax.shard_map(
        lambda pr, tk, ca: llama.forward(pr, tk, ca, CFG, seq_axis="seq"),
        mesh=mesh,
        in_specs=(P(), P(), cspec),
        out_specs=(P(), cspec),
        check_vma=False,
    )
    ref_cache = llama.init_cache(CFG, batch, max_seq)
    _, ref_cache = llama.forward(params, toks, ref_cache, CFG)
    sp_cache = llama.init_cache(CFG, batch, max_seq)
    _, sp_cache = step(params, toks, sp_cache)
    # decode tokens 8..11: position 8 crosses into shard 1
    cur = toks[:, -1:]
    for i in range(4):
        ref_lg, ref_cache = llama.forward(params, cur, ref_cache, CFG)
        sp_lg, sp_cache = step(params, cur, sp_cache)
        np.testing.assert_allclose(np.asarray(sp_lg, np.float32),
                                   np.asarray(ref_lg, np.float32),
                                   rtol=2e-4, atol=2e-4)
        cur = jnp.argmax(ref_lg[:, -1:], axis=-1).astype(jnp.int32)


def test_sp_prefill_moe_through_model():
    """Sequence-parallel long-context prefill composes with the sparse
    MoE MLP (router rides xs; mlp_block inside the ring layer step)."""
    import dataclasses as dc

    from quant_tpu.models import PRESETS
    from quant_tpu.parallel import shard_params
    from quant_tpu.parallel.sp import make_sp_prefill
    from quant_tpu.parallel.tp import cache_specs

    cfg = PRESETS["test-tiny-moe"]
    params = llama.init_params(cfg, seed=9)
    batch, t, max_seq = 2, 16, 32
    toks = jnp.asarray(
        np.random.default_rng(9).integers(0, cfg.vocab_size, (batch, t)),
        jnp.int32)
    ref_logits, ref_cache = llama.forward(
        params, toks, llama.init_cache(cfg, batch, max_seq), cfg)

    mesh = make_mesh(seq=4)
    sp_params = shard_params(params, mesh)
    cache0 = llama.init_cache(cfg, batch, max_seq)
    sc = jax.tree.map(
        lambda x, s: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, s)),
        cache0, cache_specs(cache0))
    prefill = make_sp_prefill(cfg, mesh, sp_params, sc, mode="ring")
    out_logits, out_cache = prefill(sp_params, toks, sc)
    np.testing.assert_allclose(np.asarray(out_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(out_cache.k_codes),
                                  np.asarray(ref_cache.k_codes))
