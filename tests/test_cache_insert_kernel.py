"""Aliased in-place cache-insert kernel vs XLA scatter (interpret, CPU)."""

import jax.numpy as jnp
import numpy as np

from quant_tpu.kernels.cache_insert import cache_insert_int8
from quant_tpu.models import llama


def _mk(l=3, b=2, h=2, s=128, d=64, t=1, seed=0):
    rng = np.random.default_rng(seed)
    kc = jnp.asarray(rng.integers(-127, 127, (l, b, h, s, d)), jnp.int8)
    ks = jnp.asarray(rng.standard_normal((l, b, h, s)), jnp.float32)
    vc = jnp.asarray(rng.integers(-127, 127, (l, b, h, s, d)), jnp.int8)
    vs = jnp.asarray(rng.standard_normal((l, b, h, s)), jnp.float32)
    kn = jnp.asarray(rng.integers(-127, 127, (b, t, h, d)), jnp.int8)
    kns = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    vn = jnp.asarray(rng.integers(-127, 127, (b, t, h, d)), jnp.int8)
    vns = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    return kc, ks, vc, vs, kn, kns, vn, vns


def test_matches_scatter_insert():
    kc, ks, vc, vs, kn, kns, vn, vns = _mk()
    lengths = jnp.asarray([3, 77], jnp.int32)
    for layer in range(3):
        ref_kc, ref_ks = llama._cache_insert_at_layer(
            kc, ks, kn, kns, lengths, layer)
        ref_vc, ref_vs = llama._cache_insert_at_layer(
            vc, vs, vn, vns, lengths, layer)
        out = cache_insert_int8(kc, ks, vc, vs, kn, kns, vn, vns,
                                lengths, jnp.int32(layer), interpret=True)
        for o, r in zip(out, (ref_kc, ref_ks, ref_vc, ref_vs)):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_seq_shard_ownership_skip():
    kc, ks, vc, vs, kn, kns, vn, vns = _mk(seed=2)
    # shard covering rows [128, 256): slot 0 (pos 3) is NOT owned, slot 1
    # (pos 129 → local 1) is.
    lengths = jnp.asarray([3, 129], jnp.int32)
    out = cache_insert_int8(kc, ks, vc, vs, kn, kns, vn, vns,
                            lengths, jnp.int32(1), s0=128, interpret=True)
    ref_kc, ref_ks = llama._cache_insert_at_layer(
        kc, ks, kn, kns, lengths, 1, s0=128)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref_kc))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref_ks))
    # slot 0's rows untouched
    np.testing.assert_array_equal(np.asarray(out[0][1, 0]),
                                  np.asarray(kc[1, 0]))


def test_multi_token_rejected():
    import pytest
    kc, ks, vc, vs, kn, kns, vn, vns = _mk(t=4, seed=3)
    lengths = jnp.asarray([0, 8], jnp.int32)
    with pytest.raises(ValueError, match="decode"):
        cache_insert_int8(kc, ks, vc, vs, kn, kns, vn, vns,
                          lengths, jnp.int32(2), interpret=True)


def test_wide_head_dim_256_matches_scatter():
    """r5: head_dim 256 (the whole Gemma family) — a token spans
    d/128 = 2 consecutive lane-view rows; the RMW select must write
    both EXACTLY like the scatter."""
    kc, ks, vc, vs, kn, kns, vn, vns = _mk(d=256, seed=5)
    lengths = jnp.asarray([0, 127], jnp.int32)   # edges incl. row-pair 0
    for layer in range(3):
        ref_kc, ref_ks = llama._cache_insert_at_layer(
            kc, ks, kn, kns, lengths, layer)
        ref_vc, ref_vs = llama._cache_insert_at_layer(
            vc, vs, vn, vns, lengths, layer)
        out = cache_insert_int8(kc, ks, vc, vs, kn, kns, vn, vns,
                                lengths, jnp.int32(layer), interpret=True)
        for o, r in zip(out, (ref_kc, ref_ks, ref_vc, ref_vs)):
            np.testing.assert_array_equal(np.asarray(o), np.asarray(r))


def test_wide_head_dim_paged_matches_scatter():
    from quant_tpu.kernels.cache_insert import paged_cache_insert_int8

    rng = np.random.default_rng(7)
    l, npg, h, page, d, b = 2, 12, 2, 128, 256, 3
    kc = jnp.asarray(rng.integers(-127, 127, (l, npg, h, page, d)),
                     jnp.int8)
    ks = jnp.asarray(rng.standard_normal((l, npg, h, page)), jnp.float32)
    vc = jnp.asarray(rng.integers(-127, 127, (l, npg, h, page, d)),
                     jnp.int8)
    vs = jnp.asarray(rng.standard_normal((l, npg, h, page)), jnp.float32)
    kn = jnp.asarray(rng.integers(-127, 127, (b, 1, h, d)), jnp.int8)
    kns = jnp.asarray(rng.standard_normal((b, 1, h)), jnp.float32)
    vn = jnp.asarray(rng.integers(-127, 127, (b, 1, h, d)), jnp.int8)
    vns = jnp.asarray(rng.standard_normal((b, 1, h)), jnp.float32)
    tbl = jnp.asarray(rng.permutation(np.arange(1, npg))[:b * 3]
                      .reshape(b, 3).astype(np.int32))
    lens = jnp.asarray([5, 130, 383], jnp.int32)
    out = paged_cache_insert_int8(kc, ks, vc, vs, kn, kns, vn, vns,
                                  lens, jnp.int32(1), tbl,
                                  interpret=True)
    okc = np.asarray(out[0])
    for i in range(b):
        pos = int(lens[i])
        pg, off = int(tbl[i, pos // page]), pos % page
        np.testing.assert_array_equal(okc[1, pg, :, off],
                                      np.asarray(kn[i, 0]))
