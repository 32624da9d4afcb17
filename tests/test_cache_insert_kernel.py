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
