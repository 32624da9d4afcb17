"""Hardware validation + perf of the PAGED KV path (VERDICT r1 #4).

Three stages, each gated on the previous compiling on real TPU (interpret
mode passing does NOT imply Mosaic compiles — CLAUDE.md):
  1. paged_flash_decode_int8 correctness vs the XLA gather reference.
  2. paged_cache_insert_int8 correctness vs the scatter insert.
  3. decode-step timing: paged flash vs contiguous flash vs contiguous XLA
     at matched B/S, plus a fragmented (shuffled page table) run to show
     cost tracks context length through the table indirection.

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=\
/root/.jax_cache timeout 1200 python scripts/tpu_paged_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.kernels.cache_insert import (
    cache_insert_int8, paged_cache_insert_int8)
from quant_tpu.kernels.attention import flash_decode_int8
from quant_tpu.kernels.paged_attention import (
    paged_flash_decode_int8, paged_attention_reference)
from quant_tpu.utils.timing import differential_time

L, B, HKV, REP, DH = 4, 32, 8, 4, 128
PAGE = 128
S = 2048                      # max_seq per slot
NP_POOL = 1 + B * (S // PAGE)  # page 0 reserved scratch
HQ = HKV * REP


def build(seed=0, fill=900):
    # everything created ON DEVICE (the relay transfers at ~MB/s — never
    # ship the ~0.5 GB pool from host; CLAUDE.md measurement rules)
    ks_ = jax.random.split(jax.random.PRNGKey(seed), 5)

    @jax.jit
    def mk():
        kc = jax.random.randint(
            ks_[0], (L, NP_POOL, HKV, PAGE, DH), -127, 128, jnp.int8)
        vc = jax.random.randint(
            ks_[1], (L, NP_POOL, HKV, PAGE, DH), -127, 128, jnp.int8)
        ks = jax.random.uniform(
            ks_[2], (L, NP_POOL, HKV, PAGE), jnp.float32, 0.01, 0.02)
        vs = jax.random.uniform(
            ks_[3], (L, NP_POOL, HKV, PAGE), jnp.float32, 0.01, 0.02)
        q = jax.random.normal(ks_[4], (B, HQ, DH), jnp.bfloat16)
        return kc, ks, vc, vs, q

    kc, ks, vc, vs, q = mk()
    # page table + lengths are tiny — host is fine
    rng = np.random.default_rng(seed)
    perm = rng.permutation(NP_POOL - 1) + 1  # slot pages shuffled over pool
    tbl = jnp.asarray(perm.reshape(B, S // PAGE).astype(np.int32))
    lengths = jnp.full((B,), fill, jnp.int32)
    return kc, ks, vc, vs, tbl, lengths, q


def main():
    kc, ks, vc, vs, tbl, lengths, q = build()
    print(f"pool {NP_POOL} pages x {PAGE}; B={B} S={S} fill=900", flush=True)

    # 1. paged flash decode vs reference
    t0 = time.time()
    out = jax.block_until_ready(
        paged_flash_decode_int8(q, kc, ks, vc, vs, tbl, lengths, 2))
    print(f"paged flash compiled in {time.time()-t0:.0f}s", flush=True)
    ref = paged_attention_reference(
        q.astype(jnp.float32), kc, ks, vc, vs, tbl, lengths, 2)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    print(f"paged flash max|err| vs reference: {err:.4f}", flush=True)
    assert err < 0.05, "paged flash mismatch"

    # 2. paged insert vs expected
    rng = np.random.default_rng(1)
    k_new = jnp.asarray(rng.integers(-127, 128, (B, 1, HKV, DH), np.int8))
    k_sn = jnp.asarray(rng.uniform(0.01, 0.02, (B, 1, HKV)), jnp.float32)
    t0 = time.time()
    kc2, ks2, vc2, vs2 = jax.block_until_ready(paged_cache_insert_int8(
        kc, ks, vc, vs, k_new, k_sn, k_new, k_sn, lengths, 2, tbl))
    print(f"paged insert compiled in {time.time()-t0:.0f}s", flush=True)
    # slice the written rows ON DEVICE (never pull the 0.5 GB pool to host)
    pg = tbl[jnp.arange(B), lengths // PAGE]
    row = lengths % PAGE
    got = kc2[2, pg, :, row]                      # [B, HKV, DH]
    ok = bool(jnp.all(got == k_new[:, 0]))
    print(f"paged insert row-exact: {ok}", flush=True)
    assert ok

    # 3. timing: paged flash vs contiguous flash, long vs short context
    def make_paged(n):
        @jax.jit
        def f(q, kc, ks, vc, vs, tbl, lengths):
            def body(i, acc):
                o = paged_flash_decode_int8(
                    q, kc, ks, vc, vs, tbl, lengths, i % L)
                return acc + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    per = differential_time(make_paged, (q, kc, ks, vc, vs, tbl, lengths),
                            4, 64, iters=3)
    kv_bytes = 2 * B * HKV * 1024 * (DH + 4)  # int8 codes + f32 scale
    print(f"paged flash fill=900:  {per*1e6:8.1f} us/call  "
          f"({kv_bytes/per/1e9:.0f} GB/s of touched KV)", flush=True)

    # contiguous comparison (device-created)
    ckc = jnp.zeros((L, B, HKV, S, DH), jnp.int8)
    cks = jnp.zeros((L, B, HKV, S), jnp.float32)

    def make_contig(n):
        @jax.jit
        def f(q, kc4, ks4, vc4, vs4, lengths):
            def body(i, acc):
                o = flash_decode_int8(q, kc4, ks4, vc4, vs4, lengths,
                                      layer=i % L)
                return acc + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, 0.0)
        return f

    per_c = differential_time(make_contig, (q, ckc, cks, ckc, cks, lengths),
                              4, 64, iters=3)
    print(f"contig flash fill=900: {per_c*1e6:8.1f} us/call", flush=True)

    # short-context run: cost must track length, not pool size
    short = jnp.full((B,), 128, jnp.int32)
    per_s = differential_time(make_paged, (q, kc, ks, vc, vs, tbl, short),
                              4, 64, iters=3)
    print(f"paged flash fill=128:  {per_s*1e6:8.1f} us/call "
          f"(vs {per*1e6:.1f} at 900 — should be ~7x less)", flush=True)


if __name__ == "__main__":
    main()
